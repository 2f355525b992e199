"""The keyed AWARE detector CNN, TPU-native.

Reimplements the behavior of ``AWAREDetectorNet``
(reference: src/AWARE/detection/multibit_detector_net.py:7-157) as a pure
function over a frozen params pytree.  All heavy ops are matmuls/elementwise
and fuse into one XLA computation; the 1x1 convolutions are expressed as
(C_out, C_in) x (C_in, T) matmuls that map directly onto the MXU.

Forward graph for a single clip's magnitude ``mag`` of shape (F=513, T)
(reference forward at multibit_detector_net.py:109-140):

    mel     = mel_basis @ mag            # (128, T); NOTE: the reference
                                         # computes global_norm1(mag) first
                                         # and then DISCARDS it, feeding the
                                         # raw magnitude to the mel layer
                                         # (reference bug at :121-124).  We
                                         # reproduce the effective dataflow
                                         # and simply never compute the dead
                                         # normalization.
    x = instance_norm(mel)               # per-channel over time, eps 1e-5
    x = global_standardize(x)            # whole-tensor, unbiased std, 1e-8
    x = avg_pool(x, 2, 2)                # (128, T//2)
    4x: x = act(instance_norm(W_i @ x + b_i))   # channels 128-512-1024-1024-40
    out = final_act(mean_t(x)[0::2] - mean_t(x)[1::2])   # BRH, (20,)

Batching is `vmap` over clips, which keeps the reference's whole-tensor
normalizations per-clip (a global norm over a real batch would couple clips
and change semantics).
"""

from __future__ import annotations

import pathlib
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from aware_tpu.config import DetectorNetConfig, in_band_bins
from aware_tpu.ops.mel import mel_filter_bank
from aware_tpu.ops.stft import magphase, peak_normalize, stft
from aware_tpu.ops.windows import get_window

DetectorParams = Mapping[str, jnp.ndarray]

_KEY_DIR = pathlib.Path(__file__).parent / "_key"
_DEFAULT_KEY = _KEY_DIR / "aware_key_v1.npz"


# --------------------------------------------------------------------------
# Parameters
# --------------------------------------------------------------------------

def load_key_params(path: str | pathlib.Path = _DEFAULT_KEY) -> dict[str, np.ndarray]:
    """Load the golden key bundle (seeded torch xavier weights).

    The reference reconstructs these from ``torch.manual_seed(328656719)``
    every run (multibit_detector_net.py:78); we ship them materialized — see
    tools/extract_key.py for provenance and RNG accounting.
    """
    with np.load(path) as z:
        return {k: z[k] for k in z.files if k != "seed"}


def init_params(
    cfg: DetectorNetConfig, rng: jax.Array | None = None
) -> dict[str, np.ndarray]:
    """Detector params: the golden key for the default card, fresh xavier
    (JAX RNG) otherwise.

    A non-default architecture or seed cannot bit-match torch's RNG stream,
    so it gets an honest JAX-native init keyed by ``cfg.seed`` — still fully
    deterministic, still usable as a watermarking key, just not
    torch-parity.  ``cfg.key_file`` overrides with an alternate trained
    bundle (e.g. the desync-robust re-keyed detector).
    """
    if cfg.key_file:
        p = pathlib.Path(cfg.key_file)
        if not p.is_absolute():
            p = _KEY_DIR / p
        return load_key_params(p)
    default = DetectorNetConfig()
    if cfg == default and _DEFAULT_KEY.exists():
        return load_key_params()
    if rng is None:
        rng = jax.random.PRNGKey(cfg.seed)
    params: dict[str, np.ndarray] = {}
    ch = cfg.channels
    for i in range(cfg.num_blocks + 1):
        rng, sub = jax.random.split(rng)
        fan_in, fan_out = ch[i] * cfg.kernel_size, ch[i + 1] * cfg.kernel_size
        bound = float(np.sqrt(6.0 / (fan_in + fan_out)))
        w = jax.random.uniform(
            sub, (ch[i + 1], ch[i]), jnp.float32, -bound, bound
        )
        params[f"conv{i}_w"] = np.asarray(w)
        params[f"conv{i}_b"] = np.zeros(ch[i + 1], dtype=np.float32)
    return params


# --------------------------------------------------------------------------
# Building blocks
# --------------------------------------------------------------------------

def global_standardize(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """(x - mean) / (std + eps) over all elements, **unbiased** std.

    Matches ``GlobalStandardize`` which uses ``Tensor.std()`` (Bessel
    corrected) (reference: detection/modules/globalStandardize.py:16-21).
    """
    n = x.size
    mean = jnp.mean(x)
    var = jnp.sum((x - mean) ** 2) / (n - 1)
    return (x - mean) / (jnp.sqrt(var) + eps)


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-channel normalization over the time axis, biased variance.

    Matches non-affine ``nn.InstanceNorm1d`` without running stats
    (the reference always uses the affine-less default).
    x: (C, T).
    """
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def avg_pool_1d(x: jnp.ndarray, size: int, stride: int) -> jnp.ndarray:
    """AvgPool1d over the last axis (matches torch for the size==stride case,
    generic windowed mean otherwise)."""
    t = x.shape[-1]
    if size == stride:
        t_out = t // size
        return jnp.mean(
            x[..., : t_out * size].reshape(*x.shape[:-1], t_out, size), axis=-1
        )
    t_out = (t - size) // stride + 1
    idx = np.arange(t_out)[:, None] * stride + np.arange(size)[None, :]
    return jnp.mean(x[..., idx], axis=-1)


def _block_activation(name: str):
    """Conv-block activations — silently fall back to relu for unknown names
    (reference: detection/modules/conv1d.py:26-36)."""
    name = name.lower()
    if name == "leaky_relu":
        return lambda x: jnp.where(x >= 0, x, 0.2 * x)
    if name == "gelu":
        return jax.nn.gelu
    if name == "swish":
        return jax.nn.silu
    return jax.nn.relu


def _final_activation(name: str):
    """Readout activations — raise on unknown names
    (reference: multibit_detector_net.py:82-96)."""
    table = {
        "relu": jax.nn.relu,
        "leaky_relu": lambda x: jnp.where(x >= 0, x, 0.2 * x),
        "gelu": jax.nn.gelu,
        "swish": jax.nn.silu,
        "tanh": jnp.tanh,
        "sigmoid": jax.nn.sigmoid,
    }
    name = name.lower()
    if name not in table:
        raise ValueError(f"Invalid activation: {name}")
    return table[name]


def _precision(name: str) -> jax.lax.Precision:
    return {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[name]


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------

def detector_apply(
    params: DetectorParams,
    mag: jnp.ndarray,
    cfg: DetectorNetConfig = DetectorNetConfig(),
    matmul_precision: str = "highest",
) -> jnp.ndarray:
    """Single-clip forward: magnitude (F, T) -> bit values (output_length,).

    Use :func:`detector_apply_batch` for batched input.
    """
    prec = _precision(matmul_precision)
    basis = jnp.asarray(
        mel_filter_bank(cfg.sample_rate, cfg.n_fft, cfg.n_mels), dtype=mag.dtype
    )
    # Mel projection (reference: multibit_detector_net.py:124; the preceding
    # global_norm1 result is discarded there — see module docstring).
    x = jnp.matmul(basis, mag, precision=prec)
    x = instance_norm(x)
    x = global_standardize(x)
    x = avg_pool_1d(x, cfg.initial_pool_size, cfg.initial_pool_stride)

    act = _block_activation(cfg.activation)
    for i in range(cfg.num_blocks + 1):
        w = params[f"conv{i}_w"]
        b = params[f"conv{i}_b"]
        x = jnp.matmul(w, x, precision=prec) + b[:, None]
        if cfg.norm_layer == "instance":
            x = instance_norm(x)
        elif cfg.norm_layer != "none":
            raise ValueError(f"Invalid norm layer: {cfg.norm_layer}")
        x = act(x)

    # Bitwise Readout Head: time-average pool, even/odd channel difference,
    # final activation (reference: detection/modules/BRH.py:16-27).
    pooled = jnp.mean(x, axis=-1)
    out = pooled[0::2] - pooled[1::2]
    return _final_activation(cfg.final_activation)(out)


def detector_apply_banded(
    params: DetectorParams,
    band_mag: jnp.ndarray,
    lo: int,
    hi: int,
    cfg: DetectorNetConfig = DetectorNetConfig(),
    matmul_precision: str = "highest",
) -> jnp.ndarray:
    """Forward taking only the in-band magnitude rows (hi-lo, T).

    Mathematically identical to ``detector_apply`` on the band-zeroed full
    magnitude — out-of-band rows contribute nothing to the mel projection —
    but skips materializing (F-hi+lo, T) zeros and shrinks the mel matmul
    to the 225 in-band rows.  This is the solver's per-iteration entry
    (the embed objective zeroes out-of-band bins anyway,
    reference: multibit_embedder.py:104)."""
    prec = _precision(matmul_precision)
    basis = jnp.asarray(
        mel_filter_bank(cfg.sample_rate, cfg.n_fft, cfg.n_mels),
        dtype=band_mag.dtype,
    )[:, lo:hi]
    x = jnp.matmul(basis, band_mag, precision=prec)
    x = instance_norm(x)
    x = global_standardize(x)
    x = avg_pool_1d(x, cfg.initial_pool_size, cfg.initial_pool_stride)
    act = _block_activation(cfg.activation)
    for i in range(cfg.num_blocks + 1):
        w = params[f"conv{i}_w"]
        b = params[f"conv{i}_b"]
        x = jnp.matmul(w, x, precision=prec) + b[:, None]
        if cfg.norm_layer == "instance":
            x = instance_norm(x)
        elif cfg.norm_layer != "none":
            raise ValueError(f"Invalid norm layer: {cfg.norm_layer}")
        x = act(x)
    pooled = jnp.mean(x, axis=-1)
    out = pooled[0::2] - pooled[1::2]
    return _final_activation(cfg.final_activation)(out)


def detector_apply_masked(
    params: DetectorParams,
    mag: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: DetectorNetConfig = DetectorNetConfig(),
    matmul_precision: str = "highest",
) -> jnp.ndarray:
    """Forward over a zero-padded magnitude (F, T) with a frame-validity
    mask (T,): numerically equivalent (to fp tolerance) to
    :func:`detector_apply` on the unpadded (F, n_valid) input.

    Every normalization statistic and the BRH pool ignores masked frames,
    and the initial AvgPool drops any window containing a masked frame —
    exactly what the unpadded forward's floor-division pooling drops.
    This is what lets ragged detections (robust-detect rate grid, mixed-
    length batches) stack into ONE dispatched program instead of one
    dispatch per length.  (Same masked-stat scheme as the sequence-parallel
    streaming path, without the cross-chip psum.)
    """
    prec = _precision(matmul_precision)
    mask = mask.astype(mag.dtype)
    basis = jnp.asarray(
        mel_filter_bank(cfg.sample_rate, cfg.n_fft, cfg.n_mels), dtype=mag.dtype
    )
    x = jnp.matmul(basis, mag, precision=prec) * mask

    n = jnp.sum(mask)
    # masked InstanceNorm1d (biased variance over valid frames)
    mean = jnp.sum(x * mask, axis=-1, keepdims=True) / n
    var = jnp.sum(((x - mean) * mask) ** 2, axis=-1, keepdims=True) / n
    x = (x - mean) * jax.lax.rsqrt(var + 1e-5) * mask
    # masked GlobalStandardize (unbiased over C·n_valid elements)
    n_el = x.shape[0] * n
    gmean = jnp.sum(x * mask) / n_el
    gvar = jnp.sum(((x - gmean) * mask) ** 2) / (n_el - 1.0)
    x = (x - gmean) / (jnp.sqrt(gvar) + 1e-8) * mask

    size, stride = cfg.initial_pool_size, cfg.initial_pool_stride
    if size != stride:
        raise ValueError("masked forward supports size==stride pooling only")
    t_out = x.shape[-1] // size
    x = jnp.mean(x[..., : t_out * size].reshape(x.shape[0], t_out, size), axis=-1)
    maskp = jnp.prod(mask[: t_out * size].reshape(t_out, size), axis=-1)
    x = x * maskp

    act = _block_activation(cfg.activation)
    np_valid = jnp.sum(maskp)
    for i in range(cfg.num_blocks + 1):
        w = params[f"conv{i}_w"]
        b = params[f"conv{i}_b"]
        x = (jnp.matmul(w, x, precision=prec) + b[:, None]) * maskp
        if cfg.norm_layer == "instance":
            mean = jnp.sum(x * maskp, axis=-1, keepdims=True) / np_valid
            var = (
                jnp.sum(((x - mean) * maskp) ** 2, axis=-1, keepdims=True)
                / np_valid
            )
            x = (x - mean) * jax.lax.rsqrt(var + 1e-5) * maskp
        elif cfg.norm_layer != "none":
            raise ValueError(f"Invalid norm layer: {cfg.norm_layer}")
        x = act(x) * maskp

    pooled = jnp.sum(x * maskp, axis=-1) / np_valid
    out = pooled[0::2] - pooled[1::2]
    return _final_activation(cfg.final_activation)(out)


def detector_apply_batch(
    params: DetectorParams,
    mags: jnp.ndarray,
    cfg: DetectorNetConfig = DetectorNetConfig(),
    matmul_precision: str = "highest",
) -> jnp.ndarray:
    """Batched forward (B, F, T) -> (B, output_length); per-clip semantics."""
    return jax.vmap(
        lambda m: detector_apply(params, m, cfg, matmul_precision)
    )(mags)


# --------------------------------------------------------------------------
# Detection pipeline (waveform -> bit values)
# --------------------------------------------------------------------------

def preprocess_magnitude(
    audio: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: jnp.ndarray | np.ndarray,
    band_lo_bin: int,
    band_hi_bin: int,
) -> jnp.ndarray:
    """Waveform -> band-limited STFT magnitude, the detector's input.

    peak-normalize -> STFT -> |.| -> zero out-of-band bins
    (reference: multibit_detector.py:28-37).  The out-of-band zeroing is a
    cheap concat of zero blocks because the band is one contiguous bin run.
    """
    mag, _ = magphase(stft(peak_normalize(audio), n_fft, hop_length, window))
    t = mag.shape[-1]
    zeros_lo = jnp.zeros((band_lo_bin, t), mag.dtype)
    zeros_hi = jnp.zeros((mag.shape[0] - band_hi_bin, t), mag.dtype)
    return jnp.concatenate([zeros_lo, mag[band_lo_bin:band_hi_bin], zeros_hi], axis=0)


def detect_values(
    params: DetectorParams,
    audio: jnp.ndarray,
    cfg: DetectorNetConfig = DetectorNetConfig(),
    hop_length: int = 256,
    window: str = "hann",
    win_length: int | None = None,
    embedding_bands: tuple[float, float] = (500.0, 4000.0),
    matmul_precision: str = "highest",
) -> jnp.ndarray:
    """Full single-clip detection forward: waveform -> (output_length,) values.

    Mirrors ``AWAREDetector.detect`` (reference: multibit_detector.py:28-42).
    """
    w = get_window(window, win_length or cfg.n_fft)
    lo, hi = in_band_bins(cfg.sample_rate, cfg.n_fft, embedding_bands)
    mag = preprocess_magnitude(audio, cfg.n_fft, hop_length, w, lo, hi)
    return detector_apply(params, mag, cfg, matmul_precision)


# jitted entries (cached per distinct audio length + static config):
# called eagerly, the detection forward costs dozens of per-op dispatches,
# which through a remote-TPU transport dominates end-to-end detect latency
_DETECT_STATICS = (
    "cfg", "hop_length", "window", "win_length", "embedding_bands",
    "matmul_precision",
)
detect_values_jit = jax.jit(detect_values, static_argnames=_DETECT_STATICS)


def _detect_values_batch(params, audios, cfg=DetectorNetConfig(),
                         hop_length=256, window="hann", win_length=None,
                         embedding_bands=(500.0, 4000.0),
                         matmul_precision="highest"):
    return jax.vmap(
        lambda a: detect_values(
            params, a, cfg, hop_length=hop_length, window=window,
            win_length=win_length, embedding_bands=embedding_bands,
            matmul_precision=matmul_precision,
        )
    )(audios)


detect_values_batch_jit = jax.jit(
    _detect_values_batch, static_argnames=_DETECT_STATICS
)


def model_info(params: DetectorParams, cfg: DetectorNetConfig) -> dict[str, Any]:
    """Architecture summary (reference: multibit_detector_net.py:143-157)."""
    total = sum(int(np.asarray(v).size) for v in params.values())
    return {
        "sample_rate": cfg.sample_rate,
        "n_fft": cfg.n_fft,
        "n_mels": cfg.n_mels,
        "num_blocks": cfg.num_blocks,
        "output_length": cfg.output_length,
        "final_activation": cfg.final_activation,
        "total_parameters": total,
        # The net is frozen key material — nothing is trainable in the
        # reference pipeline; the train/ package trains copies explicitly.
        "trainable_parameters": 0,
    }
