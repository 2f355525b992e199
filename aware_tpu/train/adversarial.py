"""Adversarial joint training: learned amortized embedder + keyed detector.

New capability beyond the reference (which never trains anything — SURVEY
§0): an **amortized embedder network** predicts the in-band magnitude
perturbation in ONE forward pass, replacing the 400-iteration per-clip
optimization at inference time.  It is trained adversarially through the
differentiable attack layer against the (frozen, keyed) detector:

    mag --E(mag, pattern)--> perturbed mag (inside the +/- tolerance_db
    box, exactly the solver's constraint) --ISTFT--> audio
    --random differentiable attack--> attacked audio --STFT-->
    --D (frozen keyed CNN)--> bit values
    loss = detection loss + lambda_percept * in-band log-magnitude MSE

Training the detector jointly (``train_detector=True``) is supported for
re-keying scenarios; the default keeps the reference's frozen key so
amortized embeds stay detector-compatible with solver embeds.

Data parallel: the train step is a pure function jit-able with a batch
sharded over a ``data`` mesh axis (params replicated, psum-free — optax
grads reduce inside jit via the mean loss).  Checkpointing via orbax.
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import Any, Callable, Mapping, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aware_tpu.config import AwareConfig, in_band_bins
from aware_tpu.models.detector import DetectorParams, detector_apply
from aware_tpu.ops.stft import (
    istft,
    magphase,
    peak_normalize,
    polar,
    stft,
)
from aware_tpu.ops.windows import get_window


# ---------------------------------------------------------------- model ---

@dataclasses.dataclass(frozen=True)
class AmortizedEmbedderConfig:
    hidden: tuple[int, ...] = (256, 256)
    # depthwise temporal conv width between the 1x1 layers (0 disables);
    # the solver shapes patterns jointly across frames, so the amortized
    # net needs temporal context too
    temporal_kernel: int = 9
    # condition on the in-band phase (cos/sin channels).  The solver's
    # optimized coefficients are functions of the clip's phase (it
    # differentiates through the ISTFT(mag, phase)->STFT round trip), so a
    # magnitude-only net cannot represent the solver's mapping — the
    # round-1 distillation negative result (docs/NEXT_ROUND_NOTES.md).
    phase_conditioned: bool = False
    # "mlp": per-frame 1x1 mixing + depthwise temporal convs (rounds 1-2);
    # "unet": time-downsampled encoder/decoder with skip connections —
    # the round-3 capacity direction for one-shot quality (the mlp's
    # receptive field is ~hidden*temporal_kernel frames; the solver shapes
    # patterns across the whole clip, which the U-Net's T/2^L bottleneck
    # can see).
    arch: str = "mlp"
    unet_channels: tuple[int, ...] = (96, 192, 384)
    unet_kernel: int = 5
    seed: int = 77

    def feature_dim(self, n_band: int, n_bits: int) -> int:
        return (3 if self.phase_conditioned else 1) * n_band + n_bits


def _xavier_conv(rng, o: int, i: int, k: int, gain: float = 1.0) -> jnp.ndarray:
    bound = float(gain * np.sqrt(6.0 / (i * k + o * k)))
    return jax.random.uniform(rng, (o, i, k), jnp.float32, -bound, bound)


# Per-layer init gain for convs feeding gelu.  Gelu's small-signal slope is
# 0.5 (E[gelu'(0)] = 0.5; for unit-variance gaussian input the variance
# retention is ~0.425), so xavier — derived for linear/tanh — attenuates a
# deep stack's signal by ~0.5 per layer: through the U-Net's ~10 gelu
# layers the pattern input reached the head at ~1e-3 of its scale and
# adversarial training collapsed to the identity (percept -> 0, BER pinned
# at chance).  sqrt(1/0.425) ~= 1.53 restores unit forward variance.
_GELU_GAIN = 1.53


def init_unet_params(
    ecfg: AmortizedEmbedderConfig, n_band: int, n_bits: int
) -> dict[str, jnp.ndarray]:
    """Time-downsampled U-Net over the (features, T) plane.

    stem conv -> L levels of stride-2 encoder convs -> bottleneck conv ->
    L decoder levels (nearest x2 upsample -> conv -> skip concat -> 1x1
    merge) -> 1x1 head to n_band.  All convs k=unet_kernel same-padded,
    xavier init, gelu; the "u_" key prefix marks the bundle's arch for
    apply-time dispatch (old mlp npz bundles keep working).
    """
    rng = jax.random.PRNGKey(ecfg.seed)
    ch = ecfg.unet_channels
    k = ecfg.unet_kernel
    cin = ecfg.feature_dim(n_band, n_bits)
    params: dict[str, jnp.ndarray] = {}

    def take():
        nonlocal rng
        rng, sub = jax.random.split(rng)
        return sub

    params["u_stem_w"] = _xavier_conv(take(), ch[0], cin, k, _GELU_GAIN)
    params["u_stem_b"] = jnp.zeros((ch[0],), jnp.float32)
    for i in range(len(ch) - 1):
        params[f"u_enc{i}_w"] = _xavier_conv(take(), ch[i + 1], ch[i], k, _GELU_GAIN)
        params[f"u_enc{i}_b"] = jnp.zeros((ch[i + 1],), jnp.float32)
    params["u_mid_w"] = _xavier_conv(take(), ch[-1], ch[-1], k, _GELU_GAIN)
    params["u_mid_b"] = jnp.zeros((ch[-1],), jnp.float32)
    for i in range(len(ch) - 2, -1, -1):
        params[f"u_dec{i}_w"] = _xavier_conv(take(), ch[i], ch[i + 1], k, _GELU_GAIN)
        params[f"u_dec{i}_b"] = jnp.zeros((ch[i],), jnp.float32)
        # merge the skip concat (2*ch[i] channels) back to ch[i]
        params[f"u_mrg{i}_w"] = _xavier_conv(take(), ch[i], 2 * ch[i], 1, _GELU_GAIN)
        params[f"u_mrg{i}_b"] = jnp.zeros((ch[i],), jnp.float32)
    params["u_head_w"] = _xavier_conv(take(), n_band, ch[0], 1)
    params["u_head_b"] = jnp.zeros((n_band,), jnp.float32)
    return params


def init_embedder_params(
    ecfg: AmortizedEmbedderConfig, n_band: int, n_bits: int
) -> dict[str, jnp.ndarray]:
    """Frequency-mixing 1x1 convs interleaved with depthwise temporal
    convs: (n_band + n_bits) -> hidden... -> n_band, xavier init."""
    if ecfg.arch == "unet":
        return init_unet_params(ecfg, n_band, n_bits)
    rng = jax.random.PRNGKey(ecfg.seed)
    dims = (ecfg.feature_dim(n_band, n_bits), *ecfg.hidden, n_band)
    params: dict[str, jnp.ndarray] = {}
    for i in range(len(dims) - 1):
        rng, sub = jax.random.split(rng)
        bound = float(np.sqrt(6.0 / (dims[i] + dims[i + 1])))
        params[f"w{i}"] = jax.random.uniform(
            sub, (dims[i + 1], dims[i]), jnp.float32, -bound, bound
        )
        params[f"b{i}"] = jnp.zeros((dims[i + 1],), jnp.float32)
        if ecfg.temporal_kernel and i < len(dims) - 2:
            # identity-init depthwise temporal kernel per channel
            tk = np.zeros((dims[i + 1], ecfg.temporal_kernel), np.float32)
            tk[:, ecfg.temporal_kernel // 2] = 1.0
            params[f"t{i}"] = jnp.asarray(tk)
    return params


def _depthwise_time_conv(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """(C, T) x (C, K) same-padded depthwise conv along time."""
    kw = k.shape[-1]
    y = jax.lax.conv_general_dilated(
        x[None],  # (1, C, T)
        k[:, None, ::-1],  # (C, 1, K) flipped -> convolution
        window_strides=(1,),
        padding=[(kw // 2, kw - 1 - kw // 2)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=x.shape[0],
    )
    return y[0]


def _conv1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
            stride: int = 1) -> jnp.ndarray:
    """(C_in, T) x (C_out, C_in, K) same-padded conv along time."""
    kw = w.shape[-1]
    y = jax.lax.conv_general_dilated(
        x[None], w[:, :, ::-1],
        window_strides=(stride,),
        padding=[(kw // 2, kw - 1 - kw // 2)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y[0] + b[:, None]


def _unet_apply(params: Mapping[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    """(features, T) -> (n_band, T) through the time-downsampled U-Net."""
    n_levels = len(
        [k for k in params if k.startswith("u_enc") and k.endswith("_w")]
    )
    h = jax.nn.gelu(_conv1d(x, params["u_stem_w"], params["u_stem_b"]))
    skips = []
    for i in range(n_levels):
        skips.append(h)
        h = jax.nn.gelu(
            _conv1d(h, params[f"u_enc{i}_w"], params[f"u_enc{i}_b"],
                    stride=2)
        )
    h = jax.nn.gelu(_conv1d(h, params["u_mid_w"], params["u_mid_b"]))
    for i in range(n_levels - 1, -1, -1):
        h = jnp.repeat(h, 2, axis=-1)  # nearest x2 upsample
        skip = skips[i]
        t = skip.shape[-1]
        if h.shape[-1] < t:
            h = jnp.pad(h, ((0, 0), (0, t - h.shape[-1])))
        h = jax.nn.gelu(
            _conv1d(h[:, :t], params[f"u_dec{i}_w"], params[f"u_dec{i}_b"])
        )
        h = jax.nn.gelu(
            _conv1d(
                jnp.concatenate([h, skip], axis=0),
                params[f"u_mrg{i}_w"], params[f"u_mrg{i}_b"],
            )
        )
    return _conv1d(h, params["u_head_w"], params["u_head_b"])


def embedder_apply(
    params: Mapping[str, jnp.ndarray],
    band_mag: jnp.ndarray,
    pattern: jnp.ndarray,
    tolerance_db: float,
    band_phase: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Single clip: in-band magnitude (n_band, T) + bipolar pattern (n_bits,)
    -> perturbed magnitude inside the solver's box constraint
    (reference box: multibit_embedder.py:157-160).

    Whether the bundle is phase-conditioned is read off ``w0``'s input
    width, so old magnitude-only bundles keep working; a phase-conditioned
    bundle requires ``band_phase`` (n_band, T)."""
    n_band, t = band_mag.shape
    logmag = jnp.log1p(band_mag)
    logmag = (logmag - jnp.mean(logmag)) / (jnp.std(logmag) + 1e-6)
    pat = jnp.broadcast_to(pattern[:, None], (pattern.shape[0], t))
    is_unet = "u_stem_w" in params
    in_w = (
        params["u_stem_w"].shape[1] if is_unet else params["w0"].shape[1]
    )
    wants_phase = in_w == 3 * n_band + pattern.shape[0]
    if wants_phase:
        if band_phase is None:
            raise ValueError(
                "phase-conditioned amortized bundle needs band_phase"
            )
        x = jnp.concatenate(
            [logmag, jnp.cos(band_phase), jnp.sin(band_phase), pat], axis=0
        )
    else:
        x = jnp.concatenate([logmag, pat], axis=0)
    if is_unet:
        out = _unet_apply(params, x)
        delta_max = band_mag * (10.0 ** (-tolerance_db / 20.0))
        return jnp.maximum(band_mag + jnp.tanh(out) * delta_max, 0.0)
    n_layers = len([k for k in params if k.startswith("w")])
    for i in range(n_layers):
        x = params[f"w{i}"] @ x + params[f"b{i}"][:, None]
        if f"t{i}" in params:
            x = _depthwise_time_conv(x, params[f"t{i}"])
        if i < n_layers - 1:
            x = jax.nn.gelu(x)
    delta_max = band_mag * (10.0 ** (-tolerance_db / 20.0))
    perturbed = band_mag + jnp.tanh(x) * delta_max
    return jnp.maximum(perturbed, 0.0)


# ------------------------------------------------- differentiable attacks ---

def _attack_none(audio, key):
    return audio


def _attack_noise(audio, key):
    snr_db = jax.random.uniform(key, (), minval=20.0, maxval=40.0)
    p = jnp.mean(audio**2)
    sigma = jnp.sqrt(p / (10.0 ** (snr_db / 10.0)))
    return audio + sigma * jax.random.normal(key, audio.shape)


def _attack_quantize(audio, key):
    """Differentiable PCM quantization (straight-through rounding)."""
    bits = 8.0 + 8.0 * jax.random.bernoulli(key).astype(jnp.float32)
    scale = 2.0 ** (bits - 1.0) - 1.0
    a = audio / (jnp.max(jnp.abs(audio)) + 1e-8)
    q = a * scale
    q = q + jax.lax.stop_gradient(jnp.round(q) - q)
    return q / scale


def _attack_lowpass(audio, key):
    """FIR lowpass with a random 3.5-5 kHz cutoff (windowed sinc, 129 taps)."""
    n = 129
    t = jnp.arange(n) - (n - 1) / 2.0
    fc = jax.random.uniform(key, (), minval=3500.0, maxval=5000.0) / 16000.0
    h = 2.0 * fc * jnp.sinc(2.0 * fc * t)
    h = h * jnp.hanning(n)
    h = h / jnp.sum(h)
    y = jax.lax.conv_general_dilated(
        audio[None, None, :], h[::-1][None, None, :],
        window_strides=(1,), padding=[(n // 2, n // 2)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y[0, 0, : audio.shape[-1]]


def _attack_dropout(audio, key):
    """Zero a random 5% window (SampleSupression analogue)."""
    L = audio.shape[-1]
    d = L // 20
    start = jax.random.randint(key, (), 0, L - d)
    idx = jnp.arange(L)
    mask = ((idx < start) | (idx >= start + d)).astype(audio.dtype)
    return audio * mask


DIFFERENTIABLE_ATTACKS: tuple[Callable, ...] = (
    _attack_none,
    _attack_noise,
    _attack_quantize,
    _attack_lowpass,
    _attack_dropout,
)

# Stretch rates covering the eval suite's desync rows (ts_0.8..1.2) plus
# near-unity rates that mimic ps_5's vocoder smearing (a 5-cent pitch shift
# is a ~0.997 stretch + resample; the damage is the smearing, not the
# 0.3% frequency shift).
DESYNC_STRETCH_RATES: tuple[float, ...] = (0.8, 0.9, 0.95, 0.997, 1.05, 1.1, 1.2)


def make_attack_list(
    length: int,
    desync: bool = False,
    stretch_rates: tuple[float, ...] = DESYNC_STRETCH_RATES,
    compression: bool = False,
) -> tuple[list[Callable], int]:
    """Attack branches with a uniform static output length.

    ``lax.switch`` needs every branch to return the same shape, but the
    phase-vocoder stretch changes length per (static) rate — so every
    branch is cropped to the minimum branch length.  Returns
    ``(branch_fns, out_length)``; each fn is ``(audio, key) -> audio``.

    ``compression`` adds the differentiable codec channel models (the
    solver's EOT medicine, VERDICT r4 item 3/4): MDCT quantization at
    extreme pressure (mp3_approx q10/q11) and the CELP LPC-envelope view
    (celp_approx nb8k) — all length-preserving.
    """
    from aware_tpu.attacks.vocoder import time_stretch

    fns: list[Callable] = list(DIFFERENTIABLE_ATTACKS)
    out_lens = [length] * len(fns)
    if desync:
        for r in stretch_rates:
            out = jax.eval_shape(
                lambda a, r=r: time_stretch(a, r),
                jax.ShapeDtypeStruct((length,), jnp.float32),
            ).shape[-1]
            fns.append(lambda a, k, r=r: time_stretch(a, r))
            out_lens.append(out)
    if compression:
        from aware_tpu.attacks.celp import celp_approx
        from aware_tpu.attacks.codec import mp3_approx

        fns.append(lambda a, k: mp3_approx(a, 16000, 10))
        fns.append(lambda a, k: mp3_approx(a, 16000, 11))
        fns.append(lambda a, k: celp_approx(a, 16000, "nb8k"))
        out_lens += [length] * 3
    l_out = min(out_lens)
    return [lambda a, k, f=f: f(a, k)[..., :l_out] for f in fns], l_out


def apply_random_attack(
    audio: jnp.ndarray, key: jax.Array, attacks: list[Callable] | None = None
) -> jnp.ndarray:
    """Pick one differentiable attack at random (lax.switch — traceable;
    only the selected branch executes)."""
    fns = list(DIFFERENTIABLE_ATTACKS) if attacks is None else attacks
    k_pick, k_attack = jax.random.split(key)
    idx = jax.random.randint(k_pick, (), 0, len(fns))
    return jax.lax.switch(
        idx, [lambda a, f=f: f(a, k_attack) for f in fns], audio
    )


# ------------------------------------------------------------- training ---

@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 8
    learning_rate: float = 3e-4
    lambda_percept: float = 1.0
    train_detector: bool = False
    # include phase-vocoder time-stretch branches in the attack mix
    # (re-keying for desync robustness; see tools/train_desync.py)
    desync_attacks: bool = False
    # stretch-rate curriculum; repeat a rate to weight it more heavily
    stretch_rates: tuple = DESYNC_STRETCH_RATES
    # include differentiable codec views (mp3_approx q10/q11 + celp nb8k)
    # in the attack mix — the compression analogue of desync_attacks
    compression_attacks: bool = False
    # compute the detection loss on BOTH the clean and the attacked view of
    # the watermarked clip.  Essential for joint (train_detector=True)
    # training: with only hard attacked views the detector collapses to the
    # all-zero saddle (observed: soft_ber pinned at 0.50) because early
    # embedder patterns are unreadable post-attack; the clean view keeps a
    # learnable path open at every step.
    dual_view: bool = False
    # separate detector learning rate for joint training (None -> shared);
    # a gentler detector keeps the keyed structure from being destroyed
    # before the embedder can follow.
    detector_lr: float | None = None
    # detection-loss shape: "push_extremes" is the solver's default-card
    # objective; "margin" is squared hinge on the per-bit agreement
    # a = pred*target — mean(relu(margin_target - a)^2) — which keeps a
    # gradient on every bit until its tanh readout clears the margin.
    # Round-3 diagnosis motivating it: the U-Net's soft_ber sat near 0.5
    # even at low hard BER (marks correct but WEAK); push_extremes'
    # -0.1*mean|pred| bonus is sign-agnostic and lets confidently-wrong
    # bits ride, while the margin keeps pushing them across zero.
    det_loss: str = "push_extremes"
    margin_target: float = 0.5
    steps: int = 1000
    embedder: AmortizedEmbedderConfig = dataclasses.field(
        default_factory=AmortizedEmbedderConfig
    )


class TrainState(NamedTuple):
    e_params: Any
    d_params: Any
    opt_state: Any
    step: jnp.ndarray


def _optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    # global-norm clipping + skip-nonfinite-updates: the adversarial loss
    # through the vocoder/attack switch occasionally produces a blown-up
    # or NaN gradient; unguarded, one such step poisons every parameter
    # (observed once near the end of a 6000-step desync run).
    def _adamw(lr: float, wd: float) -> optax.GradientTransformation:
        return optax.chain(
            optax.clip_by_global_norm(1.0), optax.adamw(lr, weight_decay=wd)
        )

    if tcfg.train_detector and tcfg.detector_lr is not None:
        tx = optax.multi_transform(
            {
                "e": _adamw(tcfg.learning_rate, 1e-5),
                "d": _adamw(tcfg.detector_lr, 0.0),
            },
            ("e", "d"),
        )
    else:
        tx = _adamw(tcfg.learning_rate, 1e-5)
    return optax.apply_if_finite(tx, max_consecutive_errors=100)


def init_train_state(
    cfg: AwareConfig, tcfg: TrainConfig, d_params: DetectorParams
) -> TrainState:
    lo, hi = in_band_bins(
        cfg.detection_net.sample_rate, cfg.frame_length, cfg.embedding_bands
    )
    e_params = init_embedder_params(
        tcfg.embedder, hi - lo, cfg.detection_net.output_length
    )
    d_params = {k: jnp.asarray(v) for k, v in d_params.items()}
    trainable = (e_params, d_params) if tcfg.train_detector else e_params
    opt_state = _optimizer(tcfg).init(trainable)
    return TrainState(e_params, d_params, opt_state, jnp.zeros((), jnp.int32))


def _clip_loss(
    cfg, e_params, d_params, audio, pattern, key, desync=False,
    dual_view=False, stretch_rates=DESYNC_STRETCH_RATES,
    det_loss_kind="push_extremes", margin_target=0.5, compression=False,
):
    """One clip's adversarial loss (vmapped over the batch)."""
    n_fft, hop = cfg.frame_length, cfg.hop_length
    window = get_window(cfg.window, cfg.win_length)
    lo, hi = in_band_bins(
        cfg.detection_net.sample_rate, n_fft, cfg.embedding_bands
    )
    mag, phase = magphase(stft(peak_normalize(audio), n_fft, hop, window))
    band = mag[lo:hi]
    band_new = embedder_apply(
        e_params, band, pattern, cfg.tolerance_db, band_phase=phase[lo:hi]
    )
    wmag = jnp.concatenate([mag[:lo], band_new, mag[hi:]], axis=0)
    wm_audio = peak_normalize(istft(polar(wmag, phase), n_fft, hop, window))

    attacks, _ = make_attack_list(
        wm_audio.shape[-1], desync=desync, stretch_rates=stretch_rates,
        compression=compression,
    )
    attacked = apply_random_attack(wm_audio, key, attacks)

    def _detect(x):
        m2, _ = magphase(stft(peak_normalize(x), n_fft, hop, window))
        t2 = m2.shape[-1]
        m2 = jnp.concatenate(
            [
                jnp.zeros((lo, t2), m2.dtype),
                m2[lo:hi],
                jnp.zeros((m2.shape[0] - hi, t2), m2.dtype),
            ]
        )
        return detector_apply(
            d_params, m2, cfg.detection_net, cfg.matmul_precision
        )

    def _push_extremes(pred):
        return jnp.mean((pred - pattern) ** 2) - 0.1 * jnp.mean(jnp.abs(pred))

    def _margin(pred):
        # squared hinge on per-bit agreement: zero once pred*target clears
        # margin_target, quadratic below — weak-but-correct bits (the
        # round-3 U-Net failure mode) keep a restoring gradient.
        a = pred * pattern
        return jnp.mean(jnp.square(jax.nn.relu(margin_target - a)))

    _det_objective = _margin if det_loss_kind == "margin" else _push_extremes
    pred = _detect(attacked)
    det_loss = _det_objective(pred)
    if dual_view:
        det_loss = 0.5 * (det_loss + _det_objective(_detect(wm_audio)))
    percept = jnp.mean((jnp.log1p(band_new) - jnp.log1p(band)) ** 2)
    soft_ber = jnp.mean(jax.nn.sigmoid(-4.0 * pred * pattern))
    hard_ber = jnp.mean((pred * pattern <= 0).astype(jnp.float32))
    return det_loss, percept, soft_ber, hard_ber


def make_train_step(cfg: AwareConfig, tcfg: TrainConfig):
    """Returns jit-able ``step(state, audios, patterns, key) -> (state, metrics)``."""
    opt = _optimizer(tcfg)

    def loss_fn(trainable, d_frozen, audios, patterns, key):
        if tcfg.train_detector:
            e_params, d_params = trainable
        else:
            e_params, d_params = trainable, d_frozen
        keys = jax.random.split(key, audios.shape[0])
        det, percept, soft_ber, hard_ber = jax.vmap(
            lambda a, p, k: _clip_loss(
                cfg, e_params, d_params, a, p, k,
                desync=tcfg.desync_attacks, dual_view=tcfg.dual_view,
                stretch_rates=tcfg.stretch_rates,
                det_loss_kind=tcfg.det_loss,
                margin_target=tcfg.margin_target,
                compression=tcfg.compression_attacks,
            )
        )(audios, patterns, keys)
        loss = jnp.mean(det) + tcfg.lambda_percept * jnp.mean(percept)
        return loss, {
            "loss": loss,
            "det_loss": jnp.mean(det),
            "percept": jnp.mean(percept),
            "soft_ber": jnp.mean(soft_ber),
            "hard_ber": jnp.mean(hard_ber),
        }

    def step(state: TrainState, audios, patterns, key):
        trainable = (
            (state.e_params, state.d_params)
            if tcfg.train_detector
            else state.e_params
        )
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, state.d_params, audios, patterns, key
        )
        updates, opt_state = opt.update(grads, state.opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        if tcfg.train_detector:
            e_params, d_params = new_trainable
        else:
            e_params, d_params = new_trainable, state.d_params
        return (
            TrainState(e_params, d_params, opt_state, state.step + 1),
            metrics,
        )

    return step


train_step = make_train_step  # alias exported name


def train_amortized_embedder(
    cfg: AwareConfig,
    tcfg: TrainConfig,
    d_params: DetectorParams,
    clip_sampler: Callable[[int], np.ndarray],
    seed: int = 0,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 200,
    mesh=None,
    init_e_params=None,
) -> tuple[TrainState, list[dict[str, float]]]:
    """Run the adversarial training loop.

    ``clip_sampler(step) -> (batch_size, L) float32`` supplies audio.  With
    ``mesh`` given, the batch is sharded over its ``data`` axis.
    ``init_e_params`` warm-starts the embedder from existing weights.
    """
    from aware_tpu.utils.logger import logger

    state = init_train_state(cfg, tcfg, d_params)
    if init_e_params is not None:
        state = state._replace(
            e_params=jax.tree.map(jnp.asarray, dict(init_e_params))
        )
    step_fn = make_train_step(cfg, tcfg)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        data_sharding = NamedSharding(mesh, P("data"))
        jit_step = jax.jit(step_fn, in_shardings=(None, data_sharding, data_sharding, None))
    else:
        jit_step = jax.jit(step_fn)

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    history: list[dict[str, float]] = []
    n_bits = cfg.detection_net.output_length
    for i in range(tcfg.steps):
        audios = jnp.asarray(clip_sampler(i), jnp.float32)
        patterns = jnp.asarray(
            rng.integers(0, 2, (audios.shape[0], n_bits)) * 2 - 1, jnp.float32
        )
        key, sub = jax.random.split(key)
        state, metrics = jit_step(state, audios, patterns, sub)
        history.append({k: float(v) for k, v in metrics.items()})
        if i % 50 == 0:
            logger.info(
                "train step %d: loss=%.4f soft_ber=%.4f hard_ber=%.4f "
                "percept=%.5f",
                i, history[-1]["loss"], history[-1]["soft_ber"],
                history[-1].get("hard_ber", float("nan")),
                history[-1]["percept"],
            )
        if checkpoint_dir and (i + 1) % checkpoint_every == 0:
            save_checkpoint(checkpoint_dir, state)
    if checkpoint_dir:
        save_checkpoint(checkpoint_dir, state)
    return state, history


# ------------------------------------------------------------ inference ---

def amortized_embed(
    state_or_eparams,
    d_params: DetectorParams,
    audio: np.ndarray,
    pattern: np.ndarray,
    cfg: AwareConfig,
) -> np.ndarray:
    """One-shot embed with the trained network (no inner optimization).

    Same service contract as the solver path: peak-normalized output of
    length (T-1)*hop.
    """
    e_params = (
        state_or_eparams.e_params
        if isinstance(state_or_eparams, TrainState)
        else state_or_eparams
    )
    n_fft, hop = cfg.frame_length, cfg.hop_length
    window = get_window(cfg.window, cfg.win_length)
    lo, hi = in_band_bins(
        cfg.detection_net.sample_rate, n_fft, cfg.embedding_bands
    )

    @jax.jit
    def run(ep, a, p):
        mag, phase = magphase(stft(peak_normalize(a), n_fft, hop, window))
        band_new = embedder_apply(
            ep, mag[lo:hi], p, cfg.tolerance_db, band_phase=phase[lo:hi]
        )
        wmag = jnp.concatenate([mag[:lo], band_new, mag[hi:]], axis=0)
        return peak_normalize(istft(polar(wmag, phase), n_fft, hop, window))

    return np.asarray(
        run(e_params, jnp.asarray(audio, jnp.float32), jnp.asarray(pattern, jnp.float32))
    )


# ---------------------------------------------------------- checkpoints ---

def save_checkpoint(path: str | pathlib.Path, state: TrainState) -> None:
    """Orbax checkpoint of the full train state."""
    import orbax.checkpoint as ocp

    path = pathlib.Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(
            path / f"step_{int(state.step)}",
            jax.tree.map(np.asarray, state._asdict()),
            force=True,
        )


def restore_checkpoint(
    path: str | pathlib.Path, step: int | None = None
) -> TrainState:
    import orbax.checkpoint as ocp

    path = pathlib.Path(path).absolute()
    if step is None:
        steps = sorted(
            int(p.name.split("_")[1]) for p in path.glob("step_*") if p.is_dir()
        )
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {path}")
        step = steps[-1]
    with ocp.PyTreeCheckpointer() as ckptr:
        tree = ckptr.restore(path / f"step_{step}")
    return TrainState(
        e_params=tree["e_params"],
        d_params=tree["d_params"],
        opt_state=tree["opt_state"],
        step=jnp.asarray(tree["step"]),
    )
