"""Framed FFT / overlap-add core, with ``torch.stft``-exact semantics.

This is the performance- and correctness-critical op set: the embed solver
differentiates through a full ISTFT -> STFT round trip every iteration
(reference: src/AWARE/embedding/multibit_embedder.py:49-67,103), so any
mismatch versus ``torch.stft(center=True)`` / ``torch.istft(center=True)``
(reference: src/AWARE/utils/audio/stft.py:28,48) breaks bit parity.

Semantics reproduced exactly (validated against torch in tests/test_stft.py):

* ``center=True`` reflect-pads ``n_fft//2`` samples on both sides.
* Frame count ``T = len(x) // hop + 1``.
* ``istft`` with no explicit length returns ``(T - 1) * hop`` samples —
  i.e. a round trip truncates the clip to a hop multiple.  The reference
  embed path inherits this truncation and so do we.
* ``istft`` divides by the overlap-added squared-window envelope.  The
  envelope depends only on static shapes, so it is precomputed on the host
  in float64 and constant-folded by XLA.

TPU-first design notes:

* Framing is a reshape-free gather; overlap-add is expressed as
  ``R = n_fft // hop`` statically-sliced adds instead of a scatter, which XLA
  lowers to cheap pad+add fusions (no serialization, fully differentiable).
* Everything here is shape-static and jit/vmap/grad-safe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aware_tpu.ops.windows import get_window


def num_frames(length: int, hop_length: int) -> int:
    """Frame count of a centered STFT over ``length`` samples."""
    return length // hop_length + 1


def istft_length(n_frames: int, hop_length: int) -> int:
    """Output length of a centered ISTFT with no explicit length."""
    return (n_frames - 1) * hop_length


def _frame_indices(length: int, n_fft: int, hop_length: int) -> np.ndarray:
    """Host-side (T, n_fft) gather indices into the padded signal."""
    t = num_frames(length, hop_length)
    starts = np.arange(t, dtype=np.int32)[:, None] * hop_length
    offs = np.arange(n_fft, dtype=np.int32)[None, :]
    return starts + offs


def _reflect_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflect-pad the last axis by ``pad`` on both sides (no edge repeat)."""
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")


def stft_frames(
    x: jnp.ndarray, n_fft: int, hop_length: int, window: jnp.ndarray | np.ndarray
) -> jnp.ndarray:
    """Center-pad, frame and window a 1-D signal -> (T, n_fft) real frames.

    When ``hop | n_fft`` framing is expressed as ``r = n_fft/hop`` static
    slices of a (T+r-1, hop) reshape instead of a (T, n_fft) gather: the
    gather's VJP is a huge scatter-add that dominated the embed loop's
    backward pass on TPU; the slice form differentiates into cheap
    pad+adds.
    """
    length = x.shape[-1]
    t = num_frames(length, hop_length)
    xp = _reflect_pad(x, n_fft // 2)
    w = jnp.asarray(window, dtype=x.dtype)
    if n_fft % hop_length == 0:
        r = n_fft // hop_length
        rows = xp[..., : (t - 1 + r) * hop_length].reshape(
            *x.shape[:-1], t - 1 + r, hop_length
        )
        frames = jnp.concatenate(
            [rows[..., k : k + t, :] for k in range(r)], axis=-1
        )
        return frames * w
    idx = _frame_indices(length, n_fft, hop_length)
    return xp[..., idx] * w


def stft(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    window: str | jnp.ndarray | np.ndarray = "hann",
    win_length: int | None = None,
) -> jnp.ndarray:
    """Centered STFT of a 1-D signal -> complex (n_fft//2+1, T).

    Matches ``torch.stft(x, n_fft, hop_length, center=True, window=w,
    return_complex=True)`` (reference: utils/audio/stft.py:28): onesided,
    unnormalized, reflect padding, (freq, time) layout.
    """
    if isinstance(window, str):
        window = get_window(window, win_length or n_fft)
    frames = stft_frames(x, n_fft, hop_length, window)
    spec = jnp.fft.rfft(frames, axis=-1)  # (..., T, F)
    return jnp.swapaxes(spec, -1, -2)  # (..., F, T)


@functools.lru_cache(maxsize=64)
def _ola_envelope(
    window_key: tuple, n_fft: int, hop_length: int, n_frames: int
) -> np.ndarray:
    """Cropped overlap-added squared-window envelope, float64 host-side.

    ``torch.istft`` computes the same envelope dynamically; here it is a
    trace-time constant (depends only on static shapes).
    """
    w = np.asarray(window_key, dtype=np.float64)
    total = (n_frames - 1) * hop_length + n_fft
    env = np.zeros(total, dtype=np.float64)
    wsq = w * w
    for t in range(n_frames):
        env[t * hop_length : t * hop_length + n_fft] += wsq
    pad = n_fft // 2
    out_len = istft_length(n_frames, hop_length)
    env = env[pad : pad + out_len]
    if np.any(env < 1e-11):
        raise ValueError("window overlap-add envelope is ~0 (NOLA violated)")
    return env


def overlap_add(frames: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """Overlap-add (..., T, n_fft) frames -> (..., (T-1)*hop + n_fft) signal.

    When ``n_fft % hop == 0`` (the framework default: 1024/256) this is
    R = n_fft//hop statically-sliced adds on a (T+R-1, hop) buffer — an XLA
    friendly formulation with no scatter and no serial dependence.
    """
    *batch, t, n_fft = frames.shape
    total = (t - 1) * hop_length + n_fft
    if n_fft % hop_length == 0:
        r = n_fft // hop_length
        chunks = frames.reshape(*batch, t, r, hop_length)
        out = jnp.zeros((*batch, t + r - 1, hop_length), dtype=frames.dtype)
        for k in range(r):
            out = out.at[..., k : k + t, :].add(chunks[..., :, k, :])
        return out.reshape(*batch, (t + r - 1) * hop_length)[..., :total]
    # Generic fallback: segment-sum scatter.
    idx = (
        np.arange(t, dtype=np.int32)[:, None] * hop_length
        + np.arange(n_fft, dtype=np.int32)[None, :]
    ).reshape(-1)
    flat = frames.reshape(*batch, t * n_fft)
    out = jnp.zeros((*batch, total), dtype=frames.dtype)
    return out.at[..., idx].add(flat)


def istft(
    spec: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    window: str | jnp.ndarray | np.ndarray = "hann",
    win_length: int | None = None,
) -> jnp.ndarray:
    """Centered inverse STFT of complex (F, T) -> ((T-1)*hop,) signal.

    Matches ``torch.istft(Z, n_fft, hop_length, center=True, window=w)``
    (reference: utils/audio/stft.py:48): least-squares overlap-add with the
    squared-window envelope, center-cropped, implicit output length.
    """
    if isinstance(window, str):
        window = get_window(window, win_length or n_fft)
    window = np.asarray(window)
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    frames = frames * jnp.asarray(window, dtype=frames.dtype)
    return istft_synthesis(frames, n_fft, hop_length, window)


def istft_synthesis(
    wframes: jnp.ndarray, n_fft: int, hop_length: int, window: np.ndarray
) -> jnp.ndarray:
    """OLA + center-crop + envelope division of already-windowed time
    frames (..., T, n_fft) — the back half of :func:`istft`, exposed so the
    fast embed path can substitute MXU DFT matmuls for the irfft."""
    t = wframes.shape[-2]
    y = overlap_add(wframes, hop_length)
    pad = n_fft // 2
    out_len = istft_length(t, hop_length)
    y = y[..., pad : pad + out_len]
    env = _ola_envelope(tuple(np.asarray(window).tolist()), n_fft, hop_length, t)
    return y / jnp.asarray(env, dtype=y.dtype)


@functools.lru_cache(maxsize=8)
def rfft_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag rFFT basis matrices (n_fft, n_fft//2+1), float32.

    ``frames @ C`` and ``frames @ S`` give Re/Im of the rFFT — the MXU
    formulation of the framed FFT used by the fast embed path (the per-bin
    magnitude path only needs a 225-row band, where an FFT must compute all
    513 bins).
    """
    eye = np.eye(n_fft)
    M = np.fft.rfft(eye, axis=-1)
    return (
        np.ascontiguousarray(M.real, dtype=np.float32),
        np.ascontiguousarray(M.imag, dtype=np.float32),
    )


@functools.lru_cache(maxsize=8)
def irfft_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse basis (n_fft//2+1, n_fft): ``Re @ A + Im @ B`` == irfft(Z)."""
    f = n_fft // 2 + 1
    A = np.fft.irfft(np.eye(f), n=n_fft, axis=-1)
    B = np.fft.irfft(1j * np.eye(f), n=n_fft, axis=-1)
    return (
        np.ascontiguousarray(A, dtype=np.float32),
        np.ascontiguousarray(B, dtype=np.float32),
    )


def peak_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """x / (max|x| + 1e-8), peak-normalize to [-1, 1].

    (reference: utils/audio/waveform.py:8-19 — the reference computes
    ``max(|x| + eps)`` which equals ``max|x| + eps``.)
    """
    return x / (jnp.max(jnp.abs(x)) + 1e-8)


def safe_magnitude(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    """sqrt(re² + im²) with torch's gradient convention at exactly-zero
    bins: value 0, gradient 0.

    jnp.abs/sqrt give NaN gradients at 0 (0/0); torch defines sgn(0)=0.
    Exactly-zero spectral bins occur on real inputs — silence regions of
    pause-bearing speech round-trip to bit-zero frames — and one NaN
    gradient poisons the whole embed trajectory (found via the 24-clip
    parity sweep: every hard-pause clip failed at chance while the torch
    oracle succeeded).  Values are bit-identical to the naive form.
    """
    sq = re * re + im * im
    zero = sq == 0
    return jnp.where(zero, 0.0, jnp.sqrt(jnp.where(zero, 1.0, sq)))


def safe_angle(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    """arctan2(im, re) with zero gradient at exactly-zero bins.

    The true derivative of angle scales with 1/|z|^2 and is NaN at the
    origin; zero bins occur on real silence regions, and any path that
    differentiates *through* the phase (the EOT stretch views of the
    robust solver differentiate the vocoder's phase propagation) would be
    NaN-poisoned.  Values are identical to ``jnp.angle`` (angle(0) = 0).
    """
    zero = (re == 0) & (im == 0)
    re_s = jnp.where(zero, 1.0, re)
    im_s = jnp.where(zero, 0.0, im)
    return jnp.where(zero, 0.0, jnp.arctan2(im_s, re_s))


def magphase(spec: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Complex STFT -> (magnitude, phase) (reference: stft.py:50-55).

    The magnitude uses :func:`safe_magnitude` (torch-convention zero
    gradient at zero bins; values unchanged)."""
    return safe_magnitude(spec.real, spec.imag), jnp.angle(spec)


def polar(magnitude: jnp.ndarray, phase: jnp.ndarray) -> jnp.ndarray:
    """(magnitude, phase) -> complex STFT (reference: stft.py:57-62).

    Built from cos/sin rather than ``exp(1j*phase)`` so gradients w.r.t. the
    magnitude stay real-valued and cheap.
    """
    return jax.lax.complex(magnitude * jnp.cos(phase), magnitude * jnp.sin(phase))
