"""Differentiable lossy-compression approximation (MP3-style).

The reference shells out to ffmpeg/libmp3lame per clip
(reference: scripts/attacks.py:105-148).  For a TPU-native attack layer the
codec is approximated in-graph: MDCT analysis with a sine window, a
psychoacoustic-ish masking threshold from Bark-band spreading, quality-
scaled quantization of the MDCT coefficients, inverse MDCT.  The
approximation reproduces the *signal-degradation character* of MP3 (band-
limited quantization noise shaped under the signal's spectral envelope,
pre/post-echo at transients) without bit-exact codec behavior.

Quantization uses straight-through rounding so the whole attack is
differentiable for in-loop adversarial training (BASELINE config 4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_FRAME = 1152  # MP3 granule-pair size
_HOP = _FRAME // 2

# quality 0 (best) .. 9 (worst) -> noise-floor scale relative to masking
# threshold; calibrated so q=9 is clearly audible and q=0 near-transparent
_QUALITY_SCALE = {
    0: 0.02, 1: 0.035, 2: 0.06, 3: 0.1, 4: 0.17,
    5: 0.28, 6: 0.45, 7: 0.7, 8: 1.1, 9: 1.8,
}


def _sine_window(n: int) -> np.ndarray:
    return np.sin(np.pi * (np.arange(n) + 0.5) / n).astype(np.float64)


@functools.lru_cache(maxsize=4)
def _mdct_matrix(n: int) -> np.ndarray:
    """(n, n//2) MDCT basis including the sine window."""
    k = np.arange(n // 2)[None, :]
    t = np.arange(n)[:, None]
    basis = np.cos(
        (2.0 * np.pi / n) * (t + 0.5 + n / 4.0) * (k + 0.5)
    )
    return (_sine_window(n)[:, None] * basis * np.sqrt(2.0 / (n // 2))).astype(
        np.float32
    )


@functools.lru_cache(maxsize=4)
def _bark_spread(n_coef: int, sr: int) -> np.ndarray:
    """(n_coef, n_coef) spreading matrix on the Bark axis (simple +/-1 Bark
    triangular spreading)."""
    f = (np.arange(n_coef) + 0.5) * (sr / 2.0) / n_coef
    z = 13.0 * np.arctan(0.00076 * f) + 3.5 * np.arctan((f / 7500.0) ** 2)
    dz = np.abs(z[:, None] - z[None, :])
    spread = np.maximum(0.0, 1.0 - dz / 1.0)
    spread /= spread.sum(axis=1, keepdims=True)
    return spread.astype(np.float32)


def _ste_round(x: jnp.ndarray) -> jnp.ndarray:
    """round() with a straight-through gradient."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def mp3_approx(x: jnp.ndarray, sr: int, quality: int = 2) -> jnp.ndarray:
    """MDCT-domain perceptual quantization; length-preserving."""
    scale = _QUALITY_SCALE[int(quality)]
    n = _FRAME
    L = x.shape[-1]
    pad = (-(L - n) % _HOP) + n  # cover the tail + one extra frame of lead
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(_HOP, pad)])
    n_frames = (xp.shape[-1] - n) // _HOP + 1
    idx = np.arange(n_frames)[:, None] * _HOP + np.arange(n)[None, :]
    frames = xp[..., idx]  # (..., T, n)

    M = jnp.asarray(_mdct_matrix(n))
    coefs = frames @ M  # (..., T, n//2)

    # masking threshold: spread magnitude envelope per frame
    spread = jnp.asarray(_bark_spread(n // 2, sr))
    envelope = jnp.abs(coefs) @ spread.T
    step = scale * (envelope + 1e-6)
    q = _ste_round(coefs / step) * step

    rec = q @ M.T  # (..., T, n) — synthesis with the same windowed basis;
    # the sine window satisfies Princen-Bradley so TDAC aliasing cancels
    # in the 50% overlap-add
    chunks = rec.reshape(*rec.shape[:-1], 2, _HOP)
    out_rows = jnp.zeros((*x.shape[:-1], n_frames + 1, _HOP), dtype=x.dtype)
    out_rows = out_rows.at[..., 0:n_frames, :].add(chunks[..., 0, :])
    out_rows = out_rows.at[..., 1 : n_frames + 1, :].add(chunks[..., 1, :])
    y = out_rows.reshape(*x.shape[:-1], -1)
    return y[..., _HOP : _HOP + L]
