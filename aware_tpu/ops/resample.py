"""Polyphase resampling as a dilated strided convolution.

Replaces the reference's host-side ``scipy.signal.resample_poly`` calls
(reference: scripts/test.py:60-65, scripts/attacks.py:289-294,
metrics/audio.py:37-38 via librosa) with a TPU-native formulation:
zero-stuffing + FIR + decimation expressed as one
``lax.conv_general_dilated`` with ``lhs_dilation=up`` and
``window_strides=down`` — no upsampled intermediate is ever materialized,
and the FIR rides the MXU for large batches.

Filter design (host, numpy float64) reproduces scipy's defaults exactly:
``firwin(2*10*max(up,down)+1, cutoff=1/max(up,down), window=('kaiser', 5.0))``
scaled by ``up``; output trimming matches ``scipy.signal.resample_poly``
(validated in tests/test_resample.py against scipy).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _kaiser(numtaps: int, beta: float) -> np.ndarray:
    n = np.arange(numtaps, dtype=np.float64)
    alpha = (numtaps - 1) / 2.0
    arg = beta * np.sqrt(np.maximum(0.0, 1.0 - ((n - alpha) / alpha) ** 2))
    return np.i0(arg) / np.i0(beta)


def _firwin_kaiser(numtaps: int, cutoff: float, beta: float = 5.0) -> np.ndarray:
    """Lowpass FIR via windowed sinc; ``cutoff`` relative to Nyquist.

    Matches scipy.signal.firwin(numtaps, cutoff, window=('kaiser', beta))
    with default scaling (unit DC gain).
    """
    n = np.arange(numtaps, dtype=np.float64)
    alpha = (numtaps - 1) / 2.0
    m = n - alpha
    h = cutoff * np.sinc(cutoff * m)
    h *= _kaiser(numtaps, beta)
    # scale for unit gain at DC
    h /= np.sum(h)
    return h


@functools.lru_cache(maxsize=64)
def polyphase_filter(up: int, down: int) -> np.ndarray:
    """scipy-compatible anti-aliasing FIR for a rational up/down resample."""
    max_rate = max(up, down)
    half_len = 10 * max_rate
    h = _firwin_kaiser(2 * half_len + 1, 1.0 / max_rate, beta=5.0)
    return (h * up).astype(np.float64)


def _upfirdn_conv(x: jnp.ndarray, h: np.ndarray, up: int, down: int) -> jnp.ndarray:
    """upfirdn(h, x, up, down) for (..., L) input via dilated strided conv."""
    L = len(h)
    batch_shape = x.shape[:-1]
    xb = x.reshape((-1, 1, x.shape[-1]))  # (N, C=1, W)
    # correlation with flipped kernel == convolution
    k = jnp.asarray(h[::-1].copy(), dtype=x.dtype).reshape((1, 1, L))
    y = jax.lax.conv_general_dilated(
        xb,
        k,
        window_strides=(down,),
        padding=[(L - 1, L - 1)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y.reshape(*batch_shape, y.shape[-1])


def resample_poly(x: jnp.ndarray, up: int, down: int) -> jnp.ndarray:
    """Rational-rate resample of the last axis; scipy.resample_poly semantics.

    Static output length ``ceil(L * up / down)``; jit/vmap/grad-safe.
    """
    g = math.gcd(up, down)
    up, down = up // g, down // g
    if up == down == 1:
        return x
    n_in = x.shape[-1]
    n_out = -(-n_in * up // down)  # ceil
    h = polyphase_filter(up, down)
    half_len = (len(h) - 1) // 2
    # scipy pads h so the filter delay is an integer number of output samples
    n_pre_pad = down - (half_len % down) if half_len % down else 0
    h_padded = np.concatenate([np.zeros(n_pre_pad), h])
    n_pre_remove = (half_len + n_pre_pad) // down
    y = _upfirdn_conv(x, h_padded, up, down)
    return y[..., n_pre_remove : n_pre_remove + n_out]


def resample(x: jnp.ndarray, orig_sr: int, target_sr: int) -> jnp.ndarray:
    """Resample between integer sample rates (e.g. 44100 -> 16000)."""
    if orig_sr == target_sr:
        return x
    return resample_poly(x, target_sr, orig_sr)
