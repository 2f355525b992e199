"""Phase-vocoder time stretch / pitch shift.

Replaces the reference's subprocess calls into the rubberband CLI
(reference: scripts/attacks.py:226,250 via pyrubberband) with an in-graph
phase vocoder: identity-phase-locked magnitude interpolation with
cumulative-sum phase propagation — fully vectorized (no scan), so it vmaps
and differentiates.
"""

from __future__ import annotations

import fractions

import jax.numpy as jnp
import numpy as np

from aware_tpu.ops.resample import resample_poly
from aware_tpu.ops.stft import istft, polar, safe_angle, safe_magnitude, stft
from aware_tpu.ops.windows import get_window

_N_FFT = 2048
_HOP = 512


def time_stretch(x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Stretch playback speed by ``rate`` (rate>1 -> shorter output).

    Output length is static: ``((T-1)//rate rounded) * hop`` frames worth.
    """
    if rate == 1.0:
        return x
    w = get_window("hann", _N_FFT)
    z = stft(x, _N_FFT, _HOP, w)  # (F, T)
    # gradient-safe decomposition: the robust solver's EOT views
    # differentiate through this phase (values match magphase exactly)
    mag = safe_magnitude(z.real, z.imag)
    phase = safe_angle(z.real, z.imag)
    t_in = z.shape[-1]

    # fractional analysis positions
    steps = np.arange(0.0, t_in - 1, rate)  # host: static length
    lo = np.floor(steps).astype(np.int32)
    frac = jnp.asarray((steps - lo)[None, :], dtype=mag.dtype)
    lo_j = jnp.asarray(lo)

    mag_i = mag[:, lo_j] * (1 - frac) + mag[:, lo_j + 1] * frac

    # expected phase advance per hop for each bin
    omega = (
        2.0 * np.pi * _HOP * np.arange(_N_FFT // 2 + 1) / _N_FFT
    ).astype(np.float64)
    omega_j = jnp.asarray(omega[:, None], dtype=mag.dtype)
    dphi = phase[:, lo_j + 1] - phase[:, lo_j] - omega_j
    dphi = dphi - 2.0 * jnp.pi * jnp.round(dphi / (2.0 * jnp.pi))  # princarg
    increments = omega_j + dphi  # true per-step phase advance

    # accumulated synthesis phase: start at the first analysis phase
    acc = jnp.cumsum(
        jnp.concatenate([phase[:, lo_j[:1]], increments[:, :-1]], axis=1),
        axis=1,
    )
    return istft(polar(mag_i, acc), _N_FFT, _HOP, w)


def pitch_shift(x: jnp.ndarray, semitones: float) -> jnp.ndarray:
    """Shift pitch preserving duration: stretch by r=2^(s/12), then resample
    back (rational approximation of r)."""
    if semitones == 0.0:
        return x
    rate = 2.0 ** (-semitones / 12.0)
    stretched = time_stretch(x, rate)
    frac = fractions.Fraction(rate).limit_denominator(1000)
    y = resample_poly(stretched, frac.numerator, frac.denominator)
    n = x.shape[-1]
    if y.shape[-1] >= n:
        return y[..., :n]
    return jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, n - y.shape[-1])])
