"""Desync-robust detection via compensation search — one fused dispatch.

A capability the reference lacks: recovery from playback-rate desync
(resampling-style speed edits — tape/vinyl/player speed, sample-rate
mislabeling) and phase-vocoder time-stretch, both of which drive naive
detection to chance (measured 35-60% BER at ±5-10% speed).

* **Speed change** is exactly invertible by resampling, so the detector
  scans a grid of candidate compensation rates.
* **Time-stretch** (duration change at constant pitch) is not exactly
  invertible — the vocoder smears per-frame magnitudes — but re-stretching
  by the inverse factor restores the *time base*, which is what the
  detector needs most: the keyed CNN pools over time, so re-aligning
  frames recovers most of the pattern.  The same confidence search
  (largest mean |tanh readout|) picks the winning hypothesis.

TPU-first design: the whole grid — 20 polyphase resamples, 20 STFTs, 20
keyed-CNN forwards — compiles into ONE jitted program per clip length.
Each candidate rate has a *static* output length at trace time, so each
lane gets an exact (reflect-padded, full-length) STFT; lanes are then
zero-padded to a common frame count and run through the masked detector
forward (`detector_apply_masked`), whose statistics ignore padding.  One
dispatch replaces the previous 20 sequential detect calls — measured on
the real chip (2 s clip): 146-200 ms/clip fused vs ~198 ms *per dispatch*
sequential (≈4-8 s/clip for resample+detect pairs), a 25-50× latency win.
"""

from __future__ import annotations

import fractions
import functools

import jax
import jax.numpy as jnp
import numpy as np

from aware_tpu.config import in_band_bins
from aware_tpu.models.detector import (
    detector_apply_masked,
    preprocess_magnitude,
)
from aware_tpu.ops.resample import resample_poly
from aware_tpu.ops.windows import get_window
from aware_tpu.service.api import AWAREDetector
from aware_tpu.service.codec import decode_pattern

DEFAULT_RATES: tuple[float, ...] = (
    0.78, 0.8, 0.82, 0.85, 0.88, 0.9, 0.92, 0.95, 0.97, 1.0,
    1.03, 1.05, 1.08, 1.1, 1.12, 1.15, 1.18, 1.2, 1.22, 1.25,
)


def _rate_fraction(rate: float) -> fractions.Fraction:
    return fractions.Fraction(rate).limit_denominator(64)


@functools.lru_cache(maxsize=8)
def _grid_fn(rates: tuple[float, ...], cfg):
    """Build the jitted all-rates detect: waveform (L,) -> (R, bits) values.

    Rates and the derived per-lane lengths are trace-time constants, so
    every lane's STFT is exact (no dynamic shapes); only the detector
    forward needs masking.
    """
    net_cfg = cfg.detection_net
    w = get_window(cfg.window, cfg.win_length or net_cfg.n_fft)
    lo, hi = in_band_bins(net_cfg.sample_rate, net_cfg.n_fft, cfg.embedding_bands)
    fracs = [_rate_fraction(r) for r in rates]

    @jax.jit
    def run(params, x):
        mags, masks = [], []
        for frac in fracs:
            comp = (
                x
                if frac == 1
                else resample_poly(x, frac.numerator, frac.denominator)
            )
            mags.append(
                preprocess_magnitude(
                    comp, net_cfg.n_fft, cfg.hop_length, w, lo, hi
                )
            )
        t_max = max(m.shape[-1] for m in mags)
        for i, m in enumerate(mags):
            t = m.shape[-1]
            masks.append(
                jnp.concatenate(
                    [jnp.ones(t, m.dtype), jnp.zeros(t_max - t, m.dtype)]
                )
            )
            if t < t_max:
                mags[i] = jnp.pad(m, ((0, 0), (0, t_max - t)))
        mag_b = jnp.stack(mags)      # (R, F, T_max)
        mask_b = jnp.stack(masks)    # (R, T_max)
        return jax.vmap(
            lambda m, k: detector_apply_masked(
                params, m, k, net_cfg, cfg.matmul_precision
            )
        )(mag_b, mask_b)

    return run


def robust_values(
    detector: AWAREDetector,
    audio: np.ndarray,
    rates: tuple[float, ...] = DEFAULT_RATES,
) -> np.ndarray:
    """(R, bits) raw detector values for every compensation rate, computed
    in one dispatch."""
    run = _grid_fn(tuple(rates), detector.cfg)
    return np.asarray(run(detector.params, jnp.asarray(audio, jnp.float32)))


def detect_watermark_robust(
    audio: np.ndarray,
    sample_rate: int,
    detector: AWAREDetector,
    rates: tuple[float, ...] = DEFAULT_RATES,
    return_confidence: bool = False,
    refine: bool = True,
):
    """Detect under unknown time-scaling; returns decoded bits (and the
    winning (rate, confidence) when requested).

    A clip stretched by rate r is compensated by resampling with factor r
    (length × r brings it back to the original time base).  The winner is
    the most confident readout — the tanh head saturates toward ±1 when
    the time base matches.

    Two-stage search: the coarse grid's 2-3% spacing can leave ~1% residual
    desync (≈1 frame of drift per second), costing a bit or two; with
    ``refine`` a second fused dispatch scans ±1.5% around the coarse winner
    in 0.5% steps and keeps the best of both stages.  Fine grids are
    jit-cached per coarse winner, so steady-state streams pay one compile.
    """
    audio = np.asarray(audio, dtype=np.float32)
    if audio.ndim == 2:
        audio = audio.mean(axis=1)
    if sample_rate != detector.cfg.detection_net.sample_rate:
        raise ValueError(
            f"Robust detector operates at "
            f"{detector.cfg.detection_net.sample_rate} Hz"
        )
    rates = tuple(rates)
    values = robust_values(detector, audio, rates)
    conf = np.mean(np.abs(values), axis=1)
    best = int(np.argmax(conf))
    best_rate, best_conf, best_values = rates[best], conf[best], values[best]

    if refine and best_rate != 1.0:
        fine = tuple(
            round(best_rate * f, 4)
            for f in (0.985, 0.99, 0.995, 1.005, 1.01, 1.015)
        )
        fvalues = robust_values(detector, audio, fine)
        fconf = np.mean(np.abs(fvalues), axis=1)
        fbest = int(np.argmax(fconf))
        if fconf[fbest] > best_conf:
            best_rate, best_conf = fine[fbest], fconf[fbest]
            best_values = fvalues[fbest]

    bits = decode_pattern(
        best_values, detector.pattern_mode, detector.threshold
    )
    if return_confidence:
        return bits, float(best_rate), float(best_conf)
    return bits
