"""Desync-robust detection via compensation search — one fused dispatch.

A capability the reference lacks: recovery from playback-rate desync
(resampling-style speed edits — tape/vinyl/player speed, sample-rate
mislabeling) and phase-vocoder time-stretch, both of which drive naive
detection to chance (measured 35-60% BER at ±5-10% speed).

Two hypothesis families, searched jointly by detector confidence:

* **Resample compensation** — speed change is exactly invertible by
  resampling, so lanes scan a grid of candidate rates.
* **Vocoder re-stretch compensation** — time-stretch (duration change at
  constant pitch) is not exactly invertible, but re-stretching with the
  inverse factor restores the *time base* without touching pitch; the
  keyed CNN's in-band frequency pattern then lines up again.  (Resample
  lanes also restore the time base but scale every frequency by the rate,
  which scrambles the key's frequency structure — measured strictly worse
  on vocoder-stretched clips.)

The winning hypothesis is the most confident readout (largest mean |tanh
readout|); a clean clip wins at the identity lane, so enabling the search
never costs accuracy on undesynced audio.

TPU-first design: the whole grid — every resample/vocoder compensation,
STFT, and keyed-CNN forward — compiles into ONE jitted program per clip
length.  Each candidate has a *static* output length at trace time, so
each lane gets an exact (reflect-padded, full-length) STFT; lanes are
then zero-padded to a common frame count and run through the masked
detector forward (`detector_apply_masked`), whose statistics ignore
padding.  One dispatch replaces per-candidate sequential detect calls —
measured on the real chip (2 s clip): 146-200 ms/clip fused vs ~198 ms
*per dispatch* sequential, a 25-50x latency win.

API note (round 3, pre-1.0 break): ``detect_watermark_robust(...,
return_confidence=True)`` returns a 4-field :class:`RobustDetection`
NamedTuple; earlier rounds returned a 3-tuple ``(bits, signed_rate,
conf)``.  Callers unpacking three values must switch to named fields.
"""

from __future__ import annotations

import fractions
import functools
import typing

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

# Vocoder-compensation lanes: a time-stretch attack at rate r is undone by
# re-stretching at 1/r, so this grid spans the inverse of the attack range
# the eval suite exercises (ts_0.8 .. ts_1.2 -> compensation 1.25 .. 0.83).
DEFAULT_STRETCH_RATES: tuple[float, ...] = (
    0.8, 0.83, 0.86, 0.9, 0.93, 0.96, 1.04, 1.08, 1.12, 1.16, 1.2, 1.25,
)

Hypothesis = tuple[str, float]  # ("resample" | "stretch", rate)


class RobustDetection(typing.NamedTuple):
    """Winning hypothesis of the compensation search.

    ``kind`` names the family explicitly ("resample" | "stretch") instead
    of encoding it in the sign of ``rate``, so the rate is always the
    plain positive length multiplier callers can log or use numerically.
    """

    bits: "np.ndarray"
    kind: str
    rate: float
    confidence: float


def _rate_fraction(rate: float) -> fractions.Fraction:
    return fractions.Fraction(rate).limit_denominator(64)


def _compensate(x: jnp.ndarray, kind: str, rate: float) -> jnp.ndarray:
    """Apply one static-shape compensation lane (trace-time dispatch)."""
    if rate == 1.0:
        return x
    if kind == "resample":
        frac = _rate_fraction(rate)
        return resample_poly(x, frac.numerator, frac.denominator)
    if kind == "stretch":
        from aware_tpu.attacks.vocoder import time_stretch

        # time_stretch(x, s) maps T frames -> ~T/s, so the lane's rate r
        # (desired length multiplier) is applied as stretch factor 1/r.
        return time_stretch(x, 1.0 / rate)
    raise ValueError(f"unknown compensation kind {kind!r}")


# maxsize covers the coarse grid plus one fine grid per coarse winner
# (the winners come from the finite DEFAULT_RATES x refine-factor set), so
# steady-state streams with varied winners never thrash the closure cache
# (the underlying jit cache is global either way).
@functools.lru_cache(maxsize=64)
def _grid_fn(hypotheses: tuple[Hypothesis, ...], cfg, split: bool = False):
    """Build the jitted all-hypotheses detect: waveform (L,) -> (H, bits),
    or, with ``split``, (H, 3, bits) — per lane the full-clip readout plus
    the first- and second-half readouts (same magnitudes, half masks),
    which feed the split-half coherence lane score.

    Hypotheses and the derived per-lane lengths are trace-time constants,
    so every lane's STFT is exact (no dynamic shapes); only the detector
    forward needs masking.
    """
    net_cfg = cfg.detection_net
    w = get_window(cfg.window, cfg.win_length or net_cfg.n_fft)
    lo, hi = in_band_bins(net_cfg.sample_rate, net_cfg.n_fft, cfg.embedding_bands)

    @jax.jit
    def run(params, x):
        mags, masks = [], []
        for kind, rate in hypotheses:
            comp = _compensate(x, kind, rate)
            mags.append(
                preprocess_magnitude(
                    comp, net_cfg.n_fft, cfg.hop_length, w, lo, hi
                )
            )
        t_max = max(m.shape[-1] for m in mags)
        for i, m in enumerate(mags):
            t = m.shape[-1]
            if split:
                h = t // 2
                masks.append(jnp.stack([
                    jnp.concatenate([jnp.ones(t, m.dtype),
                                     jnp.zeros(t_max - t, m.dtype)]),
                    jnp.concatenate([jnp.ones(h, m.dtype),
                                     jnp.zeros(t_max - h, m.dtype)]),
                    jnp.concatenate([jnp.zeros(h, m.dtype),
                                     jnp.ones(t - h, m.dtype),
                                     jnp.zeros(t_max - t, m.dtype)]),
                ]))
            else:
                masks.append(
                    jnp.concatenate(
                        [jnp.ones(t, m.dtype), jnp.zeros(t_max - t, m.dtype)]
                    )
                )
            if t < t_max:
                mags[i] = jnp.pad(m, ((0, 0), (0, t_max - t)))
        mag_b = jnp.stack(mags)      # (H, F, T_max)
        mask_b = jnp.stack(masks)    # (H, T_max) or (H, 3, T_max)
        fwd = lambda m, k: detector_apply_masked(  # noqa: E731
            params, m, k, net_cfg, cfg.matmul_precision
        )
        if split:
            return jax.vmap(
                lambda m, ks: jax.vmap(fwd, in_axes=(None, 0))(m, ks)
            )(mag_b, mask_b)
        return jax.vmap(fwd)(mag_b, mask_b)

    return run


def robust_values(
    detector: AWAREDetector,
    audio: np.ndarray,
    rates: tuple[float, ...] = DEFAULT_RATES,
    stretch_rates: tuple[float, ...] = (),
) -> np.ndarray:
    """(H, bits) raw detector values for every compensation hypothesis
    (resample lanes first, then stretch lanes), computed in one dispatch."""
    hyps = tuple(("resample", r) for r in rates) + tuple(
        ("stretch", r) for r in stretch_rates
    )
    run = _grid_fn(hyps, detector.cfg)
    return np.asarray(run(detector.params, jnp.asarray(audio, jnp.float32)))


def robust_values_split(
    detector: AWAREDetector,
    audio: np.ndarray,
    rates: tuple[float, ...] = DEFAULT_RATES,
    stretch_rates: tuple[float, ...] = (),
) -> np.ndarray:
    """(H, 3, bits) raw detector values per hypothesis: full clip plus the
    two half-clip readouts (one dispatch), for coherence-based scoring."""
    hyps = tuple(("resample", r) for r in rates) + tuple(
        ("stretch", r) for r in stretch_rates
    )
    run = _grid_fn(hyps, detector.cfg, split=True)
    return np.asarray(run(detector.params, jnp.asarray(audio, jnp.float32)))


def _search(detector, audio, hyps: tuple[Hypothesis, ...],
            identity_margin: float = 1.0):
    """One fused dispatch over ``hyps``; returns (kind, rate, conf, values)
    of the most confident hypothesis.

    ``identity_margin > 1`` keeps the identity lane unless a non-identity
    lane beats it by that factor.  Calibration (ROBUST_LANE_DIAG.json,
    round 5): under GENUINE playback-rate desync the correct lane beats
    identity by >=2.3x with 0-5% BER (identity: 45-55%), while on weak
    (one-shot) marks — desynced or not — spurious lanes never exceed
    ~1.6x and picking them always RAISES BER (no selection statistic
    tested, incl. split-half coherence, finds the oracle-best lane for
    weak marks).  A margin between those bands makes the search
    never-worse than plain detection on every measured row while keeping
    the full desync recovery."""
    run = _grid_fn(hyps, detector.cfg)
    values = np.asarray(run(detector.params, jnp.asarray(audio, jnp.float32)))
    conf = np.mean(np.abs(values), axis=1)
    best = int(np.argmax(conf))
    if identity_margin > 1.0 and ("resample", 1.0) in hyps:
        ident = hyps.index(("resample", 1.0))
        if conf[best] < identity_margin * conf[ident]:
            best = ident
    kind, rate = hyps[best]
    return kind, rate, float(conf[best]), values[best]


def detect_watermark_robust(
    audio: np.ndarray,
    sample_rate: int,
    detector: AWAREDetector,
    rates: tuple[float, ...] = DEFAULT_RATES,
    stretch_rates: tuple[float, ...] = DEFAULT_STRETCH_RATES,
    return_confidence: bool = False,
    refine: bool = True,
    identity_margin: float = 1.9,
):
    """Detect under unknown time-scaling; returns decoded bits, or a
    :class:`RobustDetection` ``(bits, kind, rate, confidence)`` when
    ``return_confidence`` is set — the hypothesis family is named
    explicitly, never encoded in the sign of the rate.

    A speed-changed clip is compensated by resampling; a vocoder-stretched
    clip by re-stretching (pitch-preserving).  The winner is the most
    confident readout — the tanh head saturates toward +-1 when the time
    base (and, for resample lanes, the frequency axis) matches.

    Two-stage search: the coarse grid's 3-4% spacing can leave ~1-2%
    residual desync (~1 frame of drift per second), costing a bit or two;
    with ``refine`` a second fused dispatch scans +-1.5% around the coarse
    winner *within its own family* in 0.5% steps and keeps the best of
    both stages.  Fine grids are jit-cached per coarse winner, so
    steady-state streams pay one compile.

    ``identity_margin``: require a non-identity lane to beat the identity
    lane's confidence by this factor before it wins (see ``_search``).
    1.0 (default) is the pure argmax; ~1.25 is recommended when the marks
    may be weak (the amortized one-shot path).
    """
    audio = np.asarray(audio, dtype=np.float32)
    if audio.ndim == 2:
        audio = audio.mean(axis=1)
    if sample_rate != detector.cfg.detection_net.sample_rate:
        raise ValueError(
            f"Robust detector operates at "
            f"{detector.cfg.detection_net.sample_rate} Hz"
        )
    hyps = tuple(("resample", r) for r in tuple(rates)) + tuple(
        ("stretch", r) for r in tuple(stretch_rates)
    )
    kind, best_rate, best_conf, best_values = _search(
        detector, audio, hyps, identity_margin
    )

    if refine and best_rate != 1.0:
        fine = tuple(
            (kind, round(best_rate * f, 4))
            for f in (0.985, 0.99, 0.995, 1.005, 1.01, 1.015)
        )
        fkind, frate, fconf, fvalues = _search(detector, audio, fine)
        if fconf > best_conf:
            kind, best_rate, best_conf, best_values = fkind, frate, fconf, fvalues

    bits = decode_pattern(
        best_values, detector.pattern_mode, detector.threshold
    )
    if return_confidence:
        return RobustDetection(bits, kind, float(best_rate), float(best_conf))
    return bits
