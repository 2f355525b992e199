"""Fast embedding modes: one-shot amortized and warm-started solver.

New capabilities beyond the reference (which only has the 400-iteration
per-clip optimization):

* ``embed_watermark_oneshot`` — a single forward pass of a bundled
  adversarially-trained amortized embedder (tools/train_amortized.py).
  Measured at ~1726 clips/s on one v5e chip (vs 27 clips/s for the full
  solver).  Two bundles (``variant=``), AMORTIZED_EVAL.json evidence:
  "default" reaches 0.83% clean BER at ~17.5 dB SNR on material matching
  its training family but 39% off-distribution; "diverse" trades that
  specialization for uniformity (7.5% in-family / 15.8% off).  Use when
  throughput matters more than the last few bits, or as a screening pass.
* ``embed_watermark_turbo`` — the exact solver warm-started from the
  amortized prediction with a reduced iteration budget.  Same contract and
  output semantics as ``embed_watermark``.

  Honest value statement (AMORTIZED_EVAL.json iso-iteration grid): the
  warm start adds no clean-BER benefit beyond sampling noise over a cold
  solver at the same iteration count (largest observed gain: one bit of
  120 at the 5-iteration point on one family; the cold solver reads
  0-0.8% by 5 iterations everywhere) — the turbo speedup comes entirely
  from the reduced iteration count (see cards/turbo.yaml, which therefore
  cold-starts).  The warm start is kept for its unmeasured-tail value
  (it starts inside the detector's high-confidence basin) and as the
  integration point for future amortized bundles.
"""

from __future__ import annotations

import functools
import pathlib

import jax.numpy as jnp
import numpy as np

from aware_tpu.config import in_band_bins
from aware_tpu.embed.solver import embed_core
from aware_tpu.ops.stft import magphase, peak_normalize, stft
from aware_tpu.ops.windows import get_window
from aware_tpu.service.api import AWAREEmbedder, _validate_pattern
from aware_tpu.service.codec import encode_pattern

_KEY_DIR = pathlib.Path(__file__).parent.parent / "models" / "_key"
_AMORTIZED_PATH = _KEY_DIR / "amortized_v1.npz"

# Two trained bundles with a measured specialization trade-off:
#   "default": adversarial-only training on one speech family — ~1% BER on
#              matching material, degrades off-distribution;
#   "diverse": fine-tuned on four mixed clip families — more uniform
#              (4-18% across families) at some cost on the original family;
#   "diverse_tol2": the round-4 gate bundle — the diverse MLP chain
#              continued with training AT the tol-2 box (warm-started
#              from lp005b): 2.92% held-out diverse / 2.92% speech
#              one-shot at 9.7/12.7 dB SNR (seg4) — under the <8% gate
#              (AMORTIZED_CHAIN_STATUS.json is the ledger).
#              A non-None tolerance entry is the bundle's trained/rated
#              box width, applied automatically unless the caller
#              overrides tolerance_db (the tanh output scale is matched
#              to the box, so running such a bundle at the card's
#              default 6 dB box understates both its energy and its
#              accuracy — AMORTIZED_TOLERANCE_SWEEP.json).
_VARIANTS: dict[str, tuple[pathlib.Path, float | None]] = {
    # "default" ships the one-shot chain's best bundle (seg4 — VERDICT r4
    # item 6: 2.92% held-out one-shot BER on BOTH families at its trained
    # tol-2 box; AMORTIZED_CHAIN_STATUS.json is the ledger).  The original
    # speech-family-only bundle remains available as "speech_v1" (0.83%
    # in-family at 17.5 dB but 39% off-distribution).
    "default": (_KEY_DIR / "amortized_v2_diverse_tol2_seg4.npz", 2.0),
    "speech_v1": (_AMORTIZED_PATH, None),
    "diverse": (_KEY_DIR / "amortized_v1_diverse.npz", None),
    "diverse_tol2": (_KEY_DIR / "amortized_v2_diverse_tol2_seg4.npz", 2.0),
    # seg4 fine-tuned 2k steps with the solver's EOT views in the
    # adversarial objective (vocoder-stretch + mp3-approx + celp) — the
    # desync-row medicine (VERDICT r4 item 3).  MEASURED NEGATIVE, kept
    # only for reproducibility: desync rows unmoved and clean regressed
    # 2.92 -> 4.17 (ONESHOT_ROBUSTNESS_EOT.json vs ONESHOT_ROBUSTNESS
    # .json; ledger AMORTIZED_TRAIN_..._seg5eot.json — training loss flat
    # for all 2000 steps).  The chain is frozen at seg4; see
    # AMORTIZED_CHAIN_STATUS.json round5.eot_segment_result.
    "diverse_tol2_eot": (_KEY_DIR / "amortized_v2_diverse_tol2_seg5eot.npz",
                         2.0),
    # NOTE: there is deliberately no solver-distilled bundle.  Two
    # attempts (magnitude-only round 1; phase-conditioned with a
    # detector-visible post-roundtrip loss, round 2) both memorize the
    # training corpus yet stay at chance on held-out clips
    # (DISTILL_EVAL.json) — the solver's per-clip optimum appears
    # chaotic/clip-specific, so one-shot quality comes from adversarial
    # training only (the bundles above).
}


@functools.lru_cache(maxsize=4)
def _load_amortized(variant: str = "default") -> dict[str, jnp.ndarray]:
    path, _ = _VARIANTS.get(variant, (None, None))
    if path is None or not path.exists():
        raise FileNotFoundError(
            f"amortized bundle {variant!r} missing — train it with "
            "tools/train_amortized.py"
        )
    with np.load(path) as z:
        return {k: jnp.asarray(z[k]) for k in z.files}


def _amortized_band(model: AWAREEmbedder, audio: np.ndarray, pattern: np.ndarray,
                    variant: str = "default",
                    tolerance_db: float | None = None):
    from aware_tpu.train.adversarial import embedder_apply

    cfg = model.cfg
    window = get_window(cfg.window, cfg.win_length)
    lo, hi = in_band_bins(
        cfg.detection_net.sample_rate, cfg.frame_length, cfg.embedding_bands
    )
    mag, phase = magphase(
        stft(peak_normalize(jnp.asarray(audio, jnp.float32)),
             cfg.frame_length, cfg.hop_length, window)
    )
    # resolution order: explicit override > the variant's trained box
    # width (see _VARIANTS) > the card's tolerance_db
    if tolerance_db is None:
        tolerance_db = _VARIANTS.get(variant, (None, None))[1]
    tol = cfg.tolerance_db if tolerance_db is None else float(tolerance_db)
    band = embedder_apply(
        _load_amortized(variant), mag[lo:hi], jnp.asarray(pattern, jnp.float32),
        tol, band_phase=phase[lo:hi],
    )
    return band, mag, phase, lo, hi, window


def embed_watermark_oneshot(
    audio: np.ndarray,
    sample_rate: int,
    watermark_bits,
    model: AWAREEmbedder,
    variant: str = "default",
    tolerance_db: float | None = None,
) -> np.ndarray:
    """One-forward-pass embed (amortized network; no optimization loop).

    ``tolerance_db`` overrides the per-coefficient box for THIS one-shot
    embed only (the bundle's tanh output scales with the box, so a
    smaller dB value spends more perturbation energy for lower BER —
    measured accuracy/SNR curve in AMORTIZED_TOLERANCE_SWEEP.json; at
    2-3 dB the one-shot SNR matches the full solver's ~10 dB mean).
    None keeps the card's budget.
    """
    from aware_tpu.ops.stft import istft, polar

    pattern = _validate_pattern(
        encode_pattern(watermark_bits, model.pattern_mode), model
    )
    cfg = model.cfg
    if sample_rate != cfg.detection_net.sample_rate:
        raise ValueError("one-shot embed operates at the model rate (16 kHz)")
    mono = np.asarray(audio, np.float32)
    mx = np.max(mono)
    band, mag, phase, lo, hi, window = _amortized_band(
        model, mono, pattern, variant, tolerance_db
    )
    wmag = jnp.concatenate([mag[:lo], band, mag[hi:]], axis=0)
    out = peak_normalize(
        istft(polar(wmag, phase), cfg.frame_length, cfg.hop_length, window)
    )
    return np.asarray(out) * mx


def embed_watermark_turbo(
    audio: np.ndarray,
    sample_rate: int,
    watermark_bits,
    model: AWAREEmbedder,
    num_iterations: int = 100,
    variant: str = "default",
) -> np.ndarray:
    """Solver embed warm-started from the amortized prediction with a
    reduced iteration budget (service contract preserved)."""
    pattern = _validate_pattern(
        encode_pattern(watermark_bits, model.pattern_mode), model
    )
    cfg = model.cfg
    if sample_rate != cfg.detection_net.sample_rate:
        raise ValueError("turbo embed operates at the model rate (16 kHz)")
    mono = np.asarray(audio, np.float32)
    mx = np.max(mono)
    band, *_ = _amortized_band(model, mono, pattern, variant)
    res = embed_core(
        model.params,
        jnp.asarray(mono),
        jnp.asarray(pattern, jnp.float32),
        cfg.replace(num_iterations=num_iterations),
        init_coeffs=band,
    )
    return np.asarray(res.audio) * mx
