"""Speed-change-robust detection (rate-search) tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from aware_tpu import embed_watermark, load
from aware_tpu.models import detect_values
from aware_tpu.ops.resample import resample_poly
from aware_tpu.service import detect_watermark_robust

BITS = np.array([1, 0, 1, 1, 0, 0, 1, 0, 1, 1, 0, 1, 0, 0, 1, 1, 1, 0, 0, 1])

# reduced search grid (the full 20-rate DEFAULT_RATES grid costs a jit
# compile per rate on CPU; coverage of the grid itself is the slow-marked
# clean-clip test's job)
GRID = (0.9, 0.95, 1.0, 1.05, 1.11)


@pytest.fixture(scope="module")
def watermarked(speechlike):
    embedder, detector = load()
    wm = embed_watermark(speechlike, 16000, BITS, embedder)
    return wm, detector


@pytest.mark.slow
@pytest.mark.parametrize("num,den", [(21, 20), (9, 10), (11, 10)])
def test_recovers_bits_after_speed_change(watermarked, num, den):
    wm, detector = watermarked
    sped = np.asarray(resample_poly(jnp.asarray(wm), num, den))

    naive = np.asarray(detect_values(detector.params, jnp.asarray(sped)))
    naive_ber = float(np.mean((naive > 0).astype(int) != BITS)) * 100

    bits, best_rate, conf = detect_watermark_robust(
        sped, 16000, detector, rates=GRID, return_confidence=True
    )
    ber = float(np.mean(bits != BITS)) * 100
    assert ber == 0.0, f"robust BER {ber}% (picked {best_rate})"
    assert naive_ber > 20.0  # the attack really was destructive naively
    # winning rate compensates the speed change (inverse of num/den)
    assert abs(best_rate - den / num) < 0.06


@pytest.mark.slow
def test_clean_clip_picks_unity(watermarked):
    wm, detector = watermarked
    bits, best_rate, _ = detect_watermark_robust(
        wm, 16000, detector, rates=GRID, return_confidence=True
    )
    assert float(np.mean(bits != BITS)) == 0.0
    assert abs(best_rate - 1.0) < 0.04
