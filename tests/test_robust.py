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

    res = detect_watermark_robust(
        sped, 16000, detector, rates=GRID, stretch_rates=(),
        return_confidence=True,
    )
    ber = float(np.mean(res.bits != BITS)) * 100
    assert ber == 0.0, f"robust BER {ber}% (picked {res.rate})"
    assert naive_ber > 20.0  # the attack really was destructive naively
    # winning rate compensates the speed change (inverse of num/den)
    assert res.kind == "resample"
    assert abs(res.rate - den / num) < 0.06


@pytest.mark.slow
def test_clean_clip_picks_unity(watermarked):
    wm, detector = watermarked
    res = detect_watermark_robust(
        wm, 16000, detector, rates=GRID, stretch_rates=(),
        return_confidence=True,
    )
    assert float(np.mean(res.bits != BITS)) == 0.0
    assert abs(res.rate - 1.0) < 0.04


@pytest.mark.slow
def test_clean_clip_wins_identity_with_stretch_lanes(watermarked):
    """With the default stretch lanes IN the grid (the shipped
    configuration), a clean clip still decodes at 0 BER and the winner is
    the identity resample lane — enabling the search never costs accuracy
    on undesynced audio."""
    from aware_tpu.service.robust import DEFAULT_STRETCH_RATES

    wm, detector = watermarked
    res = detect_watermark_robust(
        wm, 16000, detector, rates=GRID,
        stretch_rates=DEFAULT_STRETCH_RATES,
        return_confidence=True,
    )
    assert float(np.mean(res.bits != BITS)) == 0.0
    assert res.kind == "resample"
    assert abs(res.rate - 1.0) < 0.04


def test_masked_forward_equals_unpadded():
    """detector_apply_masked on zero-padded input == detector_apply on the
    unpadded input (the exactness fact the fused rate grid rests on)."""
    from aware_tpu.config import AwareConfig, in_band_bins
    from aware_tpu.models.detector import (
        detector_apply,
        detector_apply_masked,
        init_params,
        preprocess_magnitude,
    )
    from aware_tpu.ops.windows import get_window

    cfg = AwareConfig()
    net = cfg.detection_net
    params = init_params(net)
    w = get_window(cfg.window, cfg.win_length)
    lo, hi = in_band_bins(net.sample_rate, net.n_fft, cfg.embedding_bands)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(16000).astype(np.float32)
    mag = preprocess_magnitude(jnp.asarray(x), net.n_fft, cfg.hop_length, w, lo, hi)
    t = mag.shape[-1]
    for pad in (0, 1, 7, 40):
        mp = jnp.pad(mag, ((0, 0), (0, pad)))
        mask = jnp.concatenate([jnp.ones(t), jnp.zeros(pad)])
        got = detector_apply_masked(params, mp, mask, net, "highest")
        want = detector_apply(params, mag, net, "highest")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4,
            err_msg=f"pad={pad}",
        )


def test_grid_is_one_dispatch(watermarked):
    """The whole rate grid compiles to a single jitted call returning
    (R, bits) values."""
    from aware_tpu.service.robust import robust_values

    wm, detector = watermarked
    vals = robust_values(detector, wm, rates=GRID)
    assert vals.shape == (len(GRID), 20)
    # unity lane decodes the embedded bits
    i = GRID.index(1.0)
    assert float(np.mean((vals[i] > 0).astype(int) != BITS)) == 0.0


def test_stretch_lanes_shape_and_identity(watermarked):
    """Stretch-compensation lanes stack after resample lanes; the unity
    resample lane still equals the plain detect values."""
    from aware_tpu.models.detector import detect_values as dv
    from aware_tpu.service.robust import robust_values

    wm, detector = watermarked
    rates = (1.0,)
    stretch = (0.93, 1.08)
    vals = robust_values(detector, wm, rates=rates, stretch_rates=stretch)
    assert vals.shape == (len(rates) + len(stretch), 20)
    plain = np.asarray(
        dv(detector.params, jnp.asarray(wm, jnp.float32))
    )
    np.testing.assert_allclose(vals[0], plain, atol=2e-5, rtol=1e-4)
    # stretch lanes are real hypotheses (not copies of the identity lane)
    assert not np.allclose(vals[1], vals[0])


@pytest.mark.slow
@pytest.mark.parametrize("num,den", [(9, 10)])
def test_identity_margin_never_blocks_real_recovery(watermarked, num, den):
    """A genuinely desynced strong mark collapses the identity lane's
    confidence to near-null, so the identity-preference margin (weak-mark
    safety for the one-shot path) must not stop the right lane winning."""
    wm, detector = watermarked
    sped = np.asarray(resample_poly(jnp.asarray(wm), num, den))
    res = detect_watermark_robust(
        sped, 16000, detector, rates=GRID, stretch_rates=(),
        return_confidence=True, identity_margin=1.9,  # the default
    )
    assert float(np.mean(res.bits != BITS)) == 0.0
    assert abs(res.rate - den / num) < 0.06


@pytest.mark.slow
def test_split_values_full_lane_matches_unsplit(watermarked):
    """robust_values_split's lane-0 (full-mask) readout equals the plain
    robust_values readout, and the two half readouts are genuinely
    different detections (different frame masks)."""
    from aware_tpu.service.robust import robust_values, robust_values_split

    wm, detector = watermarked
    full = robust_values(detector, wm, rates=GRID)
    sv = robust_values_split(detector, wm, rates=GRID)
    assert sv.shape == (len(GRID), 3, full.shape[-1])
    np.testing.assert_allclose(sv[:, 0], full, rtol=1e-5, atol=1e-6)
    assert not np.allclose(sv[:, 1], sv[:, 2])


@pytest.mark.slow
def test_identity_margin_forces_identity_when_huge(watermarked):
    """identity_margin -> inf degenerates to the plain single-lane
    detection (the identity lane always wins)."""
    wm, detector = watermarked
    res = detect_watermark_robust(
        wm, 16000, detector, rates=GRID, stretch_rates=(),
        return_confidence=True, identity_margin=1e9,
    )
    assert res.kind == "resample" and res.rate == 1.0
    plain = np.asarray(detect_values(detector.params, jnp.asarray(wm)))
    assert np.array_equal(np.asarray(res.bits), (plain > 0).astype(res.bits.dtype))
