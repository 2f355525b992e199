"""Real libsoxr resampler attack (beyond-reference capability).

The reference's Resample attack round-trips scipy resample_poly
(reference: scripts/attacks.py:256-294); this row round-trips the
independently-engineered SoX resampler bound from the image's
libsoxr.so.0.  Skipped when the library is missing.
"""

import numpy as np
import pytest

from aware_tpu.attacks import soxr_real

SR = 16000

needs_soxr = pytest.mark.skipif(
    not soxr_real.soxr_available(), reason="no libsoxr"
)


@pytest.fixture(scope="module")
def tone():
    t = np.arange(2 * SR) / SR
    x = 0.5 * np.sin(2 * np.pi * 1000 * t) + 0.2 * np.sin(2 * np.pi * 3000 * t)
    return x.astype(np.float32)


@needs_soxr
def test_roundtrip_contract(tone):
    z = soxr_real.soxr_roundtrip(tone, SR, 44100)
    assert z.shape == tone.shape and z.dtype == np.float32
    # SOXR_HQ through 44.1k is near-transparent away from the edges
    err = np.abs(z[1000:-1000] - tone[1000:-1000]).max()
    assert err < 1e-3, err


@needs_soxr
def test_8k_keeps_inband_kills_above_nyquist(tone):
    t = np.arange(2 * SR) / SR
    hi = (0.5 * np.sin(2 * np.pi * 6000 * t)).astype(np.float32)
    z_in = soxr_real.soxr_roundtrip(tone, SR, 8000)
    z_hi = soxr_real.soxr_roundtrip(hi, SR, 8000)
    rms = lambda a: float(np.sqrt(np.mean(a[1000:-1000] ** 2)))
    assert rms(z_in) > 0.8 * rms(tone)  # 1k/3k tones survive
    assert rms(z_hi) < 0.05 * rms(hi)  # 6k tone is gone


@needs_soxr
def test_attack_class_and_suite_row(tone):
    atk = soxr_real.SoxrResample(44100)
    assert atk.name == "soxr_44100"
    z = atk.apply(tone, SR)
    assert z.shape == tone.shape
    from aware_tpu.attacks.voice_codecs import extended_attack_suite

    names = [a.name for a in extended_attack_suite()]
    assert "soxr_44100" in names and "soxr_8000" in names


@needs_soxr
def test_watermark_survives_soxr(speechlike):
    """End-to-end: solver embed (short budget) -> soxr 44.1k roundtrip ->
    detect; the near-transparent real resampler must not flip bits."""
    from aware_tpu.service import detect_watermark, embed_watermark, load

    embedder, detector = load(num_iterations=60)
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, 20).tolist()
    marked = embed_watermark(speechlike, SR, bits, embedder)
    attacked = soxr_real.soxr_roundtrip(marked, SR, 44100)
    got = detect_watermark(attacked, SR, detector)
    ber = np.mean(np.array(got) != np.array(bits)) * 100
    assert ber <= 10.0, ber
