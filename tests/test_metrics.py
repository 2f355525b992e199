"""Metric behavior tests.

BER/SNR are validated exactly against the reference formulas; STOI and the
PESQ proxy (whose oracle packages are not installed) are validated on
behavioral properties: perfect score on identity, monotone degradation with
noise, sane ranges, stereo/truncation handling.
"""

import numpy as np
import pytest

from aware_tpu.metrics import BER, PESQ, SNR, STOI, ber, pesq_proxy, snr, stoi


def test_ber_is_percentage():
    out = np.array([1, 0, 1, 1])
    tgt = np.array([1, 1, 1, 0])
    assert ber(out, tgt) == 50.0
    assert BER()(out, tgt) == 50.0


def test_snr_reference_form(rng):
    tgt = rng.standard_normal(1000).astype(np.float32)
    out = tgt + 0.1 * rng.standard_normal(1000).astype(np.float32)
    expected = 10 * np.log10(np.mean(out**2) / np.mean((out - tgt) ** 2))
    assert abs(snr(out, tgt) - expected) < 1e-5


def test_snr_identical_inf(rng):
    x = rng.standard_normal(100).astype(np.float32)
    assert snr(x, x) == float("inf")


def test_snr_stereo_downmix(rng):
    tgt = rng.standard_normal((1000, 2)).astype(np.float32)
    out = tgt + 0.01
    v = snr(out, tgt)
    m_out, m_tgt = out.mean(axis=1), tgt.mean(axis=1)
    expected = 10 * np.log10(np.mean(m_out**2) / np.mean((m_out - m_tgt) ** 2))
    assert abs(v - expected) < 1e-4


def test_snr_truncates_to_common_length(rng):
    tgt = rng.standard_normal(1000).astype(np.float32)
    assert np.isfinite(snr(tgt[:900] + 0.1, tgt))


def test_stoi_identity_and_monotone(speechlike, rng):
    clean = stoi(speechlike, speechlike, 16000)
    assert clean > 0.98
    noisy1 = speechlike + 0.05 * rng.standard_normal(len(speechlike)).astype(np.float32)
    noisy2 = speechlike + 0.4 * rng.standard_normal(len(speechlike)).astype(np.float32)
    s1, s2 = stoi(noisy1, speechlike, 16000), stoi(noisy2, speechlike, 16000)
    assert clean > s1 > s2
    assert 0.0 < s2 < 1.0
    assert STOI()(noisy1, speechlike, 16000) == pytest.approx(s1)


def test_pesq_proxy_identity_and_monotone(speechlike, rng):
    clean = pesq_proxy(speechlike, speechlike, 16000)
    assert clean > 4.3
    noisy1 = speechlike + 0.03 * rng.standard_normal(len(speechlike)).astype(np.float32)
    noisy2 = speechlike + 0.3 * rng.standard_normal(len(speechlike)).astype(np.float32)
    p1 = pesq_proxy(noisy1, speechlike, 16000)
    p2 = pesq_proxy(noisy2, speechlike, 16000)
    assert clean > p1 > p2
    assert 1.0 <= p2 <= 4.64
    # the PESQ class reports the exact P.862.2 pipeline, not the proxy
    from aware_tpu.metrics import pesq

    assert PESQ()(noisy1, speechlike, 16000) == pytest.approx(
        pesq(noisy1, speechlike, 16000)
    )


def test_pesq_proxy_44k_input(speechlike):
    import jax.numpy as jnp
    from aware_tpu.ops.resample import resample

    x44 = np.asarray(resample(jnp.asarray(speechlike), 16000, 44100))
    v = pesq_proxy(x44, x44, 44100)
    assert v > 4.3


# ----------------------------------------------------------- exact STOI ---

def test_stoi_exact_identity_is_one(speechlike):
    from aware_tpu.metrics import stoi_exact

    assert stoi_exact(speechlike, speechlike, 16000) == pytest.approx(1.0, abs=1e-9)


def test_stoi_exact_agrees_with_device_proxy(speechlike, rng):
    """The device-side STOI was written from the same published algorithm;
    its mask-weighted formulation should track the exact implementation
    closely on additive noise (observed <2e-3 across a 40 dB sweep)."""
    from aware_tpu.metrics import stoi_exact
    from aware_tpu.metrics.audio import stoi_device

    for scale in (0.02, 0.1, 0.5):
        y = speechlike + scale * rng.standard_normal(len(speechlike)).astype(
            np.float32
        )
        e = stoi_exact(speechlike, y, 16000)
        d = stoi_device(y, speechlike, 16000)
        assert abs(e - d) < 5e-3, (scale, e, d)


def test_stoi_exact_third_octave_bank():
    """Structural facts of the 1/3-octave matrix at 10 kHz/512: 15 bands,
    all non-empty, contiguous, non-overlapping-ish rising edges, center
    frequencies 150*2^(k/3)."""
    from aware_tpu.metrics.stoi_exact import thirdoct

    obm, cf = thirdoct()
    assert obm.shape == (15, 257)
    np.testing.assert_allclose(cf, 150.0 * 2.0 ** (np.arange(15) / 3.0))
    starts = []
    for row in obm:
        idx = np.flatnonzero(row)
        assert idx.size > 0                      # no empty bands
        assert np.array_equal(idx, np.arange(idx[0], idx[-1] + 1))
        starts.append(idx[0])
    assert all(b > a for a, b in zip(starts, starts[1:]))  # ordered bands


def test_stoi_exact_silent_frame_removal():
    """Appending silence to both signals must not change the score (the
    40 dB gate drops those frames)."""
    from aware_tpu.metrics import stoi_exact
    from aware_tpu.eval.harness import synthesize_speech_clip

    x = synthesize_speech_clip(5, seconds=3.0)
    rng = np.random.default_rng(2)
    y = x + 0.1 * rng.standard_normal(len(x)).astype(np.float32)
    base = stoi_exact(x, y, 16000)
    pad = np.zeros(8000, np.float32)
    padded = stoi_exact(np.concatenate([x, pad]), np.concatenate([y, pad]), 16000)
    assert abs(base - padded) < 2e-3


def test_stoi_exact_octave_resampler():
    """The octave resampler preserves a mid-band tone's amplitude and
    changes length by exactly p/q (ceil)."""
    from aware_tpu.metrics.stoi_exact import resample_oct

    t = np.arange(16000) / 16000.0
    x = np.sin(2 * np.pi * 440.0 * t)
    y = resample_oct(x, 5, 8)  # 16 k -> 10 k
    assert len(y) == int(np.ceil(len(x) * 5 / 8))
    assert abs(np.sqrt(np.mean(y[500:-500] ** 2)) - np.sqrt(0.5)) < 1e-3


def test_stoi_exact_short_clip_raises():
    from aware_tpu.metrics import stoi_exact

    x = np.random.default_rng(0).standard_normal(2000).astype(np.float32)
    with pytest.raises(ValueError):
        stoi_exact(x, x, 16000)
