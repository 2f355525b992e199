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
    assert PESQ()(noisy1, speechlike, 16000) == pytest.approx(p1)


def test_pesq_proxy_44k_input(speechlike):
    import jax.numpy as jnp
    from aware_tpu.ops.resample import resample

    x44 = np.asarray(resample(jnp.asarray(speechlike), 16000, 44100))
    v = pesq_proxy(x44, x44, 44100)
    assert v > 4.3
