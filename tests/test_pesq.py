"""Wideband PESQ (P.862.2 pipeline) validation.

No ITU tool or conformance vectors exist in this image, so validation is
by the metric's defining *properties* (each of which the real P.862.2 is
documented/known to satisfy) plus fixed behavioral anchors:

* identity scores the P.862.2 maximum 4.6437 (raw 4.5 mapped);
* the raw->MOS-LQO logistic map is the exact published P.862.2 function;
* global level changes of the degraded signal are compensated away;
* small constant delays are absorbed by time alignment;
* monotone in additive noise and in PCM word length;
* linear filtering is (by design) largely compensated;
* the device proxy tracks it after calibration (PROXY_CALIBRATION.json).
"""

import numpy as np
import pytest

from aware_tpu.metrics import pesq, pesq_proxy, pesq_wb
from aware_tpu.metrics.pesq_p862 import _mos_lqo_wb


@pytest.fixture(scope="module")
def speech():
    """Speech-like fixture with real pauses (noise-in-silence sensitivity)."""
    sr = 16000
    rng = np.random.default_rng(0)
    t = np.arange(3 * sr) / sr
    f0 = 120 + 40 * np.sin(2 * np.pi * 1.7 * t)
    ph = np.cumsum(2 * np.pi * f0 / sr)
    x = sum(np.cos(k * ph + rng.random() * 6) / k for k in range(1, 30))
    env = np.clip(np.sin(2 * np.pi * 1.9 * t), 0, None) ** 0.5
    x = x * env
    return (x / np.abs(x).max()).astype(np.float32)


def test_identity_scores_p862_2_maximum(speech):
    assert pesq_wb(speech, speech) == pytest.approx(4.6437, abs=2e-3)


def test_mos_lqo_map_is_exact():
    # published P.862.2 mapping: 0.999 + 4 / (1 + exp(-1.3669 x + 3.8224))
    assert _mos_lqo_wb(4.5) == pytest.approx(4.64389, abs=1e-4)
    assert _mos_lqo_wb(0.0) == pytest.approx(
        0.999 + 4.0 / (1.0 + np.exp(3.8224)), abs=1e-9
    )
    assert _mos_lqo_wb(-0.5) < _mos_lqo_wb(2.0) < _mos_lqo_wb(4.5)


def test_level_invariance(speech):
    base = pesq_wb(speech, speech)
    assert pesq_wb(speech, speech * 3.1623) == pytest.approx(base, abs=0.01)
    assert pesq_wb(speech, speech * 0.3162) == pytest.approx(base, abs=0.01)


def test_small_delay_absorbed(speech):
    base = pesq_wb(speech, speech)
    shifted = np.roll(speech, 64)
    assert pesq_wb(speech, shifted) > base - 0.15


def test_monotone_in_noise(speech):
    rng = np.random.default_rng(3)
    scores = []
    for snr_db in (40.0, 25.0, 10.0):
        n = rng.standard_normal(len(speech))
        n *= np.sqrt(np.mean(speech**2) / 10 ** (snr_db / 10)) / np.std(n)
        scores.append(pesq_wb(speech, speech + n))
    assert scores[0] > scores[1] > scores[2]
    assert scores[2] < 2.0  # heavy noise is down near the bottom


def test_monotone_in_pcm_depth(speech):
    scores = []
    for bits in (16, 12, 8):
        s = 2.0 ** (bits - 1) - 1
        scores.append(pesq_wb(speech, np.round(speech * s) / s))
    assert scores[0] > scores[1] > scores[2]
    assert scores[0] > 4.3   # 16-bit requantization is near-transparent
    assert 2.5 < scores[2] < 4.0  # 8-bit audibly degraded, not destroyed


def test_short_input_raises():
    x = np.zeros(4000, np.float32)
    with pytest.raises(ValueError):
        pesq_wb(x, x)


def test_wrapper_and_class_and_resample(speech):
    from aware_tpu.metrics import PESQ

    v = pesq(speech, speech, 16000)
    assert v == pytest.approx(4.6437, abs=2e-3)
    assert PESQ()(speech, speech, 16000) == pytest.approx(v)
    # 44.1 kHz input goes through the resample path
    from aware_tpu.ops.resample import resample
    import jax.numpy as jnp

    x44 = np.asarray(resample(jnp.asarray(speech), 16000, 44100))
    assert pesq(x44, x44, 44100) > 4.5


def test_proxy_tracks_exact_after_calibration(speech):
    """Freshly-generated degradations (not the calibration corpus): the
    proxy should stay within ~0.35 MOS of the exact metric and preserve
    ordering."""
    rng = np.random.default_rng(9)
    pairs = []
    for snr_db in (30.0, 15.0):
        n = rng.standard_normal(len(speech))
        n *= np.sqrt(np.mean(speech**2) / 10 ** (snr_db / 10)) / np.std(n)
        pairs.append(speech + n)
    pairs.append(np.round(speech * 511) / 511)  # 10-bit
    exact = np.array([pesq_wb(speech, d) for d in pairs])
    prox = np.array([pesq_proxy(d, speech, 16000) for d in pairs])
    assert np.mean(np.abs(exact - prox)) < 0.35
    assert list(np.argsort(exact)) == list(np.argsort(prox))
