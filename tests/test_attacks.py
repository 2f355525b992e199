"""Attack-suite behavior tests.

Each attack is checked for its contract (shape, determinism-under-key,
degradation character) and, where a scipy/numpy oracle exists, for parity.
"""

import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from aware_tpu.attacks import (
    Cropout,
    DeleteSamples,
    GaussianNoise,
    HighPassFilter,
    LowPassFilter,
    MP3Compression,
    PCMBitDepthConversion,
    PitchShift,
    RandomBandstop,
    Resample,
    SampleSupression,
    TimeStretch,
    default_attack_suite,
    mp3_approx,
    time_stretch,
)
from aware_tpu.metrics import snr


def test_pcm_matches_numpy_reference(rng):
    x = (rng.standard_normal(4000) * 0.5).astype(np.float32)
    for pcm, scale, lo, hi, dtype in [
        (8, 127.0, -128, 127, np.int8),
        (16, 32767.0, -32768, 32767, np.int16),
    ]:
        ref_n = x / np.max(np.abs(x) + 1e-8)
        ref = np.clip(ref_n * scale, lo, hi).astype(dtype).astype(np.float32) / scale
        ours = PCMBitDepthConversion(pcm).apply(x, 16000)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_pcm_invalid_depth():
    with pytest.raises(ValueError):
        PCMBitDepthConversion(10)


def test_mp3_quality_ordering(speechlike):
    """Lower quality number -> better fidelity (reference ffmpeg -q:a)."""
    snrs = []
    for q in (0, 2, 5, 9):
        out = MP3Compression(q).apply(speechlike, 16000)
        assert out.shape == speechlike.shape
        snrs.append(snr(out, speechlike))
    assert snrs[0] > snrs[1] > snrs[2] > snrs[3]
    assert snrs[0] > 25.0  # q0 near-transparent
    assert snrs[3] < 20.0  # q9 clearly degraded


def test_mp3_mdct_roundtrip_transparent(speechlike):
    """With quantization off (tiny scale), the MDCT chain is ~perfect
    reconstruction (Princen-Bradley TDAC check)."""
    out = np.asarray(mp3_approx(jnp.asarray(speechlike), 16000, 0))
    # not exact due to quantization, but the frame/OLA plumbing must not
    # introduce edge artifacts
    assert out.shape == speechlike.shape
    assert snr(out[2000:-2000], speechlike[2000:-2000]) > 25.0


def test_delete_samples_desync(speechlike):
    out = DeleteSamples(0.1).apply(speechlike, 16000, key=0)
    assert len(out) == len(speechlike) - int(0.1 * len(speechlike))
    out2 = DeleteSamples(0.1).apply(speechlike, 16000, key=0)
    np.testing.assert_array_equal(out, out2)  # deterministic under key
    out3 = DeleteSamples(0.1).apply(speechlike, 16000, key=1)
    assert len(out3) == len(out)


def test_random_attacks_require_key(speechlike):
    with pytest.raises(ValueError, match="key"):
        DeleteSamples(0.1).apply(speechlike, 16000)


def test_cropout(speechlike):
    out = Cropout(0.5).apply(speechlike, 16000)
    np.testing.assert_array_equal(out, speechlike[8000:])


def test_time_stretch_lengths(speechlike):
    fast = TimeStretch(1.25).apply(speechlike, 16000)
    slow = TimeStretch(0.8).apply(speechlike, 16000)
    assert len(fast) < len(speechlike) < len(slow)
    assert abs(len(fast) - len(speechlike) / 1.25) < 2048
    assert abs(len(slow) - len(speechlike) / 0.8) < 2048


def test_time_stretch_preserves_pitch(rng):
    """A stretched pure tone keeps its frequency (vocoder sanity)."""
    sr = 16000
    t = np.arange(2 * sr) / sr
    tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    out = np.asarray(time_stretch(jnp.asarray(tone), 0.9))
    spec = np.abs(np.fft.rfft(out[4096:4096 + 8192]))
    peak = np.fft.rfftfreq(8192, 1 / sr)[np.argmax(spec)]
    assert abs(peak - 440.0) < 8.0


def test_pitch_shift_moves_pitch():
    sr = 16000
    t = np.arange(2 * sr) / sr
    tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    # reference unit quirk: cents=100 -> 1 semitone
    out = PitchShift(cents=100).apply(tone, sr)
    assert len(out) == len(tone)
    spec = np.abs(np.fft.rfft(out[4096:4096 + 8192]))
    peak = np.fft.rfftfreq(8192, 1 / sr)[np.argmax(spec)]
    assert abs(peak - 440.0 * 2 ** (1 / 12)) < 10.0


def test_resample_roundtrip_16k(speechlike):
    out = Resample(16000).apply(speechlike, 16000)
    assert abs(len(out) - len(speechlike)) <= 2
    assert snr(out[: len(speechlike)], speechlike) > 10.0


def test_resample_decimation_path(rng):
    x = rng.standard_normal(32000).astype(np.float32)
    out = Resample(16000).apply(x, 32000)
    assert len(out) == len(x)
    # naive decimate + linear interp, like the reference
    ref = np.interp(np.arange(len(x)), np.arange(0, len(x), 2), x[::2])
    np.testing.assert_allclose(out, ref.astype(np.float32), atol=1e-5)


def test_bandstop_removes_band(speechlike):
    out = RandomBandstop().apply(speechlike, 16000, key=3)
    assert out.shape == speechlike.shape
    assert np.all(np.isfinite(out))
    assert snr(out, speechlike) < 30.0  # actually removed something


def test_sample_suppression(speechlike):
    out = SampleSupression(0.1).apply(speechlike, 16000, key=0)
    assert out.shape == speechlike.shape
    n_zero = np.sum(out == 0)
    assert n_zero >= int(0.1 * 16000)


def test_lowpass_matches_scipy(rng):
    x = rng.standard_normal(8000).astype(np.float32)
    out = LowPassFilter().apply(x, 16000)
    b, a = scipy.signal.butter(6, 4000 / 8000, btype="low")
    ref = scipy.signal.lfilter(b, a, x.astype(np.float64))
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-2)


def test_highpass_attenuates_low_freq():
    sr = 16000
    t = np.arange(sr) / sr
    low_tone = np.sin(2 * np.pi * 100.0 * t).astype(np.float32)
    out = HighPassFilter().apply(low_tone, sr)
    assert np.sqrt(np.mean(out[2000:] ** 2)) < 0.05


def test_gaussian_noise_snr(speechlike):
    out = GaussianNoise(20.0).apply(speechlike, 16000, key=0)
    measured = 10 * np.log10(
        np.mean(speechlike**2) / np.mean((out - speechlike) ** 2)
    )
    assert abs(measured - 20.0) < 1.0


def test_default_suite_is_reference_22():
    suite = default_attack_suite()
    assert len(suite) == 22
    names = [a.name for a in suite]
    assert names.count("pcm_8") == 1
    assert sum(n.startswith("mp3") for n in names) == 4
    assert sum(n.startswith("ts_") for n in names) == 4
