"""Eval harness + WAV I/O tests."""

import numpy as np
import pytest

from aware_tpu.attacks import PCMBitDepthConversion, GaussianNoise
from aware_tpu.eval import run_robustness_eval, synthesize_speech_clip
from aware_tpu.service.api import load
from aware_tpu.utils.io import read_wav, write_wav


def test_wav_roundtrip_16bit(tmp_path, rng):
    x = rng.standard_normal(8000).astype(np.float32)
    x = 0.9 * x / np.max(np.abs(x))
    p = str(tmp_path / "a.wav")
    write_wav(p, x, 16000, bits=16)
    y, sr = read_wav(p)
    assert sr == 16000
    # half-LSB rounding + the 32767-write/32768-read scale convention
    np.testing.assert_allclose(y, x, atol=7e-5)


def test_wav_roundtrip_float32_stereo(tmp_path, rng):
    x = (rng.standard_normal((4000, 2)) * 0.4).astype(np.float32)
    p = str(tmp_path / "b.wav")
    write_wav(p, x, 44100, bits=32)
    y, sr = read_wav(p)
    assert sr == 44100
    np.testing.assert_allclose(y, x, atol=1e-7)


def test_synthesized_clip_is_speechlike():
    clip = synthesize_speech_clip(0)
    from aware_tpu.ops.vad import is_silent

    assert not is_silent(clip, 16000)
    assert np.max(np.abs(clip)) <= 1.0
    np.testing.assert_array_equal(clip, synthesize_speech_clip(0))


@pytest.mark.slow
def test_harness_smoke():
    """2 clips, 2 cheap attacks, reduced iterations — verifies the full
    embed->attack->detect aggregation plumbing."""
    model = load(num_iterations=60)
    results = run_robustness_eval(
        n_clips=2,
        seed=1,
        attacks=[PCMBitDepthConversion(16), GaussianNoise(40.0)],
        model=model,
    )
    assert "clean_ber" in results and "ber:pcm_16" in results
    assert results["clean_ber"] <= 10.0  # 60 iters: most bits stick
    assert results["ber:pcm_16"] <= results["clean_ber"] + 15.0
    assert 1.0 <= results["pesq"] <= 4.64
    assert 0.0 <= results["stoi"] <= 1.0


def test_harness_wav_dir(tmp_path):
    """Harness reads clips from a WAV directory."""
    clip = synthesize_speech_clip(3)
    write_wav(str(tmp_path / "c.wav"), clip, 16000)
    model = load(num_iterations=10)
    results = run_robustness_eval(
        audio_dir=str(tmp_path), n_clips=1, attacks=[], model=model
    )
    assert "clean_ber" in results
