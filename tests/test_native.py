"""C++ native runtime tests (WAV I/O, VAD parity, quantize, batch loader)."""

import numpy as np
import pytest

from aware_tpu import native
from aware_tpu.eval import synthesize_speech_clip
from aware_tpu.utils.io import read_wav as py_read, write_wav as py_write

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native library unavailable"
)


def test_wav_roundtrip_native(tmp_path, rng):
    x = rng.standard_normal(8000).astype(np.float32)
    x = 0.9 * x / np.max(np.abs(x))
    p = str(tmp_path / "n.wav")
    native.write_wav(p, x, 16000, bits=16)
    y, sr = native.read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(y, x, atol=7e-5)


def test_native_reads_python_writes(tmp_path, rng):
    x = (rng.standard_normal((4000, 2)) * 0.5).astype(np.float32)
    p = str(tmp_path / "c.wav")
    py_write(p, x, 44100, bits=32)
    y, sr = native.read_wav(p)
    assert sr == 44100 and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1e-7)


def test_python_reads_native_writes(tmp_path, rng):
    x = rng.standard_normal(4000).astype(np.float32) * 0.5
    p = str(tmp_path / "d.wav")
    native.write_wav(p, x, 16000, bits=32)
    y, sr = py_read(p)
    np.testing.assert_allclose(y, x, atol=1e-7)


def test_vad_parity_with_jax(speechlike, rng):
    """Native and JAX VAD agree on the gate decision for typical inputs."""
    from aware_tpu.ops.vad import is_silent as jax_silent

    cases = [
        speechlike,
        np.zeros(16000, np.float32),
        (rng.standard_normal(16000) * 0.5).astype(np.float32),  # noise
        speechlike * 0.001,  # very quiet speech
    ]
    for x in cases:
        assert native.vad_is_silent(x, 16000) == bool(jax_silent(x, 16000))


def test_pcm_quantize_parity(rng):
    from aware_tpu.attacks import PCMBitDepthConversion

    x = (rng.standard_normal(5000) * 0.7).astype(np.float32)
    for bits in (8, 16):
        ref = PCMBitDepthConversion(bits).apply(x, 16000)
        got = native.pcm_quantize(x, bits)
        np.testing.assert_allclose(got, ref, atol=1e-6)


def test_batch_loader(tmp_path):
    files = []
    for i in range(7):
        clip = synthesize_speech_clip(i, seconds=0.5)
        p = tmp_path / f"clip{i}.wav"
        py_write(str(p), clip, 16000)
        files.append(str(p))

    loader = native.BatchLoader(files, batch=3, length=8000, n_threads=3)
    batches = list(loader)
    assert len(batches) == 3  # 3 + 3 + 1
    counts = [b[3] for b in batches]
    assert counts == [3, 3, 1]
    data0, lengths0, rates0, _ = batches[0]
    assert data0.shape == (3, 8000)
    assert all(r == 16000 for r in rates0)
    assert all(l == 8000 for l in lengths0)
    # deterministic file order: batch 0 row 0 == clip 0
    ref = synthesize_speech_clip(0, seconds=0.5)
    np.testing.assert_allclose(data0[0], ref[:8000], atol=7e-5)


def test_batch_loader_deterministic(tmp_path):
    files = []
    for i in range(6):
        clip = synthesize_speech_clip(10 + i, seconds=0.3)
        p = tmp_path / f"c{i}.wav"
        py_write(str(p), clip, 16000)
        files.append(str(p))
    a = [b[0].copy() for b in native.BatchLoader(files, 2, 4000, n_threads=4)]
    b = [b_[0].copy() for b_ in native.BatchLoader(files, 2, 4000, n_threads=1)]
    assert len(a) == len(b) == 3
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_gmm_vad_fixtures(speechlike, rng):
    """Reference-faithful GMM VAD: voiced/unvoiced gate decisions
    (webrtcvad architecture; see aware_native.cc gmmvad section)."""
    from aware_tpu.native import native_available, vad_gmm_is_silent

    if not native_available():
        pytest.skip("no native toolchain")
    sr = 16000
    assert not vad_gmm_is_silent(speechlike, sr)          # speech passes
    # quiet speech (-20 dB) passes; like webrtcvad the features are raw
    # band energies, so detection is level-dependent by design (the
    # reference feeds unnormalized audio to the gate, waveform.py:31-36)
    assert not vad_gmm_is_silent(speechlike * 0.1, sr)
    assert vad_gmm_is_silent(np.zeros(2 * sr, np.float32), sr)
    hiss = (0.001 * rng.standard_normal(2 * sr)).astype(np.float32)
    assert vad_gmm_is_silent(hiss, sr)
    # webrtcvad-faithful false positives: loud stationary noise & tones
    loud = (0.5 * rng.standard_normal(2 * sr)).astype(np.float32)
    assert not vad_gmm_is_silent(loud, sr)
    tone = (0.5 * np.sin(2 * np.pi * 1000 * np.arange(2 * sr) / sr)).astype(
        np.float32
    )
    assert not vad_gmm_is_silent(tone, sr)


def test_gmm_vad_flags_shape_and_rates(speechlike):
    from aware_tpu.native import native_available, vad_gmm_flags

    if not native_available():
        pytest.skip("no native toolchain")
    flags = vad_gmm_flags(speechlike, 16000)
    assert flags.shape == (len(speechlike) // 480,)
    assert flags.any()
    # 8 kHz input path (one fewer filterbank halving)
    flags8 = vad_gmm_flags(speechlike[::2].copy(), 8000)
    assert flags8.any()
    import pytest as _pytest
    with _pytest.raises(ValueError):
        vad_gmm_flags(speechlike, 44100)  # not reducible to 8 kHz
