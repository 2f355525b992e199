"""Real MP3 codec binding (libmp3lame encode + libmpg123 decode).

These run the ACTUAL codec the reference's ffmpeg subprocess would use
(reference: scripts/attacks.py:73-148), bound in-process via ctypes.
Skipped wholesale when the image lacks the libraries.
"""

import numpy as np
import pytest

from aware_tpu.attacks import mp3_real

pytestmark = pytest.mark.skipif(
    not mp3_real.available(), reason="libmp3lame/libmpg123 not in image"
)

SR = 16000


@pytest.fixture(scope="module")
def tone():
    t = np.arange(2 * SR) / SR
    x = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1330 * t)
    return x.astype(np.float32)


def test_encode_produces_compressed_bitstream(tone):
    data = mp3_real.mp3_encode(tone, SR, vbr_quality=2.0)
    assert 0 < len(data) < 2 * len(tone)  # beats 16-bit PCM by far
    # MP3 frame sync: first frame starts with 11 set bits
    sync = next(
        i for i in range(len(data) - 1)
        if data[i] == 0xFF and (data[i + 1] & 0xE0) == 0xE0
    )
    assert sync < 4096


def test_decode_inverts_encode(tone):
    y, sr = mp3_real.mp3_decode(mp3_real.mp3_encode(tone, SR, vbr_quality=2.0))
    assert sr == SR
    # codec delay padding only — length within a few frames
    assert abs(len(y) - len(tone)) < 4096


def test_roundtrip_alignment_and_length(tone):
    z = mp3_real.mp3_roundtrip(tone, SR, quality=2.0)
    assert z.shape == tone.shape and z.dtype == np.float32
    snr = 10 * np.log10(np.mean(tone**2) / np.mean((z - tone) ** 2))
    assert snr > 25.0, f"misaligned roundtrip? SNR {snr:.1f} dB"
    # dominant component survives at the right frequency
    spec = np.abs(np.fft.rfft(z * np.hanning(len(z))))
    assert abs(np.argmax(spec) * SR / len(z) - 440.0) < 2.0


def test_quality_ordering(tone):
    def snr(q):
        z = mp3_real.mp3_roundtrip(tone, SR, quality=float(q))
        return 10 * np.log10(np.mean(tone**2) / np.mean((z - tone) ** 2))

    s0, s5, s9 = snr(0), snr(5), snr(9)
    assert s0 > s5 > s9, (s0, s5, s9)


def test_attack_class_and_suite_rows():
    from aware_tpu.attacks import MP3Compression, default_attack_suite

    names = [a.name for a in default_attack_suite()]
    # real-codec rows carry the reference's row names
    assert {"mp3_0", "mp3_2", "mp3_5", "mp3_9"} <= set(names)
    assert len(names) == 22
    # forcing the approximation keeps the suite shape, renamed rows
    approx_names = [a.name for a in default_attack_suite(real_mp3=False)]
    assert {"mp3approx_0", "mp3approx_9"} <= set(approx_names)
    assert MP3Compression(2).name == "mp3approx_2"


def test_attack_apply_contract(tone):
    atk = mp3_real.MP3CompressionReal(quality=5)
    out = atk.apply(tone, SR)
    assert out.shape == tone.shape
    assert not np.allclose(out, tone)  # lossy
    assert np.max(np.abs(out)) < 1.5   # sane range
