"""Real AAC / Vorbis / Speex / G.722 attacks via the libavcodec shim.

Beyond-reference capability (the reference's only codec attack is MP3,
reference: scripts/attacks.py:73-148).  The shim runs the actual FFmpeg
5.1 codecs in-process (aware_tpu/_native/aware_codecs.cc); every test
skips when the shim or a codec is missing from the image.
"""

import numpy as np
import pytest

from aware_tpu.attacks import av_codecs as av

SR = 16000


@pytest.fixture(scope="module")
def tone():
    t = np.arange(2 * SR) / SR
    x = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1330 * t)
    return (x * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)


def needs(codec):
    return pytest.mark.skipif(
        not av.avc_available(codec), reason=f"libavcodec {codec} missing"
    )


@needs("aac")
def test_aac_roundtrip_contract(tone):
    z = av.avc_roundtrip(tone, SR, "aac", 64000)
    assert z.shape == tone.shape and z.dtype == np.float32
    snr = 10 * np.log10(np.mean(tone**2) / np.mean((z - tone) ** 2))
    assert snr > 15.0, f"misaligned? SNR {snr:.1f} dB"
    assert not np.allclose(z, tone)


@needs("aac")
def test_aac_bitrate_ordering(tone):
    def snr(kbps):
        z = av.avc_roundtrip(tone, SR, "aac", kbps * 1000)
        return 10 * np.log10(np.mean(tone**2) / np.mean((z - tone) ** 2))

    assert snr(96) > snr(16)


@needs("libvorbis")
def test_vorbis_quality_mode(tone):
    z = av.avc_roundtrip(tone, SR, "libvorbis", 0, 3.0)
    assert z.shape == tone.shape
    snr = 10 * np.log10(np.mean(tone**2) / np.mean((z - tone) ** 2))
    assert snr > 15.0, f"misaligned? SNR {snr:.1f} dB"


@needs("libspeex")
def test_speex_wideband(tone):
    z = av.avc_roundtrip(tone, SR, "libspeex")
    assert z.shape == tone.shape
    snr = 10 * np.log10(np.mean(tone**2) / np.mean((z - tone) ** 2))
    assert snr > 5.0, f"misaligned? SNR {snr:.1f} dB"


@needs("g722")
def test_g722_telephony(tone):
    z = av.avc_roundtrip(tone, SR, "g722", 64000)
    assert z.shape == tone.shape
    snr = 10 * np.log10(np.mean(tone**2) / np.mean((z - tone) ** 2))
    assert snr > 15.0, f"misaligned? SNR {snr:.1f} dB"


@needs("aac")
def test_attack_classes(tone):
    for atk, name in [
        (av.AACCompression(32), "aac_32k"),
        (av.G722Telephony(), "g722"),
    ]:
        assert atk.name == name
        out = atk.apply(tone, SR)
        assert out.shape == tone.shape and out.dtype == np.float32


def test_unknown_codec_raises(tone):
    if not av.avc_available():
        pytest.skip("shim unavailable")
    with pytest.raises(RuntimeError, match="rc="):
        av.avc_roundtrip(tone, SR, "definitely_not_a_codec")
