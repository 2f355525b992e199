"""Real Opus / GSM 06.10 codec attacks (beyond-reference capability).

Bound from the image's libopus.so.0 / libgsm.so.1 — no reference
counterpart (the reference's only codec attack is MP3).  Skipped
per-codec when a library is missing.
"""

import numpy as np
import pytest

from aware_tpu.attacks import voice_codecs as vc

SR = 16000


@pytest.fixture(scope="module")
def tone():
    t = np.arange(2 * SR) / SR
    x = 0.5 * np.sin(2 * np.pi * 440 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
    return x.astype(np.float32)


needs_opus = pytest.mark.skipif(not vc.opus_available(), reason="no libopus")
needs_gsm = pytest.mark.skipif(not vc.gsm_available(), reason="no libgsm")


@needs_opus
def test_opus_roundtrip_contract(tone):
    z = vc.opus_roundtrip(tone, SR, bitrate_bps=24000)
    assert z.shape == tone.shape and z.dtype == np.float32
    snr = 10 * np.log10(np.mean(tone**2) / np.mean((z - tone) ** 2))
    assert snr > 15.0, f"misaligned? SNR {snr:.1f} dB"
    assert not np.allclose(z, tone)


@needs_opus
def test_opus_bitrate_ordering(tone):
    def snr(br):
        z = vc.opus_roundtrip(tone, SR, bitrate_bps=br)
        return 10 * np.log10(np.mean(tone**2) / np.mean((z - tone) ** 2))

    hi, lo = snr(32000), snr(6000)
    assert hi > lo, (hi, lo)


@needs_opus
def test_opus_rejects_nonnative_rate(tone):
    with pytest.raises(ValueError, match="Opus supports"):
        vc.opus_roundtrip(tone, 22050)


@needs_gsm
def test_gsm_roundtrip_contract(tone):
    z = vc.gsm_roundtrip(tone, SR)
    assert z.shape == tone.shape and z.dtype == np.float32
    snr = 10 * np.log10(np.mean(tone**2) / np.mean((z - tone) ** 2))
    assert snr > 10.0, f"misaligned? SNR {snr:.1f} dB"
    # GSM's 8 kHz leg low-passes everything above 4 kHz
    spec = np.abs(np.fft.rfft(z))
    freqs = np.fft.rfftfreq(len(z), 1 / SR)
    hf = np.sum(spec[freqs > 5000] ** 2) / np.sum(spec**2)
    assert hf < 0.01


@needs_opus
@needs_gsm
def test_extended_suite_shape():
    from aware_tpu.attacks.av_codecs import avc_available

    from aware_tpu.attacks.soxr_real import soxr_available

    suite = vc.extended_attack_suite()
    names = [a.name for a in suite]
    # reference 22 + opus x3 + gsm (+5 libavcodec rows when the shim
    # builds, +2 libsoxr real-resampler rows when the library is present)
    expected = (
        26
        + (5 if avc_available("aac") else 0)
        + (2 if soxr_available() else 0)
    )
    assert len(suite) == expected, names
    assert {"opus_32k", "opus_16k", "opus_8k", "gsm_fr"} <= set(names)
    if avc_available("aac"):
        assert {"aac_64k", "aac_32k", "vorbis_q3", "speex_wb", "g722"} <= set(
            names
        )


@needs_opus
def test_opus_attack_class(tone):
    atk = vc.OpusCompression(16000)
    assert atk.name == "opus_16k"
    out = atk.apply(tone, SR)
    assert out.shape == tone.shape
