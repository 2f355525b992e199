"""Service-layer contract tests (reference: service/embed.py, service/detect.py)."""

import numpy as np
import pytest

from aware_tpu import load, embed_watermark, detect_watermark
from aware_tpu.service import (
    embed_watermark_batch,
    detect_watermark_batch,
    encode_pattern,
    decode_pattern,
)
from aware_tpu.config import AwareConfig
from aware_tpu.ops.vad import is_silent

BITS = np.array([1, 0, 1, 1, 0, 0, 1, 0, 1, 1, 0, 1, 0, 0, 1, 1, 1, 0, 0, 1])


@pytest.fixture(scope="module")
def model():
    # few iterations: service-contract tests exercise plumbing, not quality
    return load(num_iterations=25)


def test_load_returns_shared_params(model):
    embedder, detector = model
    assert embedder.params is detector.params
    assert detector.get_model_info()["total_parameters"] == 1_681_960


def test_mono_embed_detect(model, speechlike):
    embedder, detector = model
    wm = embed_watermark(speechlike, 16000, BITS, embedder)
    assert wm.ndim == 1
    # service rescales by the signed max of the input
    assert abs(np.max(wm) - np.max(speechlike)) < 0.05
    detected = detect_watermark(wm, 16000, detector)
    assert detected.shape == (20,)
    assert set(np.unique(detected)) <= {0, 1}


def test_full_card_mono_roundtrip_zero_ber(speechlike):
    embedder, detector = load()  # full 400 iterations
    wm = embed_watermark(speechlike, 16000, BITS, embedder)
    detected = detect_watermark(wm, 16000, detector)
    assert np.mean(detected != BITS) == 0.0


def test_stereo_embed_detect(model, speechlike):
    embedder, detector = model
    stereo = np.column_stack([speechlike, 0.8 * np.roll(speechlike, 500)])
    wm = embed_watermark(stereo, 16000, BITS, embedder)
    assert wm.shape[1] == 2
    detected = detect_watermark(wm, 16000, detector)
    assert detected.shape == (20,)


def test_wrong_watermark_length_raises(model, speechlike):
    embedder, _ = model
    with pytest.raises(ValueError, match="watermark length"):
        embed_watermark(speechlike, 16000, np.array([1, 0, 1]), embedder)


def test_silent_audio_raises(model):
    embedder, _ = model
    silence = np.zeros(16000, np.float32) + 1e-5
    with pytest.raises(ValueError, match="speech"):
        embed_watermark(silence, 16000, BITS, embedder)


def test_44k_resample_path(model, speechlike):
    """Non-16k input is accepted (resampled in and out) — rebuild extension;
    the reference raises here."""
    from aware_tpu.ops.resample import resample
    import jax.numpy as jnp

    embedder, detector = model
    audio44 = np.asarray(resample(jnp.asarray(speechlike), 16000, 44100))
    wm44 = embed_watermark(audio44, 44100, BITS, embedder)
    assert wm44.ndim == 1
    # detector accepts the 44.1k watermarked clip directly
    detected = detect_watermark(wm44, 44100, detector)
    assert detected.shape == (20,)


def test_batch_service(model, speechlike):
    embedder, detector = model
    audios = np.stack([speechlike, np.roll(speechlike, 777)])
    bits = np.stack([BITS, 1 - BITS])
    wm = embed_watermark_batch(audios, 16000, bits, embedder)
    assert wm.shape[0] == 2
    detected = detect_watermark_batch(wm, 16000, detector)
    assert detected.shape == (2, 20)


def test_vad_card_flag_selects_gate(speechlike):
    """cfg.vad routes the service silence gate: "webrtc_gmm" uses the C++
    reference-faithful classifier, which (by webrtcvad's documented
    behavior) PASSES loud white noise that the spectral gate rejects —
    the two gates are observably different through the service config."""
    from aware_tpu.config import AwareConfig
    from aware_tpu.native import native_available
    from aware_tpu.service.api import _gate_silent

    if not native_available():
        pytest.skip("native library not built")
    spec_cfg = AwareConfig()
    gmm_cfg = AwareConfig().replace(vad="webrtc_gmm")
    assert not _gate_silent(speechlike, 16000, spec_cfg)
    assert not _gate_silent(speechlike, 16000, gmm_cfg)
    noise = (
        np.random.default_rng(3).standard_normal(16000).astype(np.float32)
        * 0.5
    )
    assert _gate_silent(noise, 16000, spec_cfg)       # spectral rejects
    assert not _gate_silent(noise, 16000, gmm_cfg)    # webrtcvad passes
    with pytest.raises(ValueError, match="Invalid vad gate"):
        AwareConfig(vad="nope")


def test_config_field_validation():
    from aware_tpu.config import AwareConfig

    with pytest.raises(ValueError, match="Invalid eot_mode"):
        AwareConfig(eot_mode="cylce")
    with pytest.raises(ValueError, match="Invalid vad gate"):
        AwareConfig(vad="nope")
    with pytest.raises(ValueError, match="Invalid window"):
        AwareConfig(window="blackman")


def test_vad_gate_semantics(speechlike, rng):
    assert not is_silent(speechlike, 16000)
    assert is_silent(np.zeros(16000, np.float32), 16000)
    # loud white noise: energetic but not speech-like
    noise = rng.standard_normal(16000).astype(np.float32) * 0.5
    assert is_silent(noise, 16000)


def test_codec_roundtrips():
    bits = np.array([1, 0, 1, 1, 0])
    np.testing.assert_array_equal(encode_pattern(bits), [1, -1, 1, 1, -1])
    vals = np.array([0.9, -0.3, 0.1, 0.7, -0.8])
    np.testing.assert_array_equal(decode_pattern(vals), [1, 0, 1, 1, 0])

    payload = b"\xa5"
    bits8 = encode_pattern(payload, "bytes2bits")
    np.testing.assert_array_equal(bits8, [1, 0, 1, 0, 0, 1, 0, 1])
    bipolar8 = encode_pattern(payload, "bytes2bipolar")
    np.testing.assert_array_equal(bipolar8, [1, -1, 1, -1, -1, 1, -1, 1])
    # reference's one-byte-per-bit packing quirk
    decoded = decode_pattern(np.array([0.5, -0.5]), "bytes2bits")
    assert decoded == b"\x01\x00"


def test_codec_invalid_mode():
    with pytest.raises(ValueError):
        encode_pattern([1, 0], "nope")
    with pytest.raises(ValueError):
        decode_pattern(np.array([0.1]), "nope")


def test_batch_silent_masking(model, speechlike):
    """on_silent='mask': silent lanes pass through; batch survives."""
    embedder, detector = model
    silence = np.zeros_like(speechlike) + 1e-5
    audios = np.stack([speechlike, silence])
    bits = np.stack([BITS, BITS])
    out, mask = embed_watermark_batch(
        audios, 16000, bits, embedder, on_silent="mask"
    )
    assert mask.tolist() == [True, False]
    # silent lane returned unwatermarked
    np.testing.assert_allclose(out[1], silence[: out.shape[1]], atol=1e-6)
    with pytest.raises(ValueError, match="no speech"):
        embed_watermark_batch(audios, 16000, bits, embedder)


def test_turbo_card_loads(speechlike):
    """The shipped turbo card parses and embeds at 50 iterations."""
    import pathlib
    card = pathlib.Path("aware_tpu/cards/turbo.yaml")
    embedder, detector = load(card=str(card))
    assert embedder.cfg.num_iterations == 50
    wm = embed_watermark(speechlike, 16000, BITS, embedder)
    detected = detect_watermark(wm, 16000, detector)
    assert np.mean(detected != BITS) == 0.0


def test_bare_card_names_resolve_and_compression_card_parses(speechlike):
    """load() resolves bare card names against the packaged cards dir;
    the compression card configures the q11 MDCT EOT view and still
    embeds/detects clean at a reduced budget."""
    embedder, _ = load("robust", num_iterations=2)
    assert embedder.cfg.eot_stretch_rates  # the robust card's views

    embedder, detector = load("compression", num_iterations=40)
    assert embedder.cfg.eot_mp3_qualities == (10, 11)
    assert embedder.cfg.eot_celp_modes == ("nb8k",)
    assert embedder.cfg.eot_mode == "cycle"
    wm = embed_watermark(speechlike, 16000, BITS, embedder)
    detected = detect_watermark(wm, 16000, detector)
    assert np.mean(detected != BITS) == 0.0


def test_voice_card_parses_ste_codecs():
    """The voice card loads the straight-through REAL-codec views
    (arm F of COMPRESSION_EOT_AB_STE_F.json) from YAML."""
    embedder, _ = load("voice", num_iterations=2)
    assert embedder.cfg.eot_ste_codecs == ("opus_8k", "gsm_fr")
    assert embedder.cfg.eot_mode == "cycle"
    assert embedder.cfg.eot_weight == 1.0
