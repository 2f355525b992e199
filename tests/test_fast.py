"""One-shot / turbo embed modes (bundled amortized model)."""

import numpy as np
import pytest

from aware_tpu import detect_watermark, load
from aware_tpu.service import embed_watermark_oneshot, embed_watermark_turbo
from aware_tpu.service.fast import _AMORTIZED_PATH

pytestmark = pytest.mark.skipif(
    not _AMORTIZED_PATH.exists(), reason="amortized model not trained"
)

BITS = np.array([1, 0, 1, 1, 0, 0, 1, 0, 1, 1, 0, 1, 0, 0, 1, 1, 1, 0, 0, 1])


@pytest.fixture(scope="module")
def model():
    return load()


def test_oneshot_embed(model, speechlike):
    embedder, detector = model
    wm = embed_watermark_oneshot(speechlike, 16000, BITS, embedder)
    assert wm.shape == ((len(speechlike) // 256) * 256,)
    detected = detect_watermark(wm, 16000, detector)
    ber = float(np.mean(detected != BITS)) * 100
    # amortized one-shot (seg4 default, ~3% mean); generous bound per clip
    assert ber <= 25.0, f"one-shot BER {ber}%"
    snr = 10 * np.log10(
        np.mean(speechlike[: len(wm)] ** 2)
        / np.mean((wm - speechlike[: len(wm)]) ** 2)
    )
    # the default bundle embeds at its trained tol-2 box (~12.7 dB mean
    # on speech material; per-clip slack below that)
    assert snr > 9.0


def test_oneshot_tolerance_override(model, speechlike):
    """A smaller tolerance_db spends more perturbation energy (the tanh
    output scales with the box): SNR drops measurably, the mark still
    detects, and the card's own budget is untouched
    (AMORTIZED_TOLERANCE_SWEEP.json is the measured accuracy curve)."""
    embedder, detector = model
    # speech_v1 has no trained-box entry, so it embeds at the card's 6 dB
    # box unless overridden — the variant that exercises the override path
    wm6 = embed_watermark_oneshot(speechlike, 16000, BITS, embedder,
                                  variant="speech_v1")
    wm2 = embed_watermark_oneshot(
        speechlike, 16000, BITS, embedder, variant="speech_v1",
        tolerance_db=2.0
    )

    def snr(w):
        n = min(len(w), len(speechlike))
        return 10 * np.log10(
            np.mean(speechlike[:n] ** 2)
            / np.mean((w[:n] - speechlike[:n]) ** 2)
        )

    assert snr(wm2) < snr(wm6) - 1.0
    detected = detect_watermark(wm2, 16000, detector)
    assert float(np.mean(detected != BITS)) * 100 <= 25.0
    assert embedder.cfg.tolerance_db == 6.0  # card budget untouched


@pytest.mark.slow
def test_turbo_embed_zero_ber(model, speechlike):
    embedder, detector = model
    wm = embed_watermark_turbo(speechlike, 16000, BITS, embedder, num_iterations=100)
    detected = detect_watermark(wm, 16000, detector)
    assert float(np.mean(detected != BITS)) == 0.0


def test_oneshot_rejects_wrong_rate(model, speechlike):
    embedder, _ = model
    with pytest.raises(ValueError, match="model rate"):
        embed_watermark_oneshot(speechlike, 44100, BITS, embedder)


def test_diverse_variant_loads(model, speechlike):
    from aware_tpu.service.fast import _VARIANTS

    if not _VARIANTS["diverse"][0].exists():
        pytest.skip("diverse bundle not trained")
    embedder, detector = model
    wm = embed_watermark_oneshot(speechlike, 16000, BITS, embedder, variant="diverse")
    assert wm.shape == ((len(speechlike) // 256) * 256,)
    with pytest.raises(FileNotFoundError):
        embed_watermark_oneshot(speechlike, 16000, BITS, embedder, variant="nope")


def test_variant_trained_box_autoapplies(model, speechlike):
    """A variant with a non-None trained box width (_VARIANTS) runs at that
    box by default — lower SNR than the card's 6 dB — while an explicit
    tolerance_db still wins over the variant entry."""
    from aware_tpu.service.fast import _VARIANTS

    path, tol = _VARIANTS["diverse_tol2"]
    if not path.exists():
        pytest.skip("tol2 gate bundle not trained")
    assert tol is not None and tol < 6.0
    embedder, detector = model

    def snr(w):
        n = min(len(w), len(speechlike))
        return 10 * np.log10(
            np.mean(speechlike[:n] ** 2)
            / np.mean((w[:n] - speechlike[:n]) ** 2)
        )

    wm_auto = embed_watermark_oneshot(
        speechlike, 16000, BITS, embedder, variant="diverse_tol2"
    )
    wm_wide = embed_watermark_oneshot(
        speechlike, 16000, BITS, embedder, variant="diverse_tol2",
        tolerance_db=6.0,
    )
    # trained box (2 dB) spends more energy than the explicit 6 dB override
    assert snr(wm_auto) < snr(wm_wide) - 1.0
    detected = detect_watermark(wm_auto, 16000, detector)
    assert float(np.mean(detected != BITS)) * 100 <= 25.0


def test_oneshot_message_survives_desync(model):
    """The system-level closure of the one-shot desync gap (round 5b,
    ECC_ONESHOT_DESYNC.json): the amortized embed's 12-21% slot BER
    under time-stretch is inside the [20,4] code's soft-decision
    correction power, so a plain ML decode recovers the payload with no
    compensation search.  Uses the eval harness's 10 s clip — the
    closure relies on the mark's time redundancy; a 2 s fixture is
    below the operating point the artifact pins."""
    from aware_tpu.attacks import TimeStretch
    from aware_tpu.eval import synthesize_speech_clip
    from aware_tpu.service.ecc import detect_message, encode_message

    embedder, detector = model
    clip = synthesize_speech_clip(900)
    msg = np.array([1, 0, 1, 1], dtype=np.int32)
    wm = embed_watermark_oneshot(
        clip, 16000, encode_message(msg), embedder
    )
    attacked = np.asarray(
        TimeStretch(rate=1.1).apply(np.asarray(wm), 16000, key=3),
        dtype=np.float32,
    )
    res = detect_message(attacked, 16000, detector, k=4)
    assert (res.msg_bits == msg).all(), res
