"""Bound the gate divergence between the two VAD classifiers.

The service's default gate is the spectral-energy VAD (ops/vad.py,
traced/vmappable); the native runtime also ships a WebRTC-architecture GMM
VAD (the classifier family the reference uses through webrtcvad).  The
real webrtcvad extension is absent from this image, so exact parity is
unmeasurable; what CAN be measured — and is, here — is where the two
classifiers we ship agree and where they diverge, over a labeled
synthesized corpus spanning the decision space:

  speech families x levels, pause-bearing speech, speech+noise,
  silence, hiss levels, white noise levels, tones, chords, clicks.

Writes VAD_DIVERGENCE.json: per-category gate decisions for both
classifiers + ground-truth speech labels, and summary agreement rates.

Run:  python tools/vad_divergence.py
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from aware_tpu.eval.harness import synthesize_speech_clip  # noqa: E402
from aware_tpu.native import native_available, vad_gmm_is_silent  # noqa: E402
from aware_tpu.ops.vad import is_silent  # noqa: E402

SR = 16000


def _paused_speech(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(3 * SR) / SR
    ph = np.cumsum(2 * np.pi * (110 + 50 * np.sin(2 * np.pi * 1.6 * t)) / SR)
    x = sum(np.cos(k * ph + rng.random() * 6) / k for k in range(1, 28))
    x *= np.clip(np.sin(2 * np.pi * (1.4 + rng.random()) * t), 0, None) ** 0.5
    return (x / np.abs(x).max()).astype(np.float32)


def build_corpus() -> list[tuple[str, np.ndarray, bool]]:
    """(category, clip, contains_speech) triples — ~130 clips spanning
    the decision space (speech families x levels x noise, pauses, babble,
    plus the classic webrtcvad traps: loud noise, tones, chords, clicks,
    music-like material)."""
    from aware_tpu.train.distill import diverse_clip

    rng = np.random.default_rng(0)
    t = np.arange(2 * SR) / SR
    corpus: list[tuple[str, np.ndarray, bool]] = []
    for i in range(12):
        corpus.append((f"speech_{i}", synthesize_speech_clip(i), True))
        corpus.append((f"paused_speech_{i}", _paused_speech(50 + i), True))
    for i in range(16):  # 4 generator families x 4 seeds
        corpus.append((f"diverse_{i % 4}_{i}", diverse_clip(200 + i), True))
    for level_db in (-20.0, -30.0, -36.0, -40.0):
        g = 10 ** (level_db / 20)
        for s in range(3):
            corpus.append(
                (f"quiet_speech_{int(-level_db)}dB_{s}",
                 synthesize_speech_clip(7 + s) * g, True)
            )
    for snr_db in (20.0, 10.0, 5.0, 0.0):
        for s in range(3):
            x = synthesize_speech_clip(30 + s)
            n = rng.standard_normal(len(x)).astype(np.float32)
            n *= np.sqrt(np.mean(x**2) / 10 ** (snr_db / 10)) / np.std(n)
            corpus.append((f"speech_noise_{int(snr_db)}dB_{s}", x + n, True))
    # babble: sum of desynchronized speech generators (still speech-true)
    for s in range(4):
        b = sum(synthesize_speech_clip(60 + s * 7 + k) for k in range(4))
        corpus.append(
            (f"babble_{s}", (b / np.abs(b).max()).astype(np.float32), True)
        )
    corpus.append(("silence", np.zeros(2 * SR, np.float32), False))
    for level_db in (-70.0, -60.0, -40.0, -20.0, -6.0):
        g = 10 ** (level_db / 20)
        corpus.append(
            (f"white_noise_{int(-level_db)}dB",
             (g * rng.standard_normal(2 * SR)).astype(np.float32), False)
        )
        # pink-ish noise (1/f) — closer to room noise than white
        w = np.fft.rfft(rng.standard_normal(2 * SR))
        f = np.maximum(np.fft.rfftfreq(2 * SR, 1 / SR), 1.0)
        p = np.fft.irfft(w / np.sqrt(f), 2 * SR).astype(np.float32)
        p = p / np.abs(p).max() * g
        corpus.append((f"pink_noise_{int(-level_db)}dB", p, False))
    for f in (120.0, 440.0, 1000.0, 3000.0, 6000.0):
        corpus.append(
            (f"tone_{int(f)}Hz",
             (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32), False)
        )
    # AM tone + vibrato tone (modulated but not speech)
    am = (0.5 * np.sin(2 * np.pi * 800 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 4 * t)))
    corpus.append(("am_tone", am.astype(np.float32), False))
    vib = 0.5 * np.sin(2 * np.pi * (600 * t + 20 * np.sin(2 * np.pi * 5 * t)))
    corpus.append(("vibrato_tone", vib.astype(np.float32), False))
    chord = sum(np.sin(2 * np.pi * f * t) for f in (262.0, 330.0, 392.0))
    corpus.append(("chord", (chord / np.abs(chord).max()).astype(np.float32), False))
    # arpeggio "music": sequential sine notes with decay envelopes
    notes = np.zeros(2 * SR, np.float32)
    for k, f in enumerate((262.0, 330.0, 392.0, 523.0) * 2):
        s0 = k * SR // 4
        seg = np.arange(SR // 4) / SR
        notes[s0 : s0 + SR // 4] = (
            np.sin(2 * np.pi * f * seg) * np.exp(-6 * seg)
        )
    corpus.append(("arpeggio", notes, False))
    # DTMF digit (dual tones)
    dtmf = 0.4 * (np.sin(2 * np.pi * 770 * t) + np.sin(2 * np.pi * 1336 * t))
    corpus.append(("dtmf", dtmf.astype(np.float32), False))
    clicks = np.zeros(2 * SR, np.float32)
    clicks[:: SR // 4] = 1.0
    corpus.append(("clicks", clicks, False))
    return corpus


def main() -> None:
    if not native_available():
        raise SystemExit("native library unavailable; build aware_tpu/_native")
    rows = []
    for name, clip, has_speech in build_corpus():
        spectral_silent = bool(is_silent(clip, SR))
        gmm_silent = vad_gmm_is_silent(clip, SR)
        rows.append(
            {
                "category": name,
                "speech": has_speech,
                "spectral_silent": spectral_silent,
                "gmm_silent": gmm_silent,
            }
        )
    n = len(rows)
    agree = sum(r["spectral_silent"] == r["gmm_silent"] for r in rows)
    speech_rows = [r for r in rows if r["speech"]]
    nonspeech_rows = [r for r in rows if not r["speech"]]
    summary = {
        "n_clips": n,
        "agreement_rate": agree / n,
        "speech_pass_spectral": sum(
            not r["spectral_silent"] for r in speech_rows
        ) / len(speech_rows),
        "speech_pass_gmm": sum(not r["gmm_silent"] for r in speech_rows)
        / len(speech_rows),
        "nonspeech_reject_spectral": sum(
            r["spectral_silent"] for r in nonspeech_rows
        ) / len(nonspeech_rows),
        "nonspeech_reject_gmm": sum(r["gmm_silent"] for r in nonspeech_rows)
        / len(nonspeech_rows),
        "note": (
            "gmm inherits webrtcvad's loud-noise/tone false positives "
            "(reference-faithful); the spectral gate rejects those"
        ),
    }
    out = {"summary": summary, "rows": rows}
    path = pathlib.Path(__file__).parent.parent / "VAD_DIVERGENCE.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
