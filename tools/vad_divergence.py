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
    """(category, clip, contains_speech) triples."""
    rng = np.random.default_rng(0)
    t = np.arange(2 * SR) / SR
    corpus: list[tuple[str, np.ndarray, bool]] = []
    for i in range(6):
        corpus.append((f"speech_{i}", synthesize_speech_clip(i), True))
        corpus.append((f"paused_speech_{i}", _paused_speech(50 + i), True))
    for level_db in (-30.0, -40.0):
        g = 10 ** (level_db / 20)
        corpus.append(
            (f"quiet_speech_{int(-level_db)}dB",
             synthesize_speech_clip(7) * g, True)
        )
    for snr_db in (20.0, 5.0):
        x = synthesize_speech_clip(8)
        n = rng.standard_normal(len(x)).astype(np.float32)
        n *= np.sqrt(np.mean(x**2) / 10 ** (snr_db / 10)) / np.std(n)
        corpus.append((f"speech_noise_{int(snr_db)}dB", x + n, True))
    corpus.append(("silence", np.zeros(2 * SR, np.float32), False))
    for level_db in (-60.0, -20.0, -6.0):
        g = 10 ** (level_db / 20)
        corpus.append(
            (f"white_noise_{int(-level_db)}dB",
             (g * rng.standard_normal(2 * SR)).astype(np.float32), False)
        )
    for f in (440.0, 1000.0, 3000.0):
        corpus.append(
            (f"tone_{int(f)}Hz",
             (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32), False)
        )
    chord = sum(np.sin(2 * np.pi * f * t) for f in (262.0, 330.0, 392.0))
    corpus.append(("chord", (chord / np.abs(chord).max()).astype(np.float32), False))
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
