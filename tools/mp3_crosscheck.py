"""Cross-check the in-graph MP3 approximation against real ffmpeg/lame.

The robustness suite's mp3_* rows use aware_tpu.attacks.codec.mp3_approx
(a differentiable MDCT/scalefactor-band model).  Whether those rows
transfer to REAL MP3 can only be measured against a real encoder — which
this offline image does not have.  This tool:

  * exits loudly (code 3) when ffmpeg is absent, so its absence is a
    recorded fact rather than silence;
  * where ffmpeg exists: for each quality level, encodes watermarked
    clips with ``ffmpeg -codec:a libmp3lame -q:a N``, decodes back,
    aligns (the codec adds encoder delay), and compares
      - watermark BER through the real codec vs through the approximation,
      - noise power the two codecs inject (SNR of attacked vs original),
    writing MP3_CROSSCHECK.json.

Run:  python tools/mp3_crosscheck.py [--clips 4]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import shutil
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

SR = 16000
QUALITIES = (0, 2, 5, 9)


def _ffmpeg_roundtrip(ffmpeg: str, x: np.ndarray, quality: int) -> np.ndarray:
    from aware_tpu.utils.io import read_wav, write_wav

    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        write_wav(str(td / "in.wav"), x, SR, bits=16)
        subprocess.run(
            [ffmpeg, "-y", "-loglevel", "error", "-i", str(td / "in.wav"),
             "-codec:a", "libmp3lame", "-q:a", str(quality),
             str(td / "out.mp3")],
            check=True,
        )
        subprocess.run(
            [ffmpeg, "-y", "-loglevel", "error", "-i", str(td / "out.mp3"),
             "-ar", str(SR), str(td / "dec.wav")],
            check=True,
        )
        y, sr = read_wav(str(td / "dec.wav"))
        assert sr == SR
        if y.ndim == 2:
            y = y.mean(axis=1)
    # encoder delay alignment by cross-correlation
    n = min(len(x), len(y))
    corr = np.correlate(y[: n], x[: n], mode="full")
    lag = int(np.argmax(corr)) - (n - 1)
    if lag > 0:
        y = y[lag:]
    elif lag < 0:
        y = np.concatenate([np.zeros(-lag, y.dtype), y])
    n = min(len(x), len(y))
    return y[:n].astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=4)
    args = ap.parse_args()

    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        print(
            "=" * 70 + "\n"
            "SKIPPED: ffmpeg is not available in this image.\n"
            "The mp3_* robustness rows are measured against the in-graph\n"
            "approximation only; re-run this tool in an environment with\n"
            "ffmpeg/libmp3lame to ground them against the real codec.\n"
            + "=" * 70
        )
        raise SystemExit(3)

    import jax.numpy as jnp

    from aware_tpu import detect_watermark, embed_watermark, load
    from aware_tpu.attacks.codec import mp3_approx
    from aware_tpu.eval.harness import synthesize_speech_clip
    from aware_tpu.metrics import ber, snr

    embedder, detector = load()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(args.clips):
        clip = synthesize_speech_clip(i)
        bits = rng.integers(0, 2, 20, dtype=np.int32)
        wm = embed_watermark(clip, SR, bits, embedder)
        for q in QUALITIES:
            real = _ffmpeg_roundtrip(ffmpeg, wm, q)
            approx = np.asarray(mp3_approx(jnp.asarray(wm), SR, q))
            rows.append({
                "clip": i, "quality": q,
                "ber_real": ber(bits, detect_watermark(real, SR, detector)),
                "ber_approx": ber(bits, detect_watermark(approx, SR, detector)),
                "snr_real_db": snr(real, wm[: len(real)]),
                "snr_approx_db": snr(approx, wm),
            })
            print(rows[-1], flush=True)
    by_q = {
        q: {
            "ber_real": float(np.mean([r["ber_real"] for r in rows if r["quality"] == q])),
            "ber_approx": float(np.mean([r["ber_approx"] for r in rows if r["quality"] == q])),
            "snr_real_db": float(np.mean([r["snr_real_db"] for r in rows if r["quality"] == q])),
            "snr_approx_db": float(np.mean([r["snr_approx_db"] for r in rows if r["quality"] == q])),
        }
        for q in QUALITIES
    }
    out = {"per_quality": by_q, "rows": rows}
    path = pathlib.Path(__file__).parent.parent / "MP3_CROSSCHECK.json"
    path.write_text(json.dumps(out, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
