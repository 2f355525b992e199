"""Cross-check the in-graph MP3 approximation against the REAL codec.

The robustness suite's mp3_* rows historically used
aware_tpu.attacks.codec.mp3_approx (a differentiable MDCT/scalefactor-band
model) because the image has no ffmpeg.  Round 4 found the actual codec
libraries in the image — libmp3lame.so.0 (the encoder ffmpeg would use)
and libmpg123.so.0 — and binds them in-process
(aware_tpu/attacks/mp3_real.py).  This tool grounds the approximation:

  * for each LAME VBR quality level, round-trips watermarked clips
    through the REAL codec and through the approximation, comparing
      - watermark BER through each path,
      - injected-noise SNR of each path,
    writing MP3_CROSSCHECK.json;
  * exits loudly (code 3) when the codec libraries are missing, so
    absence is a recorded fact rather than silence.

Quality mapping matches the reference's ``ffmpeg -q:a N``
(reference: scripts/attacks.py:125-127): LAME VBR quality N.

Run:  python tools/mp3_crosscheck.py [--clips 4] [--cpu]
(--cpu forces the CPU backend — required when the axon tunnel is down;
embeds are the full 400-iteration solver, ~35 s/clip on one CPU core.)
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

SR = 16000
QUALITIES = (0, 2, 5, 9)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from aware_tpu.attacks.mp3_real import available, mp3_roundtrip

    if not available():
        print(
            "=" * 70 + "\n"
            "SKIPPED: libmp3lame/libmpg123 are not available in this image.\n"
            "The mp3_* robustness rows are measured against the in-graph\n"
            "approximation only; re-run this tool in an environment with\n"
            "the codec libraries to ground them against the real codec.\n"
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
            real = mp3_roundtrip(wm, SR, quality=float(q))
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
    out = {
        "codec": "libmp3lame.so.0 encode + libmpg123.so.0 decode, in-process",
        "per_quality": by_q,
        "rows": rows,
    }
    path = pathlib.Path(__file__).parent.parent / "MP3_CROSSCHECK.json"
    path.write_text(json.dumps(out, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
