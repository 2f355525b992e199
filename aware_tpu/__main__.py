"""Command-line interface: embed / detect / eval / bench-info.

The reference has no CLI (its "API" is the import surface; SURVEY §1).
This adds one for operational use:

    python -m aware_tpu embed  in.wav out.wav --bits 1011... [--card turbo]
    python -m aware_tpu detect in.wav [--robust]
    python -m aware_tpu eval   [audio_dir] --clips 4
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _parse_bits(s: str, n: int) -> np.ndarray:
    bits = np.array([int(c) for c in s if c in "01"], dtype=np.int32)
    if len(bits) != n:
        raise SystemExit(f"expected {n} bits, got {len(bits)}")
    return bits


def _load(card: str | None):
    from aware_tpu import load

    if card and not card.endswith((".yaml", ".yml")):
        import pathlib

        named = pathlib.Path(__file__).parent / "cards" / f"{card}.yaml"
        if not named.exists():
            names = sorted(p.stem for p in named.parent.glob("*.yaml"))
            raise SystemExit(f"unknown card {card!r}; available: {names}")
        card = str(named)
    return load(card=card)


def cmd_embed(args) -> None:
    from aware_tpu import embed_watermark
    from aware_tpu.utils.io import read_wav, write_wav

    embedder, _ = _load(args.card)
    audio, sr = read_wav(args.input)
    if args.bits:
        bits = _parse_bits(args.bits, embedder.output_length)
    else:
        bits = np.random.default_rng(args.seed).integers(
            0, 2, embedder.output_length, dtype=np.int32
        )
        print("bits:", "".join(map(str, bits)))
    out = embed_watermark(audio, sr, bits, embedder)
    write_wav(args.output, out, sr)
    print(f"wrote {args.output} ({out.shape[0]} samples @ {sr} Hz)")


def cmd_detect(args) -> None:
    from aware_tpu import detect_watermark
    from aware_tpu.service import detect_watermark_robust
    from aware_tpu.utils.io import read_wav

    _, detector = _load(args.card)
    audio, sr = read_wav(args.input)
    if args.streaming:
        import json

        from aware_tpu.service.streaming import StreamingDetector

        sd = StreamingDetector(
            detector,
            window_seconds=args.window,
            hop_seconds=args.win_hop,
        )
        res = sd.detect(audio, sr)
        print(json.dumps({
            "detected": res.detected,
            "threshold": res.threshold,
            "segments": [
                {
                    "start_s": s.start_seconds,
                    "end_s": s.end_seconds,
                    "confidence": s.confidence,
                    "n_windows": s.n_windows,
                    "bit_agreement": s.bit_agreement,
                    "bits": "".join(map(str, np.asarray(s.bits).astype(int))),
                }
                for s in res.segments
            ],
            "rejected_segments": res.rejected_segments,
        }, indent=2))
    elif args.robust:
        res = detect_watermark_robust(
            audio, sr, detector, return_confidence=True
        )
        print(
            f"bits: {''.join(map(str, res.bits))}  "
            f"({res.kind} rate {res.rate}, conf {res.confidence:.3f})"
        )
    else:
        bits = detect_watermark(audio, sr, detector)
        print("bits:", "".join(map(str, np.asarray(bits).astype(int))))


def cmd_eval(args) -> None:
    import json

    from aware_tpu.eval import run_robustness_eval

    results = run_robustness_eval(args.audio_dir, args.clips, args.seed)
    print(json.dumps(results, indent=2))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="aware_tpu", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("embed", help="embed a watermark into a WAV file")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--bits", help="bit string, e.g. 10110... (random if omitted)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--card", default=None, help="config card path or 'turbo'")
    p.set_defaults(fn=cmd_embed)

    p = sub.add_parser("detect", help="detect a watermark in a WAV file")
    p.add_argument("input")
    p.add_argument("--streaming", action="store_true",
                   help="sliding-window localization over a long file "
                        "(prints JSON segments)")
    p.add_argument("--window", type=float, default=2.0,
                   help="streaming window seconds")
    p.add_argument("--win-hop", type=float, default=1.0,
                   help="streaming window hop seconds")
    p.add_argument("--robust", action="store_true",
                   help="speed-change-robust rate search")
    p.add_argument("--card", default=None)
    p.set_defaults(fn=cmd_detect)

    p = sub.add_parser("eval", help="run the robustness attack suite")
    p.add_argument("audio_dir", nargs="?", default=None)
    p.add_argument("--clips", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_eval)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
