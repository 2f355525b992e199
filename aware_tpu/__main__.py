"""Command-line interface: embed / detect / eval / bench-info.

The reference has no CLI (its "API" is the import surface; SURVEY §1).
This adds one for operational use:

    python -m aware_tpu embed  in.wav out.wav --bits 1011... [--card turbo]
    python -m aware_tpu embed  in.wav out.wav --message 10110101 [--oneshot]
    python -m aware_tpu detect in.wav [--robust]
    python -m aware_tpu detect in.wav --message-k 8 [--robust]
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
    if args.message:
        # k-bit payload -> [20, k] soft-decision codeword (service/ecc.py);
        # decode with `detect --message-k K`
        from aware_tpu.service.ecc import encode_message

        msg = np.array([int(c) for c in args.message if c in "01"],
                       dtype=np.int32)
        bits = encode_message(msg)
        print(f"message k={len(msg)} -> codeword:",
              "".join(map(str, bits)))
    elif args.bits:
        bits = _parse_bits(args.bits, embedder.output_length)
    else:
        bits = np.random.default_rng(args.seed).integers(
            0, 2, embedder.output_length, dtype=np.int32
        )
        print("bits:", "".join(map(str, bits)))
    if args.oneshot:
        from aware_tpu.service import embed_watermark_oneshot

        if sr != embedder.cfg.detection_net.sample_rate:
            raise SystemExit(
                "one-shot embed operates at the model rate (16 kHz); "
                "resample the input or use the solver path"
            )
        out = np.asarray(
            embed_watermark_oneshot(audio, sr, bits, embedder,
                                    variant=args.variant)
        )
    else:
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
    elif args.message_k:
        import json

        if args.robust:
            from aware_tpu.service.ecc import detect_message_robust

            res, kind, rate = detect_message_robust(
                audio, sr, detector, k=args.message_k,
                identity_margin=args.identity_margin,
            )
            extra = {"lane": kind, "rate": rate}
        else:
            from aware_tpu.service.ecc import detect_message

            res = detect_message(audio, sr, detector, k=args.message_k)
            extra = {}
        print(json.dumps({
            "message": "".join(map(str, np.asarray(res.msg_bits))),
            "margin": float(res.margin),
            "pvalue": float(res.pvalue),
            **extra,
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

    attacks = None
    if args.extended:
        from aware_tpu.attacks.voice_codecs import extended_attack_suite

        attacks = extended_attack_suite()
    model = _load(args.card) if args.card else None
    results = run_robustness_eval(
        args.audio_dir, args.clips, args.seed, attacks=attacks,
        model=model, robust=args.robust_detect,
    )
    print(json.dumps(results, indent=2))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="aware_tpu", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("embed", help="embed a watermark into a WAV file")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--bits", help="bit string, e.g. 10110... (random if omitted)")
    p.add_argument("--message",
                   help="k-bit payload (k<=8) encoded through the [20,k] "
                        "soft-decision ECC instead of raw slot bits; decode "
                        "with `detect --message-k K`")
    p.add_argument("--oneshot", action="store_true",
                   help="single-forward-pass amortized embed (~1726 "
                        "clips/s; ~3%% slot BER vs the solver's 0%%) — "
                        "pair with --message, whose code absorbs that")
    p.add_argument("--variant", default="default",
                   help="one-shot bundle variant (service/fast.py "
                        "_VARIANTS)")
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
    p.add_argument("--message-k", type=int, default=None,
                   help="ML-decode a k-bit ECC payload (prints JSON with "
                        "margin + presence p-value); combine with --robust "
                        "for the desync compensation grid")
    p.add_argument("--identity-margin", type=float, default=1.0,
                   help="lane guard for --robust --message-k: keep 1.0 for "
                        "solver-strength marks, use 1.9 for weak one-shot "
                        "marks (measured: ECC_ONESHOT_DESYNC*.json)")
    p.add_argument("--card", default=None)
    p.set_defaults(fn=cmd_detect)

    p = sub.add_parser("eval", help="run the robustness attack suite")
    p.add_argument("audio_dir", nargs="?", default=None)
    p.add_argument("--clips", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--extended", action="store_true",
                   help="add the real-codec rows (Opus/GSM/AAC/Vorbis/"
                        "Speex/G.722/soxr) beyond the reference's "
                        "22-attack suite")
    p.add_argument("--card", default=None,
                   help="config card: bare packaged name (robust/"
                        "compression/voice/turbo/desync) or YAML path")
    p.add_argument("--robust-detect", action="store_true",
                   help="detect through the rate-search compensation "
                        "detector")
    p.set_defaults(fn=cmd_eval)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
