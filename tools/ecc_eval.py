"""Message-level ECC eval on the real attack channel.

For each clip: draw a random k-bit message, encode through the [20, k]
soft-decision code (service/ecc.py), embed the codeword with the normal
solver path, then for every selected attack row decode the message from
the raw detector values and record message success, raw slot BER, and
the decode margin.  This measures what the ECC layer buys at the
extreme-compression operating points where raw slot BER is 15-25%
(VERDICT round-4 frontier): the system-level metric a user cares about
is "did the k-bit payload survive", not per-slot BER.

Run:  python tools/ecc_eval.py --cpu --card compression --clips 6 --k 8 \
          --rows identity opus_8k opus_16k gsm_fr speex_wb aac_32k g722
Writes ECC_EVAL.json.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--clips", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--k", type=int, nargs="+", default=[8])
    ap.add_argument("--card", default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--rows", nargs="+", default=None,
        help="attack-name substrings to keep (default: identity + the "
             "real low-bitrate codec rows)",
    )
    ap.add_argument("--out", default="ECC_EVAL.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from aware_tpu.attacks.voice_codecs import extended_attack_suite
    from aware_tpu.eval.harness import _load_clips
    from aware_tpu.metrics import ber, snr
    from aware_tpu.service.api import embed_watermark, load
    from aware_tpu.service.ecc import get_code

    rows = args.rows or [
        "identity", "opus_8", "opus_16", "gsm", "speex", "aac_32", "g722",
        "mp3",
    ]
    suite = [
        a for a in extended_attack_suite()
        if any(r in a.name for r in rows)
    ]
    # identity row = clean detection (no attack object needed)
    embedder, detector = load(args.card)
    clips = _load_clips(None, args.clips, args.seed, 16000)
    rng = np.random.default_rng(args.seed)

    results: dict = {"card": args.card or "default", "clips": args.clips}
    for k in args.k:
        code = get_code(k, embedder.output_length)
        rec: dict[str, dict[str, list[float]]] = {}

        def note(row: str, okay: bool, raw: float, margin: float) -> None:
            r = rec.setdefault(
                row, {"msg_ok": [], "raw_ber": [], "margin": []}
            )
            r["msg_ok"].append(float(okay))
            r["raw_ber"].append(raw)
            r["margin"].append(margin)

        snrs = []
        for i, audio in enumerate(clips):
            msg = rng.integers(0, 2, size=k, dtype=np.int32)
            slots = code.encode(msg)
            wm = embed_watermark(audio, 16000, slots, embedder)
            snrs.append(snr(wm, audio[: len(wm)]))

            def decode_row(row: str, x: np.ndarray) -> None:
                values = detector.detect(
                    np.asarray(x, dtype=np.float32), 16000
                )
                res = code.decode(values)
                note(
                    row,
                    bool((res.msg_bits == msg).all()),
                    ber(slots, (values > 0).astype(np.int32)),
                    res.margin,
                )

            decode_row("identity", wm)
            for j, attack in enumerate(suite):
                with jax.default_device(jax.devices("cpu")[0]):
                    attacked = attack.apply(
                        wm, 16000, key=args.seed * 10007 + i * 101 + j
                    )
                decode_row(attack.name, np.asarray(attacked))
            print(f"k={k} clip {i + 1}/{len(clips)} done", flush=True)

        results[f"k={k}"] = {
            "code": {"n": code.n, "k": code.k, "d_min": code.d_min},
            "snr_db": float(np.mean(snrs)),
            "rows": {
                row: {
                    "msg_success_pct": 100.0 * float(np.mean(v["msg_ok"])),
                    "raw_slot_ber_pct": float(np.mean(v["raw_ber"])),
                    "mean_margin": float(np.mean(v["margin"])),
                }
                for row, v in rec.items()
            },
        }

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
