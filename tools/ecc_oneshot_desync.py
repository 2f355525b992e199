"""Message-level desync robustness of the ONE-SHOT embed path.

The one-shot (amortized) embedder's open weakness is desync: raw slot
BER 13-20% under time-stretch/pitch attacks, and bit-mode robust
detection cannot help because weak one-shot marks lose the lane vote
(ONESHOT_ROBUSTNESS_ROBUST_DETECT.json == plain).  This measures the
SYSTEM-level question instead: does a k-bit payload survive one-shot +
desync when decoded with the codebook-constrained ML lane selector
(service/ecc.py detect_message_robust), whose z-statistic is a much
sharper lane vote than bit-mode mean |values|?

For each clip: random k-bit message -> [20,k] codeword -> one-shot
embed (diverse_tol2 bundle) -> attack -> decode with (a) plain ML
(identity lane only) and (b) the robust compensation grid.  Reports
per-row message success for both decoders.

Run:  python tools/ecc_oneshot_desync.py --cpu [--clips 8] [--k 4 8]
Writes ECC_ONESHOT_DESYNC.json.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

ROW_NAMES = ("ts_0.8", "ts_0.9", "ts_1.1", "ts_1.2", "ps_5", "opus_8k")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--clips", type=int, default=8)
    ap.add_argument("--seed", type=int, default=900,
                    help="held-out clip seed base (matches the gate eval)")
    ap.add_argument("--k", type=int, nargs="+", default=[4, 8])
    ap.add_argument("--variant", default="diverse_tol2")
    ap.add_argument("--families", nargs="+", default=["speech", "diverse"])
    ap.add_argument("--identity-margin", type=float, default=1.0,
                    help="message-mode lane guard (the codebook z-stat "
                         "selector is sharp enough that 1.0 = pure argmax "
                         "is the intended operating point; see "
                         "service/ecc.py _best_lane)")
    ap.add_argument("--out", default="ECC_ONESHOT_DESYNC.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from aware_tpu.attacks.voice_codecs import extended_attack_suite
    from aware_tpu.config import AwareConfig
    from aware_tpu.eval import synthesize_speech_clip
    from aware_tpu.models import init_params
    from aware_tpu.service.api import AWAREDetector
    from aware_tpu.service.ecc import (decode_message,
                                       detect_message_robust, get_code)
    from aware_tpu.service.fast import _VARIANTS, _load_amortized
    from aware_tpu.train import amortized_embed
    from aware_tpu.train.distill import diverse_clip

    cfg = AwareConfig()
    _, tol = _VARIANTS[args.variant]
    if tol is not None:
        cfg = cfg.replace(tolerance_db=tol)
    d_params = {k: jnp.asarray(v)
                for k, v in init_params(cfg.detection_net).items()}
    e_params = _load_amortized(args.variant)
    det = AWAREDetector(params=d_params, cfg=cfg)
    sr = cfg.detection_net.sample_rate
    attacks = {a.name: a for a in extended_attack_suite()
               if a.name in ROW_NAMES}

    result: dict = {"variant": args.variant, "clips": args.clips,
                    "identity_margin": args.identity_margin,
                    "families": args.families}
    for k in args.k:
        code = get_code(k, 20)
        rec: dict[str, dict[str, list[float]]] = {}

        def note(row: str, dec: str, okay: bool) -> None:
            rec.setdefault(row, {}).setdefault(dec, []).append(float(okay))

        for family in args.families:
            rng = np.random.default_rng(args.seed + 7 * k)
            for i in range(args.clips):
                clip = (synthesize_speech_clip(args.seed + i)
                        if family == "speech"
                        else diverse_clip(args.seed + i))
                msg = rng.integers(0, 2, size=k, dtype=np.int32)
                slots = code.encode(msg)
                wm = np.asarray(amortized_embed(
                    e_params, d_params, clip,
                    (2 * slots - 1).astype(np.float32), cfg
                )).astype(np.float32)

                def decode_both(row: str, x: np.ndarray) -> None:
                    vals = det.detect(np.asarray(x, np.float32), sr)
                    plain = decode_message(vals, k, n_slots=20)
                    note(row, "plain_ml", bool(
                        (plain.msg_bits == msg).all()))
                    robust, kind, rate = detect_message_robust(
                        x, sr, det, k,
                        identity_margin=args.identity_margin)
                    note(row, "robust_ml", bool(
                        (robust.msg_bits == msg).all()))

                decode_both("identity", wm)
                for j, (name, attack) in enumerate(sorted(attacks.items())):
                    a = np.asarray(attack.apply(
                        wm, sr, key=args.seed * 10007 + i * 101 + j
                    ), dtype=np.float32)
                    decode_both(name, a)
                print(f"k={k} {family} clip {i + 1}/{args.clips} done",
                      flush=True)

        result[f"k={k}"] = {
            "code": {"n": code.n, "k": code.k, "d_min": code.d_min},
            "rows": {
                row: {dec: 100.0 * float(np.mean(v))
                      for dec, v in decs.items()}
                for row, decs in rec.items()
            },
        }
        print(json.dumps(result[f"k={k}"], indent=1), flush=True)

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
