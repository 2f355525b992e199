"""Attack-suite robustness of the ONE-SHOT (amortized) embed path.

The solver path's robustness cards live in EVAL_RESULTS*.json; this tool
records the same per-attack BER table for the single-forward-pass
amortized embedder (the 1726 clips/s path), which until round 4 only had
clean-BER evidence (AMORTIZED_EVAL.json).  No reference counterpart —
the reference has no amortized embedder at all.

Run:  python tools/oneshot_robustness.py [--variant diverse_tol2]
          [--clips 12] [--cpu]  ->  ONESHOT_ROBUSTNESS.json
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="diverse_tol2")
    ap.add_argument("--clips", type=int, default=12)
    ap.add_argument("--seed", type=int, default=900,
                    help="held-out clip seed base (matches the gate eval)")
    ap.add_argument("--families", nargs="+",
                    default=["speech", "diverse"])
    ap.add_argument("--out", default="ONESHOT_ROBUSTNESS.json")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--robust-detect", action="store_true",
                    help="detect every row with the desync compensation "
                         "search (service/robust.py) instead of plain "
                         "detection — closes the ts_*/ps_5 rows the same "
                         "way it does for the solver path")
    ap.add_argument("--identity-margin", type=float, default=1.9,
                    help="identity-lane preference margin for "
                         "--robust-detect (one-shot marks are weak; a "
                         "pure argmax can mis-lock on spurious lanes — "
                         "calibrated in ROBUST_LANE_DIAG.json: genuine "
                         "desync clears 2.3x, spurious lanes stay <1.6x)")
    args = ap.parse_args()

    if args.robust_detect and args.out == "ONESHOT_ROBUSTNESS.json":
        args.out = "ONESHOT_ROBUSTNESS_ROBUST_DETECT.json"

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from aware_tpu.attacks.voice_codecs import extended_attack_suite
    from aware_tpu.config import AwareConfig
    from aware_tpu.eval import synthesize_speech_clip
    from aware_tpu.models import detect_values, init_params
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
    attacks = extended_attack_suite()
    sr = cfg.detection_net.sample_rate

    if args.robust_detect:
        from aware_tpu.service.api import AWAREDetector
        from aware_tpu.service.robust import detect_watermark_robust

        det = AWAREDetector(params=d_params, cfg=cfg)

        def detect_bits(a: np.ndarray) -> np.ndarray:
            return np.asarray(
                detect_watermark_robust(
                    np.asarray(a, np.float32), sr, det,
                    identity_margin=args.identity_margin,
                )
            ).astype(np.int32)
    else:

        def detect_bits(a: np.ndarray) -> np.ndarray:
            v = np.asarray(detect_values(d_params, jnp.asarray(a)))
            return (v > 0).astype(np.int32)

    result: dict = {"variant": args.variant, "tolerance_db": tol,
                    "clips": args.clips, "families": {}}
    if args.robust_detect:
        result["robust_detect"] = True
        result["identity_margin"] = args.identity_margin
    for family in args.families:
        rng = np.random.default_rng(args.seed)
        rec: dict[str, list[float]] = {"clean": [], "snr_db": []}
        for i in range(args.clips):
            clip = (synthesize_speech_clip(args.seed + i)
                    if family == "speech" else diverse_clip(args.seed + i))
            bits = rng.integers(0, 2, 20).astype(np.int32)
            pattern = (2 * bits - 1).astype(np.float32)
            wm = np.asarray(
                amortized_embed(e_params, d_params, clip, pattern, cfg)
            ).astype(np.float32)
            rec["clean"].append(
                float(np.mean(detect_bits(wm) != bits)) * 100
            )
            ref = clip[: len(wm)]
            rec["snr_db"].append(float(10 * np.log10(
                np.mean(ref ** 2) / (np.mean((wm - ref) ** 2) + 1e-12))))
            for j, attack in enumerate(attacks):
                attacked = np.asarray(attack.apply(
                    wm, sr, key=args.seed * 10007 + i * 101 + j
                ), dtype=np.float32)
                rec.setdefault(attack.name, []).append(
                    float(np.mean(detect_bits(attacked) != bits)) * 100)
        result["families"][family] = {
            k: round(float(np.mean(vs)), 2) for k, vs in rec.items()
        }
        print(family, "done", flush=True)

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
