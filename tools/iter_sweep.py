"""Iteration-count sweep over the attack suite -> ITER_SWEEP.json.

The evidence behind the turbo card (cards/turbo.yaml): how does BER /
perceptual quality move as the solver's iteration budget shrinks from the
reference's 400?  Runs the full 22-attack suite at each budget on the
current embed path and records non-desync and desync BER separately
(desync is iteration-independent by mechanism — the mark's time base is
destroyed regardless of how well it was optimized).

Run: python tools/iter_sweep.py [--iters 25 50 100 200 400] [--clips 4]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

ROOT = pathlib.Path(__file__).parent.parent


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, nargs="+",
                    default=[25, 50, 100, 200, 400])
    ap.add_argument("--clips", type=int, default=4)
    args = ap.parse_args()

    from aware_tpu.eval.harness import run_robustness_eval
    from aware_tpu.service.api import load

    out: dict[str, dict] = {}
    for n in args.iters:
        model = load(num_iterations=n)
        res = dict(run_robustness_eval(n_clips=args.clips, model=model))
        nond = [v for k, v in res.items()
                if k.startswith("ber:") and not any(
                    t in k for t in ("ts_", "ps_"))]
        des = [v for k, v in res.items()
               if k.startswith("ber:") and any(t in k for t in ("ts_", "ps_"))]
        out[str(n)] = {
            "mean_nondesync_ber": sum(nond) / len(nond),
            "max_nondesync_ber": max(nond),
            "mean_desync_ber": sum(des) / len(des),
            "clean_ber": res["clean_ber"],
            "pesq": res["pesq"],
            "stoi": res["stoi"],
        }
        print(n, json.dumps(out[str(n)]), flush=True)

    (ROOT / "ITER_SWEEP.json").write_text(json.dumps(out, indent=2) + "\n")
    print("wrote ITER_SWEEP.json")


if __name__ == "__main__":
    main()
