"""Run the robustness eval harness for one card -> a JSON artifact.

Thin CLI over aware_tpu.eval.run_robustness_eval so eval artifacts
(EVAL_RESULTS*.json) are regenerated reproducibly:

    python tools/run_harness.py --out EVAL_RESULTS.json
    python tools/run_harness.py --card robust --out EVAL_RESULTS_ROBUST.json
    python tools/run_harness.py --card robust --robust-detect \
        --out EVAL_RESULTS_ROBUST_DETECT.json

--robust-detect routes every detection through the compensation-search
detector (service.robust) — the deployment mode when desync edits are in
the threat model (round-2 VERDICT item 4 asked for recorded rows).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--card", default=None,
                    help="card name under aware_tpu/cards (e.g. robust, "
                         "turbo, desync) or a yaml path; default card if "
                         "omitted")
    ap.add_argument("--clips", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--robust-detect", action="store_true")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update(
            "jax_compilation_cache_dir", str(ROOT / ".jax_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from aware_tpu.eval.harness import run_robustness_eval
    from aware_tpu.service.api import load

    card = args.card
    if card and not card.endswith(".yaml"):
        card = str(ROOT / "aware_tpu" / "cards" / f"{card}.yaml")
    model = load(card) if card else load()
    results = dict(
        run_robustness_eval(
            n_clips=args.clips,
            seed=args.seed,
            model=model,
            robust=args.robust_detect,
        )
    )
    results["_meta"] = {
        "card": args.card or "default",
        "clips": args.clips,
        "seed": args.seed,
        "robust_detect": bool(args.robust_detect),
        "kernel_path": bool(model[0].cfg.use_pallas_roundtrip),
    }
    (ROOT / args.out).write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
