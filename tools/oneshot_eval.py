"""Quick one-shot BER/SNR eval of an amortized bundle on held-out clips.

The per-segment gate for the margin training chain: one-shot metrics only
(no warm/cold solver grid — that lives in tools/train_amortized.py
--eval-only), so a 12-clip diverse eval takes ~1 min on CPU.

Run:  python tools/oneshot_eval.py --bundle aware_tpu/models/_key/X.npz \
          --family diverse --clips 12 [--tolerance-db 3]
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

from aware_tpu.config import AwareConfig  # noqa: E402
from aware_tpu.models import detect_values, init_params  # noqa: E402
from aware_tpu.train import amortized_embed  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bundle", required=True)
    ap.add_argument("--family", choices=("speech", "diverse"),
                    default="diverse")
    ap.add_argument("--clips", type=int, default=12)
    ap.add_argument("--seed", type=int, default=900,
                    help="held-out clip seed base (900 matches the "
                         "train_amortized.py eval_state held-out set)")
    ap.add_argument("--tolerance-db", type=float, default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from aware_tpu.eval import synthesize_speech_clip
    from aware_tpu.train.distill import diverse_clip

    cfg = AwareConfig()
    if args.tolerance_db is not None:
        cfg = cfg.replace(tolerance_db=args.tolerance_db)
    d_params = {k: jnp.asarray(v)
                for k, v in init_params(cfg.detection_net).items()}
    with np.load(args.bundle) as z:
        e_params = {k: jnp.asarray(z[k]) for k in z.files}

    rng = np.random.default_rng(args.seed)
    bers, snrs = [], []
    for i in range(args.clips):
        clip = (synthesize_speech_clip(args.seed + i)
                if args.family == "speech" else diverse_clip(args.seed + i))
        bits = rng.integers(0, 2, 20).astype(np.int32)
        wm = (2 * bits - 1).astype(np.float32)
        out = amortized_embed(e_params, d_params, clip, wm, cfg)
        v = np.asarray(detect_values(d_params, jnp.asarray(out)))
        bers.append(float(np.mean((v > 0).astype(int) != bits)) * 100)
        ref = clip[: len(out)]
        snrs.append(10 * np.log10(
            np.mean(ref ** 2) / (np.mean((out - ref) ** 2) + 1e-12)))

    result = {
        "bundle": args.bundle,
        "family": args.family,
        "clips": args.clips,
        "tolerance_db": args.tolerance_db,
        "one_shot_ber": float(np.mean(bers)),
        "one_shot_snr_db": float(np.mean(snrs)),
        "per_clip_ber": [round(b, 1) for b in bers],
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
