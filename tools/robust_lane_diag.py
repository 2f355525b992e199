"""Diagnose the robust-detect lane selection on weak (one-shot) marks.

For a few one-shot embedded clips under each desync attack, print the
per-lane confidence AND per-lane BER so we can see whether the correct
compensation lane (a) recovers bits and (b) wins the confidence argmax.
Feeds the identity-margin / score-normalization calibration
(VERDICT round 4, weak #2).

Run: python tools/robust_lane_diag.py [--clips 4] -> ROBUST_LANE_DIAG.json
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
    ap.add_argument("--clips", type=int, default=4)
    ap.add_argument("--variant", default="diverse_tol2")
    ap.add_argument("--seed", type=int, default=900)
    ap.add_argument("--cpu", action="store_true", default=True)
    ap.add_argument("--out", default="ROBUST_LANE_DIAG.json")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from aware_tpu.attacks.attacks import TimeStretch, PitchShift
    from aware_tpu.config import AwareConfig
    from aware_tpu.eval import synthesize_speech_clip
    from aware_tpu.models import init_params
    from aware_tpu.service.fast import _VARIANTS, _load_amortized
    from aware_tpu.service.robust import (
        DEFAULT_RATES,
        DEFAULT_STRETCH_RATES,
        robust_values,
        robust_values_split,
    )
    from aware_tpu.service.api import AWAREDetector
    from aware_tpu.train import amortized_embed

    cfg = AwareConfig()
    _, tol = _VARIANTS[args.variant]
    if tol is not None:
        cfg = cfg.replace(tolerance_db=tol)
    d_params = {k: jnp.asarray(v)
                for k, v in init_params(cfg.detection_net).items()}
    e_params = _load_amortized(args.variant)
    det = AWAREDetector(params=d_params, cfg=cfg)
    sr = cfg.detection_net.sample_rate

    lanes = [("resample", r) for r in DEFAULT_RATES] + [
        ("stretch", r) for r in DEFAULT_STRETCH_RATES
    ]
    attacks = {
        "none": lambda x, k: x,
        "ts_0.9": lambda x, k: TimeStretch(0.9).apply(x, sr, key=k),
        "ts_1.1": lambda x, k: TimeStretch(1.1).apply(x, sr, key=k),
        "ts_1.2": lambda x, k: TimeStretch(1.2).apply(x, sr, key=k),
        "ps_5": lambda x, k: PitchShift(5).apply(x, sr, key=k),
    }

    rng = np.random.default_rng(args.seed)
    out: dict = {"lanes": [f"{k}:{r}" for k, r in lanes], "rows": []}
    # also: per-lane confidence on UNMARKED audio (the lane null)
    null_conf = []
    for i in range(args.clips):
        clip = synthesize_speech_clip(args.seed + i)
        bits = rng.integers(0, 2, 20).astype(np.int32)
        pattern = (2 * bits - 1).astype(np.float32)
        wm = np.asarray(
            amortized_embed(e_params, d_params, clip, pattern, cfg)
        ).astype(np.float32)
        vals_null = robust_values(det, clip[: len(wm)],
                                  rates=DEFAULT_RATES,
                                  stretch_rates=DEFAULT_STRETCH_RATES)
        null_conf.append(np.mean(np.abs(vals_null), axis=1))
        for name, fn in attacks.items():
            attacked = np.asarray(fn(wm, args.seed * 7 + i),
                                  np.float32)
            sv = robust_values_split(det, attacked, rates=DEFAULT_RATES,
                                     stretch_rates=DEFAULT_STRETCH_RATES)
            vals = sv[:, 0]  # full-clip readout per lane
            conf = np.mean(np.abs(vals), axis=1)
            ber = np.mean((vals > 0).astype(np.int32) != bits[None, :],
                          axis=1) * 100
            out["rows"].append({
                "clip": i, "attack": name,
                "conf": [round(float(c), 4) for c in conf],
                "values": np.round(sv, 5).tolist(),  # (H, 3, bits) raw
                "bits": bits.tolist(),
                "ber": [round(float(b), 1) for b in ber],
                "argmax_lane": out["lanes"][int(np.argmax(conf))],
                "best_ber_lane": out["lanes"][int(np.argmin(ber))],
                "identity_ber": float(ber[lanes.index(("resample", 1.0))]),
                "argmax_ber": float(ber[int(np.argmax(conf))]),
                "best_ber": float(np.min(ber)),
            })
            print(out["rows"][-1]["attack"], "argmax", out["rows"][-1]["argmax_lane"],
                  "ber@argmax", out["rows"][-1]["argmax_ber"],
                  "ident", out["rows"][-1]["identity_ber"],
                  "best", out["rows"][-1]["best_ber"],
                  out["rows"][-1]["best_ber_lane"], flush=True)
    out["null_conf_mean"] = [
        round(float(c), 4) for c in np.mean(np.stack(null_conf), axis=0)
    ]
    out["null_conf_std"] = [
        round(float(c), 4) for c in np.std(np.stack(null_conf), axis=0)
    ]
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
