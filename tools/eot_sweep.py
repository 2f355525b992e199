"""Frozen-key desync sweep: EOT view schedules x detection modes.

Round-2 left a tail on the UNCHANGED reference key: the 4-view EOT card
reads ts_0.9/ts_1.1 at 7.5-8.75% with plain detection
(EVAL_RESULTS_ROBUST.json) — the attack rates midway between the card's
views (0.8, 0.93, 1.08, 1.2).  This sweep measures, on one clip set:

  * view schedules: the shipped "all" card, denser "cycle" schedules
    (one rotating view per iteration, solver.py eot_mode), and weight
    variants;
  * detection modes: plain single-forward AND the compensation-search
    robust detector (service.robust) — the pairing the deployment would
    run when desync is in the threat model;
  * attacks: vocoder time-stretch at 0.8..1.2 including rates BETWEEN
    any card's views (generalization, not view-memorization), plus
    pitch-shift and clean.

Output: EOT_SWEEP.json (per-variant per-attack BER for both detect
modes, plus SNR).  Run on the chip; clips are the 2 s eval fixtures.

Run:  python tools/eot_sweep.py [--clips 8] [--variants base all_4 ...]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(ROOT))

ATTACK_RATES = (0.8, 0.85, 0.9, 0.95, 1.05, 1.1, 1.15, 1.2)

VARIANTS: dict[str, dict] = {
    # the round-2 shipped card (4 views, summed every iteration)
    "all_4": {"eot_stretch_rates": (0.8, 0.93, 1.08, 1.2),
              "eot_mode": "all", "eot_weight": 1.0},
    # dense 8-rate rotation at the same per-iteration cost as 1 extra view
    "cycle_8": {"eot_stretch_rates": (0.8, 0.85, 0.9, 0.95, 1.05, 1.1,
                                      1.15, 1.2),
                "eot_mode": "cycle", "eot_weight": 1.0},
    # same with stronger view weight (one-view gradients are noisier)
    "cycle_8_w2": {"eot_stretch_rates": (0.8, 0.85, 0.9, 0.95, 1.05, 1.1,
                                         1.15, 1.2),
                   "eot_mode": "cycle", "eot_weight": 2.0},
    # dense summed views (upper bound on schedule quality, ~2x all_4 cost)
    "all_8": {"eot_stretch_rates": (0.8, 0.85, 0.9, 0.95, 1.05, 1.1,
                                    1.15, 1.2),
              "eot_mode": "all", "eot_weight": 1.0},
    # no EOT control
    "base": {"eot_stretch_rates": (), "eot_mode": "all", "eot_weight": 1.0},
    # the cycle_8_w2 winner + pitch-shift views bracketing the ps_5 attack
    "cycle_ps": {"eot_stretch_rates": (0.8, 0.85, 0.9, 0.95, 1.05, 1.1,
                                       1.15, 1.2),
                 "eot_pitch_cents": (-5.0, 5.0),
                 "eot_mode": "cycle", "eot_weight": 2.0},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--variants", nargs="+", default=list(VARIANTS))
    ap.add_argument("--iterations", type=int, default=400)
    ap.add_argument("--no-robust", action="store_true")
    ap.add_argument("--out", default="EOT_SWEEP.json")
    args = ap.parse_args()

    import jax

    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update(
            "jax_compilation_cache_dir", str(ROOT / ".jax_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import jax.numpy as jnp

    from aware_tpu.attacks.vocoder import pitch_shift, time_stretch
    from aware_tpu.config import AwareConfig
    from aware_tpu.embed import embed_batch
    from aware_tpu.eval import synthesize_speech_clip
    from aware_tpu.models import init_params
    from aware_tpu.models.detector import detect_values_jit
    from aware_tpu.service.api import AWAREDetector
    from aware_tpu.service.robust import detect_watermark_robust

    on_tpu = jax.default_backend() != "cpu"
    cpu0 = jax.devices("cpu")[0]
    base = AwareConfig().replace(
        matmul_precision="default" if on_tpu else "highest",
        use_pallas_roundtrip=on_tpu,
        num_iterations=args.iterations,
    )
    params = {
        k: jnp.asarray(v) for k, v in init_params(base.detection_net).items()
    }
    det = AWAREDetector(params=params, cfg=base)

    rng = np.random.default_rng(args.seed)
    clips = np.stack(
        [synthesize_speech_clip(args.seed + 100 + i)
         for i in range(args.clips)]
    )
    bits = rng.integers(0, 2, (args.clips, 20)).astype(np.int32)
    wms = jnp.asarray((2 * bits - 1).astype(np.float32))
    clips_a = jnp.asarray(clips)

    def ber_row(values: np.ndarray, b: np.ndarray) -> float:
        return float(np.mean((values > 0).astype(int) != b)) * 100

    results: dict[str, dict] = {}
    for name in args.variants:
        vcfg = base.replace(**VARIANTS[name])
        t0 = time.time()
        res = embed_batch(params, clips_a, wms, vcfg)
        audio = np.asarray(res.audio)
        embed_s = time.time() - t0
        row: dict[str, float] = {"embed_s": round(embed_s, 1)}
        snrs = [
            10 * np.log10(
                np.mean(clips[i][: audio.shape[1]] ** 2)
                / np.mean((audio[i] - clips[i][: audio.shape[1]]) ** 2)
            )
            for i in range(args.clips)
        ]
        row["snr_db"] = round(float(np.mean(snrs)), 2)

        def attacked_set(x):
            out = {"clean": x}
            with jax.default_device(cpu0):
                for r in ATTACK_RATES:
                    out[f"ts_{r}"] = np.asarray(
                        time_stretch(jnp.asarray(x), r), np.float32
                    )
                out["ps_5"] = np.asarray(
                    pitch_shift(jnp.asarray(x), 5 / 100), np.float32
                )
            return out

        plain: dict[str, list[float]] = {}
        robust: dict[str, list[float]] = {}
        for i in range(args.clips):
            for att, x in attacked_set(audio[i]).items():
                v = np.asarray(detect_values_jit(params, jnp.asarray(x)))
                plain.setdefault(att, []).append(ber_row(v, bits[i]))
                if not args.no_robust:
                    rb = detect_watermark_robust(x, 16000, det)
                    robust.setdefault(att, []).append(
                        float(np.mean(rb != bits[i])) * 100
                    )
        row["plain"] = {k: round(float(np.mean(v)), 2)
                        for k, v in plain.items()}
        if robust:
            row["robust"] = {k: round(float(np.mean(v)), 2)
                             for k, v in robust.items()}
        results[name] = row
        print(json.dumps({name: row}), flush=True)
        (ROOT / args.out).write_text(json.dumps(results, indent=2) + "\n")

    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
