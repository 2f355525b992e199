"""Batch-size sweep of the driver benchmark -> BENCH_SWEEP.json.

Runs the bench.py pipeline at B in {16, 64, 128, 256} on the real chip,
recording steady-state clips/s and the clean BER at each point (the B=256
row is BASELINE config 2).  Requires an otherwise-idle chip; the axon
tunnel gotchas from CLAUDE.md apply (inputs perturbed per repeat, host
transfer as sync).

Run:  python tools/bench_sweep.py [--batches 16 64 128 256]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[16, 64, 128, 256])
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax

    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update(
            "jax_compilation_cache_dir", str(ROOT / ".jax_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import jax.numpy as jnp

    from bench import make_clips
    from aware_tpu.config import AwareConfig
    from aware_tpu.embed import embed_batch
    from aware_tpu.models import init_params
    from aware_tpu.models.detector import detect_values
    from aware_tpu.ops.resample import resample_poly

    # the bench.py flagship configuration: kernel round trip + fused
    # detector (single-pass bf16 MXU)
    cfg = AwareConfig().replace(
        matmul_precision="default", scan_unroll=2, use_pallas_roundtrip=True
    )
    params = {k: jnp.asarray(v) for k, v in init_params(cfg.detection_net).items()}

    rows = []
    for batch in args.batches:
        clips44 = make_clips(batch)
        rng = np.random.default_rng(7)
        bits = rng.integers(0, 2, size=(batch, 20)).astype(np.int32)
        wms = (2 * bits - 1).astype(np.float32)

        @jax.jit
        def pipeline(p, audio44, w, eps):
            audio16 = resample_poly(audio44 * (1.0 + eps), 160, 441)
            res = embed_batch(p, audio16, w, cfg)
            values = jax.vmap(
                lambda a: detect_values(p, a, cfg.detection_net,
                                        matmul_precision=cfg.matmul_precision)
            )(res.audio)
            return values

        a44 = jax.device_put(jnp.asarray(clips44))
        w = jnp.asarray(wms)
        try:
            t0 = time.time()
            values = pipeline(params, a44, w, jnp.float32(0.0))
            _ = np.asarray(values)
            compile_s = time.time() - t0
            times = []
            for r in range(args.repeats):
                t0 = time.time()
                values = pipeline(params, a44, w, jnp.float32(1e-6 * (r + 1)))
                _ = np.asarray(values)
                times.append(time.time() - t0)
            steady = min(times)
            ber = float(np.mean((np.asarray(values) > 0).astype(np.int32) != bits) * 100)
            rows.append({
                "batch": batch,
                "clips_per_sec": round(batch / steady, 3),
                "steady_s": round(steady, 3),
                "compile_and_first_s": round(compile_s, 1),
                "clean_ber_pct": ber,
            })
        except Exception as e:  # OOM etc: record, continue
            rows.append({"batch": batch, "error": f"{type(e).__name__}: {e}"[:300]})
        print(rows[-1], flush=True)

    base = json.loads((ROOT / "BASELINE_MEASURED.json").read_text())["clips_per_sec"]
    for r in rows:
        if "clips_per_sec" in r:
            r["vs_baseline"] = round(r["clips_per_sec"] / base, 1)
    (ROOT / "BENCH_SWEEP.json").write_text(json.dumps(rows, indent=2))
    print(f"wrote {ROOT / 'BENCH_SWEEP.json'}")


if __name__ == "__main__":
    main()
