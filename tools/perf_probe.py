"""Isolate where embed time goes as batch grows (real-chip probe).

For each batch size B, times the full bench pipeline at two iteration
counts N1 < N2 and reports

    per_iter_ms_clip = (t(N2) - t(N1)) / (N2 - N1) / B * 1e3
    fixed_s          = t(N1) - N1 * per_iter_s

so the scan's marginal per-iteration cost is separated from everything
paid once per dispatch (resample, reconstruct, detect, tunnel latency,
transfers).  If per_iter_ms_clip is flat in B the solver scales and the
BENCH_SWEEP regression lives in the fixed part; if it grows, some op in
the iteration body degrades at large shapes.

Run: python tools/perf_probe.py [--batches 16 128] [--iters 50 150]
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
    ap.add_argument("--batches", type=int, nargs="+", default=[16, 64, 128])
    ap.add_argument("--iters", type=int, nargs=2, default=[50, 150])
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--pallas-roundtrip", action="store_true",
                    help="fused round-trip kernels (the bench flagship path)")
    ap.add_argument("--no-pallas-detector", action="store_true",
                    help="keep the XLA detector next to the kernel round trip")
    ap.add_argument("--out", default="PERF_PROBE.json")
    args = ap.parse_args()
    n1, n2 = args.iters

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

    base = AwareConfig().replace(
        matmul_precision="default",
        scan_unroll=2,
        use_pallas_roundtrip=args.pallas_roundtrip,
        use_pallas_detector=not args.no_pallas_detector,
    )
    params = {k: jnp.asarray(v) for k, v in init_params(base.detection_net).items()}

    def build(cfg):
        @jax.jit
        def pipeline(p, audio44, w, eps):
            audio16 = resample_poly(audio44 * (1.0 + eps), 160, 441)
            res = embed_batch(p, audio16, w, cfg)
            values = jax.vmap(
                lambda a: detect_values(p, a, cfg.detection_net,
                                        matmul_precision=cfg.matmul_precision)
            )(res.audio)
            return values

        return pipeline

    rows = []
    for batch in args.batches:
        clips44 = jax.device_put(jnp.asarray(make_clips(batch)))
        rng = np.random.default_rng(7)
        wms = jnp.asarray(
            (2 * rng.integers(0, 2, size=(batch, 20)) - 1).astype(np.float32)
        )
        t_at = {}
        for n in (n1, n2):
            fn = build(base.replace(num_iterations=n))
            t0 = time.time()
            _ = np.asarray(fn(params, clips44, wms, jnp.float32(0.0)))
            compile_s = time.time() - t0
            times = []
            for r in range(args.repeats):
                t0 = time.time()
                _ = np.asarray(fn(params, clips44, wms, jnp.float32(1e-6 * (r + 1))))
                times.append(time.time() - t0)
            t_at[n] = min(times)
            print(f"B={batch} iters={n}: steady={t_at[n]:.3f}s "
                  f"(compile+first {compile_s:.1f}s, all {['%.3f' % t for t in times]})",
                  file=sys.stderr)
        per_iter_s = (t_at[n2] - t_at[n1]) / (n2 - n1)
        fixed_s = t_at[n1] - n1 * per_iter_s
        rows.append({
            "batch": batch,
            "per_iter_ms_per_clip": round(per_iter_s / batch * 1e3, 4),
            "fixed_s": round(fixed_s, 4),
            "t_n1_s": round(t_at[n1], 4),
            "t_n2_s": round(t_at[n2], 4),
            "extrapolated_400iter_clips_per_sec": round(
                batch / (fixed_s + 400 * per_iter_s), 3),
        })
        print(json.dumps(rows[-1]), file=sys.stderr)

    out = ROOT / args.out
    out.write_text(json.dumps(rows, indent=2) + "\n")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
