"""Which stage of the KERNEL-path iteration still grows with batch?

The fused round-trip + detector kernels are whole-clip VMEM-resident and
vmap to a sequential grid, so their per-clip cost should be flat in B —
yet PERF_PROBE_DETK shows 0.0433 (B=16) -> 0.0549 (B=64) ms/iter/clip.
This probe isolates the marginal per-iteration per-clip cost of

  opt_only   — the real NAdam/scheduler/best-tracking scan with a trivial
               objective (no kernels): the optimizer's elementwise HBM
               streaming;
  rt_only    — solver scan with loss = sum(roundtrip Re/Im) (round-trip
               kernels + edge corrections, detector replaced by a sum);
  full       — the real kernel-path objective,

so full - rt_only ~ detector kernel, rt_only - opt_only ~ round-trip
kernels, and opt_only's own B-slope exposes scan/optimizer scaling.

Run (chip): python tools/kernel_stage_probe.py [--batches 16 64]
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
    ap.add_argument("--batches", type=int, nargs="+", default=[16, 64])
    ap.add_argument("--iters", type=int, nargs=2, default=[50, 150])
    ap.add_argument("--stages", nargs="+",
                    default=["opt_only", "rt_only", "full"])
    ap.add_argument("--out", default="KERNEL_STAGE_PROBE.json")
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
    from aware_tpu.embed.optim import get_optimizer
    from aware_tpu.embed.schedulers import get_scheduler
    from aware_tpu.embed.solver import build_problem
    from aware_tpu.models import init_params
    from aware_tpu.ops.resample import resample_poly

    # stage isolation runs the two-kernel COMPOSITION (synth kernel +
    # merged analysis/detector) — the production default is the fused
    # whole-step kernel (use_pallas_iteration, PERF_PROBE_STEP.json),
    # which has no interior seams to isolate
    cfg = AwareConfig().replace(
        matmul_precision="default", scan_unroll=2,
        use_pallas_roundtrip=True, use_pallas_iteration=False,
    )
    params = {
        k: jnp.asarray(v) for k, v in init_params(cfg.detection_net).items()
    }

    def solver_scan(audio16, wm, n, stage):
        pb = build_problem(params, audio16, wm, cfg)
        # mirror production: kernel paths optimize in the (T, P) carry
        # layout (embed_core does the same)
        if pb.carry is not None:
            objective_c, to_carry, *_ = pb.carry
            coeffs0 = to_carry(pb.coeffs0)
            lower, upper = to_carry(pb.lower), to_carry(pb.upper)
        else:
            objective_c, coeffs0 = pb.objective, pb.coeffs0
            lower, upper = pb.lower, pb.upper
        if stage in ("full", "rt_only"):
            # rt_only relies on the caller having monkeypatched the merged
            # analysis_detector kernel to a cheap sum, so the objective
            # runs only the synthesis kernel + edge rows + loss plumbing
            objective = objective_c
        else:
            objective = lambda c, it=0: jnp.sum(c * c) * 1e-6
        opt = get_optimizer(cfg.optimizer_name,
                            **{k: v for k, v in cfg.opt_params.items()
                               if k != "lr"})
        sched = get_scheduler(cfg.scheduler_name, **cfg.sched_params)
        base_lr = float(cfg.opt_params.get("lr", 0.1))
        grad_fn = jax.value_and_grad(objective)

        def body(carry, it):
            coeffs, opt_state, sched_state, best_loss, best = carry
            loss, g = grad_fn(coeffs, it)
            lr = sched_state["lr"]
            coeffs, opt_state = opt.update(g, opt_state, coeffs, lr)
            sched_state = sched.step(sched_state, loss)
            coeffs = jnp.clip(coeffs, lower, upper)
            better = loss < best_loss
            best_loss = jnp.where(better, loss, best_loss)
            best = jnp.where(better, coeffs, best)
            return (coeffs, opt_state, sched_state, best_loss, best), loss

        init = (coeffs0, opt.init(coeffs0), sched.init(base_lr),
                jnp.asarray(jnp.inf, jnp.float32), coeffs0)
        (coeffs, *_rest), losses = jax.lax.scan(
            body, init, jnp.arange(n, dtype=jnp.int32),
            unroll=cfg.scan_unroll,
        )
        return jnp.sum(coeffs) + losses[-1]

    results = []
    for batch in args.batches:
        clips44 = jnp.asarray(make_clips(batch))
        audio16 = jax.jit(lambda a: resample_poly(a, 160, 441))(clips44)
        rng = np.random.default_rng(7)
        wm = jnp.asarray(
            (2 * rng.integers(0, 2, (batch, 20)) - 1).astype(np.float32)
        )
        row = {"batch": batch}
        for stage in args.stages:
            if stage == "rt_only":
                from aware_tpu.ops.pallas import analysis_detector as AD

                orig = AD.analysis_detector
                AD.analysis_detector = (
                    lambda y2, corr, csw, cswt, c:
                    jnp.sum(y2, axis=0)[:20] * 1e-6
                )

            try:
                t_at = {}
                for n in (n1, n2):
                    fn = jax.jit(
                        lambda a, w, eps, n=n, stage=stage: jnp.sum(
                            jax.vmap(
                                lambda ai, wi: solver_scan(ai, wi, n, stage)
                            )(a * (1 + eps), w)
                        )
                    )
                    t0 = time.time()
                    _ = np.asarray(fn(audio16, wm, jnp.float32(0.0)))
                    compile_s = time.time() - t0
                    ts = []
                    for r in range(3):
                        t0 = time.time()
                        _ = np.asarray(
                            fn(audio16, wm, jnp.float32(1e-6 * (r + 1)))
                        )
                        ts.append(time.time() - t0)
                    t_at[n] = min(ts)
                    print(f"B={batch} {stage} n={n}: {t_at[n]:.3f}s "
                          f"(compile {compile_s:.1f}s)", file=sys.stderr)
            finally:
                if stage == "rt_only":
                    AD.analysis_detector = orig
            per_iter = (t_at[n2] - t_at[n1]) / (n2 - n1) / batch * 1e3
            row[stage] = round(per_iter, 4)
            print(json.dumps(row), file=sys.stderr)
        results.append(row)

    (ROOT / args.out).write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
