"""Distill the solver into the amortized embedder -> amortized_v2 bundle.

Stage A: generate solver targets over a diverse clip corpus (TPU-cheap).
Stage B: supervised distillation epochs.
Stage C: short adversarial fine-tune through the attack layer.
Eval: one-shot BER on held-out clips from BOTH in-distribution families
and the bench-clip generator (the OOD surface where the adversarial-only
v1 model degraded to ~26%).

Run: python tools/distill_amortized.py [--clips 768] [--epochs 60]
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
from aware_tpu.train import (  # noqa: E402
    AmortizedEmbedderConfig,
    TrainConfig,
    amortized_embed,
    init_train_state,
)
from aware_tpu.train.adversarial import (  # noqa: E402
    _optimizer as adversarial_optimizer,
    make_train_step,
)
from aware_tpu.train.distill import (  # noqa: E402
    distill_optimizer,
    diverse_clip,
    generate_targets,
    make_distill_step,
    make_distill_step_visible,
)

OUT = pathlib.Path(__file__).parent.parent / "aware_tpu" / "models" / "_key"


def eval_oneshot(e_params, d_params, cfg, clip_fn, n=8, seed=7000, label=""):
    rng = np.random.default_rng(seed)
    bers, snrs = [], []
    for i in range(n):
        clip = clip_fn(seed + i)
        bits = rng.integers(0, 2, 20).astype(np.int32)
        wm = (2 * bits - 1).astype(np.float32)
        out = amortized_embed(e_params, d_params, clip, wm, cfg)
        v = np.asarray(detect_values(d_params, jnp.asarray(out)))
        bers.append(float(np.mean((v > 0).astype(int) != bits)) * 100)
        ref = clip[: len(out)]
        snrs.append(
            10 * np.log10(np.mean(ref**2) / (np.mean((out - ref) ** 2) + 1e-12))
        )
    print(f"  eval[{label}]: BER {np.mean(bers):.2f}%  SNR {np.mean(snrs):.1f} dB",
          flush=True)
    return float(np.mean(bers)), float(np.mean(snrs))


def bench_clip(seed: int, seconds: float = 2.0, sr: int = 16000) -> np.ndarray:
    """The bench.py generator family (held-out OOD surface), at 16 kHz."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    i = seed % 31
    f0 = 100.0 + 10.0 * (i % 7) + 30.0 * np.sin(2 * np.pi * (2.0 + 0.1 * i) * t)
    ph = np.cumsum(2 * np.pi * f0 / sr)
    x = sum(np.cos(k * ph + 0.37 * i) / k for k in range(1, 25))
    x *= 0.4 + 0.6 * np.clip(np.sin(2 * np.pi * 3.1 * t + i), 0, None)
    x += 0.02 * rng.standard_normal(len(t))
    return (x / np.max(np.abs(x))).astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=768)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--finetune-steps", type=int, default=600)
    ap.add_argument("--hidden", type=int, nargs="+", default=[384, 384])
    ap.add_argument("--phase", action="store_true",
                    help="phase-conditioned net + post-roundtrip loss "
                         "(the round-2 recipe; fixes the ill-posed "
                         "magnitude-only regression)")
    ap.add_argument("--out", default="amortized_v2.npz")
    args = ap.parse_args()

    cfg = AwareConfig().replace(matmul_precision="default", scan_unroll=2)
    d_params = {k: jnp.asarray(v) for k, v in init_params(cfg.detection_net).items()}

    print("stage A: generating solver targets...", flush=True)
    clips_np, band, pattern, target = generate_targets(
        d_params, cfg, args.clips, batch=args.batch, seed=3
    )
    print(f"  {band.shape[0]} targets, band {band.shape[1:]}", flush=True)

    tcfg = TrainConfig(
        batch_size=args.batch,
        learning_rate=args.lr,
        embedder=AmortizedEmbedderConfig(
            hidden=tuple(args.hidden), phase_conditioned=args.phase
        ),
    )
    state = init_train_state(cfg, tcfg, d_params)
    # the distill step's optimizer differs from the adversarial one the
    # train-state was initialized with — re-init to the matching pytree
    state = state._replace(
        opt_state=distill_optimizer(tcfg).init(state.e_params)
    )
    if args.phase:
        dstep = jax.jit(make_distill_step_visible(cfg, tcfg))
    else:
        dstep = jax.jit(make_distill_step(cfg, tcfg))

    print("stage B: distillation...", flush=True)
    n = band.shape[0]
    rng = np.random.default_rng(0)
    for epoch in range(args.epochs):
        order = rng.permutation(n)
        ep_metrics = []
        for s in range(0, n - args.batch + 1, args.batch):
            idx = order[s : s + args.batch]
            if args.phase:
                state, m = dstep(
                    state,
                    jnp.asarray(clips_np[idx]),
                    jnp.asarray(pattern[idx]),
                    jnp.asarray(target[idx]),
                )
            else:
                state, m = dstep(
                    state,
                    jnp.asarray(band[idx]),
                    jnp.asarray(pattern[idx]),
                    jnp.asarray(target[idx]),
                )
            ep_metrics.append({k: float(v) for k, v in m.items()})
        if epoch % 10 == 0 or epoch == args.epochs - 1:
            avg = {k: float(np.mean([m[k] for m in ep_metrics])) for k in ep_metrics[0]}
            print(f"  epoch {epoch}: {avg}", flush=True)
            eval_oneshot(state.e_params, d_params, cfg, diverse_clip, label="in-dist")
            eval_oneshot(state.e_params, d_params, cfg, bench_clip, label="bench-ood")

    print("stage C: adversarial fine-tune...", flush=True)
    ft_cfg = TrainConfig(
        batch_size=16, learning_rate=1e-4,
        lambda_percept=0.2, embedder=tcfg.embedder,
    )
    # carry distilled params into a fresh fine-tune opt state (must match
    # the adversarial train step's optimizer pytree)
    ft_state = state._replace(
        opt_state=adversarial_optimizer(ft_cfg).init(state.e_params),
        step=jnp.zeros((), jnp.int32),
    )
    astep = jax.jit(make_train_step(cfg, ft_cfg))
    key = jax.random.PRNGKey(11)
    for i in range(args.finetune_steps):
        clips = np.stack([diverse_clip(900000 + i * 16 + j) for j in range(16)])
        pats = (np.random.default_rng(i).integers(0, 2, (16, 20)) * 2 - 1).astype(np.float32)
        key, sub = jax.random.split(key)
        ft_state, m = astep(ft_state, jnp.asarray(clips), jnp.asarray(pats), sub)
        if i % 100 == 0:
            print(f"  ft {i}: loss {float(m['loss']):.4f} soft_ber {float(m['soft_ber']):.4f}",
                  flush=True)

    results = {}
    for name, st in (("distilled", state), ("finetuned", ft_state)):
        bid, sid = eval_oneshot(st.e_params, d_params, cfg, diverse_clip,
                                n=12, seed=7100, label=f"{name}/in-dist")
        bod, sod = eval_oneshot(st.e_params, d_params, cfg, bench_clip,
                                n=12, seed=7200, label=f"{name}/bench-ood")
        results[name] = {"in_dist_ber": bid, "in_dist_snr": sid,
                         "ood_ber": bod, "ood_snr": sod}

    best = min(results, key=lambda k: results[k]["in_dist_ber"] + results[k]["ood_ber"])
    winner = state if best == "distilled" else ft_state
    np.savez_compressed(
        OUT / args.out,
        **{k: np.asarray(v) for k, v in winner.e_params.items()},
    )
    results["selected"] = best
    print(json.dumps(results, indent=2))
    (pathlib.Path(__file__).parent.parent / "DISTILL_EVAL.json").write_text(
        json.dumps(results, indent=2)
    )


if __name__ == "__main__":
    main()
