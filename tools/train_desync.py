"""Re-key the detector for desync robustness (time-stretch / pitch-shift).

The frozen reference key reads 15-27% BER after phase-vocoder time-stretch
(PARITY.md ts_* rows) — a reference behavior, not a regression.  Beating
it requires a different key: this trains detector + amortized embedder
jointly (``train_detector=True``) through the differentiable attack mix
*including* vocoder stretch branches (train/adversarial.py
DESYNC_STRETCH_RATES), then ships the result as an alternate key bundle +
card.  At inference the normal per-clip solver optimizes against the
re-keyed detector, so embeds stay optimization-based (same imperceptibility
box); only the shared secret changes.

Run:  python tools/train_desync.py [--steps 6000] [--batch 16]
      python tools/train_desync.py --eval-only     # eval existing bundle
Artifacts: aware_tpu/models/_key/desync_key_v1.npz (+ amortized companion),
           aware_tpu/cards/desync.yaml, DESYNC_EVAL.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax.numpy as jnp  # noqa: E402

from aware_tpu.config import AwareConfig  # noqa: E402
from aware_tpu.eval.harness import run_robustness_eval  # noqa: E402
from aware_tpu.models import init_params  # noqa: E402
from aware_tpu.models.detector import load_key_params  # noqa: E402
from aware_tpu.service.api import AWAREDetector, AWAREEmbedder  # noqa: E402
from aware_tpu.train import (  # noqa: E402
    AmortizedEmbedderConfig,
    TrainConfig,
    train_amortized_embedder,
)

ROOT = pathlib.Path(__file__).parent.parent
OUT_DIR = ROOT / "aware_tpu" / "models" / "_key"
KEY_NPZ = OUT_DIR / "desync_key_v1.npz"
EMB_NPZ = OUT_DIR / "desync_amortized_v1.npz"


def desync_model(cfg: AwareConfig | None = None):
    """(embedder, detector) pair on the re-keyed bundle."""
    cfg = cfg or AwareConfig.from_card(ROOT / "aware_tpu" / "cards" / "desync.yaml")
    params = init_params(cfg.detection_net)
    return AWAREEmbedder(params=params, cfg=cfg), AWAREDetector(params=params, cfg=cfg)


def evaluate(n_clips: int = 4, seed: int = 0, robust: bool = False) -> dict:
    """Solver-embed robustness sweep with the re-keyed bundle vs the
    frozen-key bundle, same clips/attacks; with ``robust`` also the
    rate-search detection mode on both keys.  ``robust`` defaults off:
    desync-attacked clips all have distinct lengths, so every row would
    compile a fresh multi-lane grid program — expensive, and the identity
    lane wins on the re-keyed bundle anyway (the trained detector reads
    stretched clips directly)."""
    from aware_tpu.service.api import load

    results = {}
    results["desync_key"] = dict(
        run_robustness_eval(n_clips=n_clips, seed=seed, model=desync_model())
    )
    results["frozen_key"] = dict(
        run_robustness_eval(n_clips=n_clips, seed=seed, model=load())
    )
    if robust:
        results["desync_key_robust"] = dict(
            run_robustness_eval(
                n_clips=n_clips, seed=seed, model=desync_model(), robust=True
            )
        )
        results["frozen_key_robust"] = dict(
            run_robustness_eval(
                n_clips=n_clips, seed=seed, model=load(), robust=True
            )
        )
    ts_rows = [k for k in results["desync_key"] if k.startswith("ber:ts_")]
    results["summary"] = {
        f"{variant}_ts_mean": float(
            np.mean([results[variant][k] for k in ts_rows])
        )
        for variant in results
    }
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--lambda-percept", type=float, default=0.3)
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--eval-clips", type=int, default=4)
    args = ap.parse_args()

    if not args.eval_only:
        cfg = AwareConfig()
        d_params = {
            k: jnp.asarray(v) for k, v in init_params(cfg.detection_net).items()
        }  # golden key as the fine-tune starting point
        from aware_tpu.eval.harness import synthesize_speech_clip
        from aware_tpu.train.distill import diverse_clip

        def sampler(step: int) -> np.ndarray:
            # 70% the warm-start bundle's training family / 30% diverse —
            # the warm start reads 1.3% hard BER on its own family vs 20%
            # on diverse, so majority-family batches keep the joint
            # training out of the collapse basin while diverse clips pull
            # generalization.
            out = []
            for i in range(args.batch):
                n = step * args.batch + i
                out.append(
                    diverse_clip(n) if n % 10 < 3 else synthesize_speech_clip(n)
                )
            return np.stack(out)

        # warm-start the embedder from the round-1 amortized bundle when
        # present (already produces golden-key-readable patterns)
        init_e = None
        warm = OUT_DIR / "amortized_v1.npz"
        if warm.exists():
            with np.load(warm) as z:
                init_e = {k: jnp.asarray(z[k]) for k in z.files}

        common = dict(
            batch_size=args.batch,
            learning_rate=args.lr,
            lambda_percept=args.lambda_percept,
            train_detector=True,
            dual_view=True,
            detector_lr=args.lr / 3.0,
            embedder=AmortizedEmbedderConfig(hidden=(384, 384)),
        )
        # Phase 1: joint fine-tune WITHOUT desync attacks — establishes an
        # (embedder, detector) pair that reads through the easy attack mix
        # before the vocoder branches make the problem deceptive.
        p1_steps = max(args.steps // 4, 500)
        tcfg1 = TrainConfig(steps=p1_steps, desync_attacks=False, **common)
        state, hist1 = train_amortized_embedder(
            cfg, tcfg1, d_params, sampler, seed=11, init_e_params=init_e,
        )
        print("phase 1 final:", json.dumps(hist1[-1]))

        # Phase 2: enable the stretch branches; curriculum continues from
        # the phase-1 params (fresh optimizer state).
        tcfg2 = TrainConfig(steps=args.steps, desync_attacks=True, **common)
        state, hist2 = train_amortized_embedder(
            cfg, tcfg2, state.d_params, sampler, seed=12,
            checkpoint_dir=str(OUT_DIR / "desync_ckpt"),
            init_e_params=state.e_params,
        )
        np.savez_compressed(
            KEY_NPZ, **{k: np.asarray(v) for k, v in state.d_params.items()}
        )
        np.savez_compressed(
            EMB_NPZ, **{k: np.asarray(v) for k, v in state.e_params.items()}
        )
        print(f"saved {KEY_NPZ} and {EMB_NPZ}")
        print("final train metrics:", json.dumps(hist2[-1]))

    results = evaluate(n_clips=args.eval_clips)
    (ROOT / "DESYNC_EVAL.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results["summary"], indent=2))


if __name__ == "__main__":
    main()
