"""Train the amortized embedder and evaluate one-shot + warm-start embeds.

Trains against the frozen keyed detector through the differentiable attack
layer on a stream of synthesized speech clips, then reports:

  * one-shot embed BER (clean + under a quick attack set)
  * warm-start benefit: solver BER/loss at reduced iteration counts when
    initialized from the amortized prediction vs the reference cold start

Saves an orbax checkpoint + a flat npz of the embedder params (the npz is
the deployable artifact, loaded by the service fast path).

Run:  python tools/train_amortized.py [--steps 2000] [--batch 16] [--eval-only]
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

from aware_tpu.config import AwareConfig, in_band_bins  # noqa: E402
from aware_tpu.embed.solver import embed_core  # noqa: E402
from aware_tpu.eval import synthesize_speech_clip  # noqa: E402
from aware_tpu.models import detect_values, init_params  # noqa: E402
from aware_tpu.ops.stft import magphase, peak_normalize, stft  # noqa: E402
from aware_tpu.ops.windows import get_window  # noqa: E402
from aware_tpu.train import (  # noqa: E402
    AmortizedEmbedderConfig,
    TrainConfig,
    amortized_embed,
    save_checkpoint,
    train_amortized_embedder,
)
from aware_tpu.train.adversarial import embedder_apply  # noqa: E402

OUT_DIR = pathlib.Path(__file__).parent.parent / "aware_tpu" / "models" / "_key"


def clip_sampler(batch: int, length: int = 32000):
    def sample(step: int) -> np.ndarray:
        return np.stack(
            [
                synthesize_speech_clip(step * batch + i, seconds=length / 16000)
                for i in range(batch)
            ]
        )

    return sample


ITER_GRID = (5, 10, 25, 50)


def eval_state(e_params, d_params, cfg, n_clips=6, seed=900,
               family="speech") -> dict:
    """One-shot and iso-iteration warm-vs-cold metrics on held-out clips.

    ``family`` selects the held-out material: "speech" matches the default
    bundle's training distribution; "diverse" is the mixed 4-family
    off-distribution set.  The warm/cold grid starts at 5 iterations —
    by 25 the cold solver already reaches 0% on most material, so low
    counts are where a warm start can show (or fail to show) value.
    """
    from aware_tpu.train.distill import diverse_clip

    rng = np.random.default_rng(seed)
    window = get_window(cfg.window, cfg.win_length)
    lo, hi = in_band_bins(cfg.detection_net.sample_rate, cfg.frame_length,
                          cfg.embedding_bands)
    one_shot_bers, snrs = [], []
    warm: dict[int, list[float]] = {k: [] for k in ITER_GRID}
    cold: dict[int, list[float]] = {k: [] for k in ITER_GRID}
    for i in range(n_clips):
        clip = (synthesize_speech_clip(seed + i) if family == "speech"
                else diverse_clip(seed + i))
        bits = rng.integers(0, 2, 20).astype(np.int32)
        wm = (2 * bits - 1).astype(np.float32)

        out = amortized_embed(e_params, d_params, clip, wm, cfg)
        v = np.asarray(detect_values(d_params, jnp.asarray(out)))
        one_shot_bers.append(float(np.mean((v > 0).astype(int) != bits)) * 100)
        ref = clip[: len(out)]
        snrs.append(10 * np.log10(np.mean(ref**2) / (np.mean((out - ref) ** 2) + 1e-12)))

        # warm start: amortized band prediction as solver init
        mag, ph = magphase(stft(peak_normalize(jnp.asarray(clip)),
                                cfg.frame_length, cfg.hop_length, window))
        band_init = embedder_apply(e_params, mag[lo:hi], jnp.asarray(wm),
                                   cfg.tolerance_db, band_phase=ph[lo:hi])
        for iters in warm:
            c = cfg.replace(num_iterations=iters)
            rw = embed_core(d_params, jnp.asarray(clip), jnp.asarray(wm), c,
                            init_coeffs=band_init)
            vw = np.asarray(detect_values(d_params, rw.audio))
            warm[iters].append(float(np.mean((vw > 0).astype(int) != bits)) * 100)
            rc = embed_core(d_params, jnp.asarray(clip), jnp.asarray(wm), c)
            vc = np.asarray(detect_values(d_params, rc.audio))
            cold[iters].append(float(np.mean((vc > 0).astype(int) != bits)) * 100)

    return {
        "one_shot_ber": float(np.mean(one_shot_bers)),
        "one_shot_snr_db": float(np.mean(snrs)),
        **{f"warm{k}_ber": float(np.mean(v)) for k, v in warm.items()},
        **{f"cold{k}_ber": float(np.mean(v)) for k, v in cold.items()},
    }


def eval_all_bundles(d_params, cfg, n_clips=6) -> dict:
    """Regenerate the full amortized evidence set: every shipped bundle x
    {in-distribution, off-distribution} held-out material, plus an explicit
    warm-start verdict derived from the iso-iteration grid."""
    results: dict[str, dict] = {}
    # (variant, bundle file, tolerance_db or None=card default).  The tol-3
    # entries are evaluated at the box width they were trained for — the
    # tanh output scale is matched to the box, so evaluating them at the
    # default 6 dB box would understate both their energy and their BER
    # (AMORTIZED_TOLERANCE_SWEEP.json maps the knob).
    for variant, fname, tol in (
        ("default", "amortized_v1.npz", None),
        ("diverse", "amortized_v1_diverse.npz", None),
        ("unet", "amortized_unet_speech.npz", None),
        ("unet_diverse", "amortized_unet_diverse.npz", None),
        ("diverse_tol3", "amortized_v2_diverse_tol3_lp01.npz", 3.0),
        # the U-Net margin chain's latest segment (the live round-4
        # direction; renamed to amortized_unet_diverse.npz on convergence)
        ("unet_diverse_margin", "amortized_unet_diverse_margin_cpu2.npz",
         None),
    ):
        path = OUT_DIR / fname
        if not path.exists():
            continue
        with np.load(path) as z:
            e_params = {k: jnp.asarray(z[k]) for k in z.files}
        c = cfg if tol is None else cfg.replace(tolerance_db=tol)
        results[variant] = {
            fam: eval_state(e_params, d_params, c, n_clips=n_clips,
                            family=fam)
            for fam in ("speech", "diverse")
        }
        if tol is not None:
            results[variant]["tolerance_db"] = tol
    # Warm-start verdict: max BER improvement (pp) of warm over cold at any
    # iso-iteration point, across bundles and families.
    gains = []
    for bundles in results.values():
        for m in bundles.values():
            if not isinstance(m, dict):  # per-bundle tolerance_db tag
                continue
            for k in ITER_GRID:
                gains.append(m[f"cold{k}_ber"] - m[f"warm{k}_ber"])
    results["warm_start_verdict"] = {
        "max_gain_pp": float(max(gains)) if gains else 0.0,
        "note": (
            "gain = cold BER - warm BER at the same iteration count; "
            "<=0 everywhere means the turbo card's value is purely the "
            "reduced iteration count, not the amortized warm start"
        ),
    }
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--lambda-percept", type=float, default=0.3)
    ap.add_argument("--hidden", type=int, nargs="+", default=[384, 384])
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--eval-clips", type=int, default=6,
                    help="held-out clips per family for --eval-only (the "
                         "gate artifact; 12+ halves the binomial noise of "
                         "the small default)")
    ap.add_argument("--init", default=None, help="npz to warm-start from")
    ap.add_argument("--diverse", action="store_true",
                    help="train on the mixed clip families (OOD robustness)")
    ap.add_argument("--phase", action="store_true",
                    help="phase-conditioned net (cos/sin input channels)")
    ap.add_argument("--arch", choices=("mlp", "unet"), default="mlp",
                    help="unet = time-downsampled encoder/decoder over the "
                         "magnitude (round-3 one-shot capacity direction)")
    ap.add_argument("--unet-channels", type=int, nargs="+",
                    default=[96, 192, 384])
    ap.add_argument("--dual-view", action="store_true",
                    help="detection loss on clean AND attacked views")
    ap.add_argument("--desync", action="store_true",
                    help="include phase-vocoder stretch branches in the "
                         "attack mix (the solver's ts/ps EOT medicine — "
                         "VERDICT r4 item 3)")
    ap.add_argument("--compression", action="store_true",
                    help="include differentiable codec views (mp3_approx "
                         "q10/q11 + celp nb8k) in the attack mix")
    ap.add_argument("--det-loss", choices=("push_extremes", "margin"),
                    default="push_extremes",
                    help="margin = squared hinge on pred*target (round-4 "
                         "fix for weak-mark collapse: soft_ber~0.5 at low "
                         "hard BER)")
    ap.add_argument("--margin-target", type=float, default=0.5)
    ap.add_argument("--step-offset", type=int, default=0,
                    help="offset the clip sampler + pattern rng so chained "
                         "<=4000-step segments (--init from the previous "
                         "segment's npz) see fresh data")
    ap.add_argument("--out", default="amortized_new.npz",
                    help="output bundle filename under models/_key/ — "
                         "deliberately NOT a shipped bundle name; rename "
                         "after validating (fast.py _VARIANTS)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (tunnel-outage training; "
                         "JAX_PLATFORMS env is ignored by this jax build, "
                         "jax.config is the only reliable override)")
    ap.add_argument("--tolerance-db", type=float, default=None,
                    help="train at a non-default perturbation box (smaller "
                         "dB = wider box; the tol-3 bundles in "
                         "AMORTIZED_TOLERANCE_SWEEP.json used 3.0). The "
                         "SERVICE can widen the box at inference "
                         "(embed_watermark_oneshot tolerance_db=...), but "
                         "training at the deployed box keeps the tanh "
                         "output scale matched to it")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cfg = AwareConfig()
    if args.tolerance_db is not None:
        import dataclasses as _dc
        cfg = _dc.replace(cfg, tolerance_db=args.tolerance_db)
    d_params = {k: jnp.asarray(v) for k, v in init_params(cfg.detection_net).items()}

    npz_path = OUT_DIR / args.out
    if args.eval_only:
        metrics = eval_all_bundles(d_params, cfg, n_clips=args.eval_clips)
        print(json.dumps(metrics, indent=2))
        (pathlib.Path(__file__).parent.parent / "AMORTIZED_EVAL.json").write_text(
            json.dumps(metrics, indent=2)
        )
        return

    tcfg = TrainConfig(
        batch_size=args.batch,
        learning_rate=args.lr,
        lambda_percept=args.lambda_percept,
        steps=args.steps,
        dual_view=args.dual_view,
        desync_attacks=args.desync,
        compression_attacks=args.compression,
        det_loss=args.det_loss,
        margin_target=args.margin_target,
        embedder=AmortizedEmbedderConfig(
            hidden=tuple(args.hidden), phase_conditioned=args.phase,
            arch=args.arch, unet_channels=tuple(args.unet_channels),
        ),
    )
    if args.diverse:
        from aware_tpu.train.distill import diverse_clip

        def sampler(step: int) -> np.ndarray:
            return np.stack(
                [diverse_clip((args.step_offset + step) * args.batch + i)
                 for i in range(args.batch)]
            )
    else:
        base_sampler = clip_sampler(args.batch)

        def sampler(step: int) -> np.ndarray:
            return base_sampler(args.step_offset + step)

    init_override = None
    if args.init:
        with np.load(args.init) as z:
            init_override = {k: jnp.asarray(z[k]) for k in z.files}

    state, history = train_amortized_embedder(
        cfg, tcfg, d_params, sampler, seed=1 + args.step_offset,
        checkpoint_dir=str(OUT_DIR / "amortized_ckpt"),
        init_e_params=init_override,
    )

    e_params_np = {k: np.asarray(v) for k, v in state.e_params.items()}
    np.savez_compressed(npz_path, **e_params_np)
    print(f"saved {npz_path}")
    save_checkpoint(OUT_DIR / "amortized_ckpt", state)

    metrics = eval_state(state.e_params, d_params, cfg)
    metrics["final_train"] = history[-1]
    # subsampled loss curve — lets the next session judge whether the run
    # was still descending (undertrained) or had plateaued
    metrics["history_every_100"] = [
        {k: round(float(v), 5) for k, v in h.items()}
        for h in history[::100]
    ]
    print(json.dumps(metrics, indent=2))
    # AMORTIZED_EVAL.json is the all-bundle evidence set, regenerated only
    # by --eval-only; a training run records its own metrics next to it
    stem = pathlib.Path(args.out).stem
    (pathlib.Path(__file__).parent.parent
     / f"AMORTIZED_TRAIN_{stem}.json").write_text(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
