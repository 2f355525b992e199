"""A/B: does a lossy-compression EOT view harden the solver's embeds
against REAL extreme-compression codecs (opus@8k, GSM-FR)?

Baseline (EVAL_RESULTS_EXTENDED.json, default card): every real-codec row
is 0% BER except opus_8k (30%) and gsm_fr (15%) — the damage there is
coarse in-band quantization, which the differentiable MDCT approximation
(attacks/codec.py mp3_approx) models.  This embeds the same clips with and
without `eot_mp3_qualities` views (cycle mode) and scores the real-codec
rows plus clean BER/SNR, so the view's value is measured attack-for-attack
on the actual libopus/libgsm round-trips.

Run:  python tools/compression_eot_ab.py [--cpu] [--clips 6]
          [--iterations 150] [--qualities 10 11]
          -> COMPRESSION_EOT_AB.json
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

ROW_NAMES = ("opus_8k", "opus_16k", "gsm_fr", "mp3_5")


def run_arm(cfg, clips, patterns, bits, attacks, d_params) -> dict:
    from aware_tpu.embed import embed_batch
    from aware_tpu.models import detect_values

    t0 = time.time()
    res = embed_batch(d_params, jnp.asarray(clips), jnp.asarray(patterns), cfg)
    wms = np.asarray(res.audio)
    embed_s = time.time() - t0

    rec: dict[str, list[float]] = {"clean": [], "snr_db": []}
    sr = cfg.detection_net.sample_rate
    for i, wm in enumerate(wms):
        v = np.asarray(detect_values(d_params, jnp.asarray(wm)))
        rec["clean"].append(float(np.mean((v > 0) != bits[i])) * 100)
        ref = clips[i][: len(wm)]
        rec["snr_db"].append(float(10 * np.log10(
            np.mean(ref**2) / (np.mean((wm - ref) ** 2) + 1e-12))))
        for j, attack in enumerate(attacks):
            a = np.asarray(attack.apply(wm, sr, key=1000 + i * 37 + j),
                           dtype=np.float32)
            v = np.asarray(detect_values(d_params, jnp.asarray(a)))
            rec.setdefault(attack.name, []).append(
                float(np.mean((v > 0) != bits[i])) * 100)
    out = {k: round(float(np.mean(vs)), 2) for k, vs in rec.items()}
    out["embed_s"] = round(embed_s, 1)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=6)
    ap.add_argument("--iterations", type=int, default=150)
    ap.add_argument("--qualities", type=int, nargs="+", default=[10, 11])
    ap.add_argument("--eot-weight", type=float, default=1.0)
    ap.add_argument("--tolerance-db", type=float, default=None,
                    help="override the card's per-coefficient box width — "
                         "the voice-frontier quality/robustness axis (the "
                         "VERDICT target allows SNR down to 9 dB; the STE "
                         "arms sit at 17-19 dB)")
    ap.add_argument("--seed", type=int, default=313)
    ap.add_argument("--out", default="COMPRESSION_EOT_AB.json")
    ap.add_argument("--arms", nargs="*", default=None,
                    help="arm-name prefixes to run (default: all)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from aware_tpu.attacks.voice_codecs import extended_attack_suite
    from aware_tpu.config import AwareConfig
    from aware_tpu.eval import synthesize_speech_clip
    from aware_tpu.models import init_params

    base = AwareConfig().replace(num_iterations=args.iterations)
    if args.tolerance_db is not None:
        base = base.replace(tolerance_db=args.tolerance_db)
    if args.cpu:
        base = base.replace(use_pallas_roundtrip=False,
                            use_pallas_detector=False,
                            use_pallas_iteration=False)
    d_params = {k: jnp.asarray(v)
                for k, v in init_params(base.detection_net).items()}

    rng = np.random.default_rng(args.seed)
    clips = np.stack([synthesize_speech_clip(args.seed + i)
                      for i in range(args.clips)])
    bits = rng.integers(0, 2, size=(args.clips, 20)).astype(np.int32)
    patterns = (2 * bits - 1).astype(np.float32)
    attacks = [a for a in extended_attack_suite() if a.name in ROW_NAMES]

    arms = {
        "A_plain": base,
        "B_mp3_eot": base.replace(
            eot_mode="cycle",
            eot_mp3_qualities=tuple(args.qualities),
            eot_weight=args.eot_weight,
        ),
        # round 5: the CELP-channel view (attacks/celp.py) targets exactly
        # the rows the MDCT view left open (opus_8k, gsm_fr)
        "C_celp_eot": base.replace(
            eot_mode="cycle",
            eot_celp_modes=("nb8k",),
            eot_weight=args.eot_weight,
        ),
        "D_mp3_celp_eot": base.replace(
            eot_mode="cycle",
            eot_mp3_qualities=tuple(args.qualities),
            eot_celp_modes=("nb8k",),
            eot_weight=args.eot_weight,
        ),
        # ceiling probe: the REAL codec in the loop (straight-through
        # gradient, host callback) — if even this doesn't move opus_8k,
        # the row is a genuine capacity limit, not a modeling gap
        "E_ste_opus8k": base.replace(
            eot_mode="cycle",
            eot_ste_codecs=("opus_8k",),
            eot_weight=args.eot_weight,
        ),
        "F_ste_opus8k_gsm": base.replace(
            eot_mode="cycle",
            eot_ste_codecs=("opus_8k", "gsm_fr"),
            eot_weight=args.eot_weight,
        ),
        # round 5b: stack the real-codec STE views with the differentiable
        # CELP + MDCT views — each helped alone (D: opus_8k 24.2, F: 19.2);
        # the cycle interleaves all of them
        "G_ste_celp_mp3": base.replace(
            eot_mode="cycle",
            eot_ste_codecs=("opus_8k", "gsm_fr"),
            eot_celp_modes=("nb8k",),
            eot_mp3_qualities=tuple(args.qualities),
            eot_weight=args.eot_weight,
        ),
        # round 5b: bias the cycle toward the hardest row — opus_8k gets
        # two slots in the view cycle, gsm_fr one
        "H_ste_opus_heavy": base.replace(
            eot_mode="cycle",
            eot_ste_codecs=("opus_8k", "opus_8k", "gsm_fr"),
            eot_weight=args.eot_weight,
        ),
    }
    if args.arms:
        arms = {k: v for k, v in arms.items()
                if any(k.startswith(a) for a in args.arms)}
    out = {
        "clips": args.clips,
        "iterations": args.iterations,
        "qualities": args.qualities,
        "eot_weight": args.eot_weight,
        "rows": list(ROW_NAMES),
        "backend": jax.default_backend(),
    }
    for name, cfg in arms.items():
        out[name] = run_arm(cfg, clips, patterns, bits, attacks, d_params)
        print(name, json.dumps(out[name]), flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
