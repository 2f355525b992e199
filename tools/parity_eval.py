"""Cross-oracle parity evaluation -> PARITY.md.

The BER-parity gate (BASELINE.md) compares this framework against the
PyTorch reference under the attack suite.  The reference's own attack
implementations need ffmpeg/rubberband/scipy-subprocess machinery that is
not in this image, so the honest measurable parity surface is:

  1. aware_tpu embed  -> aware_tpu detect   (column A)
  2. aware_tpu embed  -> torch-oracle detect (column B: detector parity
     under every attack — the oracle net is a spec-level reimplementation
     of the reference detector with the golden seed)
  3. torch-oracle embed -> aware_tpu detect (column C: solver parity)

with attacks applied once (our implementations) to identical inputs.
|A - B| is the detector-level BER delta; |A - C| bounds the end-to-end
delta attributable to the embed solver.

Clips span 6 generator families (1/k-harmonic, formant-vowel, buzzy
pulse-train, voiced+aspiration, syllabic-burst, hard-pause speech) so
each attack row aggregates n_clips x 20 bits from heterogeneous material.
The turbo card (50-iteration solver, matched on both sides) and the
amortized one-shot embedder (A/B only — no reference counterpart exists)
are run through the same suite.

The A/B (detector-parity) surface is cheap to scale — our embeds run on
the chip and the torch oracle only *detects* — while every C-column clip
costs a full 400-iteration torch-reference embed (~34 s of host CPU), so
``--clips`` sets the A/B sample size and ``--c-clips`` bounds the C
column independently.  The |A−C| delta is computed on the matched clip
subset (same clips in both means), never across different clip sets.

Run:  python tools/parity_eval.py [--clips 80] [--c-clips 24] [--device tpu|cpu]
      (--device tpu runs our embeds/detects on the chip; the torch oracle
       is always host CPU.  CPU-only at 24 clips takes ~2 h on one core.)
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def make_clip(i: int, seed: int) -> np.ndarray:
    """Round-robin over 6 clip families."""
    from aware_tpu.eval import synthesize_speech_clip
    from aware_tpu.train.distill import diverse_clip

    fam = i % 6
    if fam < 4:
        return diverse_clip(4 * (seed + i) + fam)
    if fam == 4:
        return synthesize_speech_clip(seed + i)
    # hard-pause speech
    sr = 16000
    rng = np.random.default_rng(seed + i)
    t = np.arange(2 * sr) / sr
    ph = np.cumsum(2 * np.pi * (110 + 50 * np.sin(2 * np.pi * 1.6 * t)) / sr)
    x = sum(np.cos(k * ph + rng.random() * 6) / k for k in range(1, 28))
    x *= np.clip(np.sin(2 * np.pi * (1.4 + rng.random()) * t), 0, None) ** 0.5
    return (x / np.abs(x).max()).astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=24)
    ap.add_argument("--c-clips", type=int, default=None,
                    help="clips that also get the expensive torch-oracle "
                         "embed (C column); default: all of them")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--device", choices=("cpu", "tpu"), default="cpu")
    ap.add_argument("--skip-turbo", action="store_true")
    ap.add_argument("--skip-amortized", action="store_true")
    ap.add_argument("--our-embeds", default=None,
                    help="PARITY_EMBEDS.npz from tools/parity_embed_batch.py "
                         "(chip phase); skips the per-clip embed_one solves "
                         "so the whole run needs no TPU — the multi-hour "
                         "C-column soak can then share the box with chip "
                         "work instead of holding the device lock")
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from aware_tpu.attacks import default_attack_suite
    from aware_tpu.config import AwareConfig
    from aware_tpu.embed import embed_one
    from aware_tpu.metrics import ber
    from aware_tpu.models import init_params
    from tests.oracles.torch_ref import (
        OracleDetectorNet,
        oracle_detect_values,
        oracle_embed,
    )

    cfg = AwareConfig()
    params = init_params(cfg.detection_net)
    oracle = OracleDetectorNet().eval()
    attacks = default_attack_suite()
    rng = np.random.default_rng(args.seed)
    n_clips = args.clips
    c_clips = n_clips if args.c_clips is None else min(args.c_clips, n_clips)

    # jitted, cached per attacked length — detect_values called eagerly
    # costs dozens of tunnel round trips per clip on the TPU device
    from aware_tpu.models.detector import detect_values_jit

    def our_detect(audio) -> np.ndarray:
        return np.asarray(
            detect_values_jit(params, jnp.asarray(audio, jnp.float32))
        )

    cpu0 = jax.devices("cpu")[0] if args.device == "tpu" else None

    def apply_attack(atk, audio, key):
        """Attacks are eager jnp graphs — run them on host CPU so each op
        is a local call, not a tunnel dispatch."""
        if cpu0 is None:
            return np.asarray(atk.apply(audio, 16000, key=key), np.float32)
        with jax.default_device(cpu0):
            return np.asarray(atk.apply(audio, 16000, key=key), np.float32)

    # amortized one-shot embedder (no reference counterpart: A/B only)
    amortized = None
    if not args.skip_amortized:
        from aware_tpu.service.api import AWAREEmbedder
        from aware_tpu.service.fast import embed_watermark_oneshot

        model = AWAREEmbedder(params=params, cfg=cfg)

        def amortized(clip, bits):
            return embed_watermark_oneshot(clip, 16000, bits, model)

    turbo_cfg = (
        None
        if args.skip_turbo
        else AwareConfig.from_card(
            pathlib.Path(__file__).parent.parent
            / "aware_tpu" / "cards" / "turbo.yaml"
        )
    )

    tables: dict[str, dict[str, list[tuple[float, float, float]]]] = {
        "default": {}, "turbo": {}, "amortized": {},
    }

    pre = None
    if args.our_embeds:
        pre = np.load(args.our_embeds)
        assert pre["bits"].shape[0] >= n_clips, "precomputed set too small"

    for i in range(n_clips):
        clip = make_clip(i, args.seed)
        bits = rng.integers(0, 2, 20).astype(np.int32)
        wm = (2 * bits - 1).astype(np.float32)
        if pre is not None:
            assert np.array_equal(pre["bits"][i], bits), (
                f"clip {i}: precomputed bit stream diverges — "
                "regenerate PARITY_EMBEDS.npz with the same --seed"
            )

        variants: list[tuple[str, np.ndarray, np.ndarray | None]] = []
        with_c = i < c_clips
        ours = (
            pre["default"][i]
            if pre is not None
            else np.asarray(
                embed_one(
                    params, jnp.asarray(clip), jnp.asarray(wm), cfg
                ).audio
            )
        )
        theirs = oracle_embed(oracle, clip, wm) if with_c else None
        variants.append(("default", ours, theirs))
        if turbo_cfg is not None:
            ours_t = (
                pre["turbo"][i]
                if pre is not None and "turbo" in pre
                else np.asarray(
                    embed_one(
                        params, jnp.asarray(clip), jnp.asarray(wm), turbo_cfg
                    ).audio
                )
            )
            theirs_t = (
                oracle_embed(
                    oracle, clip, wm, num_iterations=turbo_cfg.num_iterations
                )
                if with_c
                else None
            )
            variants.append(("turbo", ours_t, theirs_t))
        if amortized is not None:
            variants.append(("amortized", amortized(clip, bits), None))

        for name, our_audio, their_audio in variants:
            rows = tables[name]

            def abc(att_ours, att_theirs):
                a = ber(bits, (our_detect(att_ours) > 0).astype(int))
                b = ber(
                    bits,
                    (oracle_detect_values(
                        oracle, np.asarray(att_ours, np.float32)
                    ) > 0).astype(int),
                )
                c = (
                    ber(bits, (our_detect(att_theirs) > 0).astype(int))
                    if att_theirs is not None
                    else float("nan")
                )
                return a, b, c

            rows.setdefault("clean", []).append(abc(our_audio, their_audio))
            for j, atk in enumerate(attacks):
                key = args.seed * 9973 + i * 101 + j
                att_ours = apply_attack(atk, our_audio, key)
                att_theirs = (
                    apply_attack(atk, their_audio, key)
                    if their_audio is not None
                    else None
                )
                rows.setdefault(atk.name, []).append(abc(att_ours, att_theirs))
        print(f"clip {i + 1}/{n_clips} done", flush=True)
        # incremental checkpoint: a multi-hour TPU run must survive a kill
        import json

        ck = pathlib.Path(__file__).parent.parent / "PARITY_PARTIAL.json"

        def _j(x):  # NaN (missing C column) -> null, keeping strict JSON
            return None if isinstance(x, float) and np.isnan(x) else x

        ck.write_text(json.dumps({
            "clips_done": i + 1,
            "n_clips": n_clips,
            "c_clips": c_clips,
            "tables": {
                v: {a: [[_j(x) for x in t] for t in vals]
                    for a, vals in rows.items()}
                for v, rows in tables.items()
            },
        }))

    bits_per_row = n_clips * 20
    lines = [
        "# PARITY — cross-oracle BER under the attack suite",
        "",
        f"Generated by tools/parity_eval.py ({n_clips} clips across 6",
        f"generator families = {bits_per_row} bits per attack row for the",
        f"A/B detector-parity surface; the C (solver-parity) column embeds",
        f"with the torch reference loop on {c_clips} of those clips"
        f" = {c_clips * 20} bits/row, and |A−C| is computed on that matched",
        f"subset.  Our embeds/detects on {args.device}, torch oracle on CPU."
        + (
            "  Our embeds are the batched kernel-path chip solver"
            " (tools/parity_embed_batch.py)."
            if args.our_embeds
            else ""
        ),
        "",
        "- **A**: aware_tpu embed → aware_tpu detect",
        "- **B**: aware_tpu embed → torch-oracle detect "
        "(detector-parity surface)",
        "- **C**: torch-oracle embed → aware_tpu detect "
        "(solver-parity surface)",
    ]
    summary = {}
    for variant, rows in tables.items():
        if not rows:
            continue
        lines += [
            "",
            f"## {variant} card" + (" (A/B only)" if variant == "amortized" else ""),
            "",
            "| Attack | A | B | C | |A−B| | |A−C| |",
            "|---|---|---|---|---|---|",
        ]
        worst_ab = worst_ac = 0.0
        worst_ab_nd = 0.0  # non-desync
        for name, vals in rows.items():
            a = float(np.mean([v[0] for v in vals]))
            b = float(np.mean([v[1] for v in vals]))
            # C over the clips that have it, delta vs A on the SAME clips
            c_pairs = [(v[0], v[2]) for v in vals if not np.isnan(v[2])]
            if c_pairs:
                a_sub = float(np.mean([p[0] for p in c_pairs]))
                c = float(np.mean([p[1] for p in c_pairs]))
                d_ac = abs(a_sub - c)
            else:
                c, d_ac = float("nan"), float("nan")
            d_ab = abs(a - b)
            worst_ab = max(worst_ab, d_ab)
            desync = name.startswith(("ts_", "ps_"))
            if not desync:
                worst_ab_nd = max(worst_ab_nd, d_ab)
            if not np.isnan(c) and not desync:
                worst_ac = max(worst_ac, d_ac)
            c_str = "—" if np.isnan(c) else f"{c:.2f}"
            d_ac_str = "—" if np.isnan(c) else f"{d_ac:.2f}"
            lines.append(
                f"| {name} | {a:.2f} | {b:.2f} | {c_str} | {d_ab:.2f} | {d_ac_str} |"
            )
        summary[variant] = (worst_ab, worst_ab_nd, worst_ac)
        lines += [
            "",
            f"Worst detector-parity delta |A−B|: **{worst_ab:.3f}%** "
            f"(non-desync: **{worst_ab_nd:.3f}%**)",
            f"Worst non-desync solver-parity delta |A−C|: **{worst_ac:.3f}%**",
        ]
    lines += [
        "",
        "Statistical resolution: at n bits/row the one-sigma binomial noise",
        "of a BER estimate near p is sqrt(p(1-p)/n) — at 1600 bits and",
        "p~0.5% that is ~0.18%, so |A-C| gaps below ~0.4% (2 sigma) are",
        "within sampling noise of two equally-good solvers, not evidence of",
        "a solver-parity defect.  The parity clips are synthesized at the",
        "16 kHz model rate and fed to the embed cores directly, so no VAD",
        "gate runs in this eval (both gates pass all parity clips).",
        "",
        "Notes: attacks are applied once per clip with a shared key, so A/B",
        "share identical attacked audio (pure detector comparison); C embeds",
        "with the torch reference loop, so desync attacks (time-stretch /",
        "pitch-shift) may differ through trajectory-level fp divergence of",
        "the chaotic adversarial optimization — the clean and non-desync",
        "rows are the parity gate surface.  The amortized card has no",
        "reference counterpart (the reference never trains anything), so",
        "only detector parity (|A−B|) applies there.",
    ]
    out = pathlib.Path(__file__).parent.parent / "PARITY.md"
    # Preserve hand-written analysis sections (PESQ bound, residual-gap
    # notes, ...): everything from the first "## PESQ" heading on is
    # carried over verbatim — a regenerated table must not clobber them
    # (it did once, round 5).
    preserved = ""
    if out.exists():
        old = out.read_text()
        idx = old.find("## PESQ")
        if idx >= 0:
            preserved = "\n" + old[idx:]
    out.write_text("\n".join(lines) + "\n" + preserved)
    print(f"wrote {out}")
    for v, (ab, ab_nd, ac) in summary.items():
        print(f"{v}: worst |A-B| {ab:.3f}% (non-desync {ab_nd:.3f}%), "
              f"worst non-desync |A-C| {ac:.3f}%")


if __name__ == "__main__":
    main()
