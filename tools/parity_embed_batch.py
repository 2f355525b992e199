"""Phase-1 of the parity soak: batch-embed the parity clip set on the chip.

The chip is single-process-exclusive (the axon tunnel holds a device
lock), so the multi-hour host-side parity soak (torch-oracle embeds +
attacks + detects, tools/parity_eval.py --our-embeds) must not own it.
This tool takes one short chip window instead: it reproduces
parity_eval's exact clip/bit stream (same make_clip + rng order) and runs
OUR side's embeds as two vmapped solver dispatches (default + turbo
cards, the kernel flagship path), saving the watermarked audio to
PARITY_EMBEDS.npz for the host phase to consume.

Run (chip):  python tools/parity_embed_batch.py --clips 80
Then (host): nice -n 19 python tools/parity_eval.py --clips 80 \
                 --device cpu --our-embeds PARITY_EMBEDS.npz

Note the A column then reflects the vmapped production solver rather
than per-clip embed_one dispatches — outcome-equivalent (CLAUDE.md: the
chaotic loop is compared at BER level, never bit level).
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
    ap.add_argument("--clips", type=int, default=80)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--batch", type=int, default=16,
                    help="solver batch per dispatch (memory guard)")
    ap.add_argument("--out", default="PARITY_EMBEDS.npz")
    ap.add_argument("--skip-turbo", action="store_true")
    args = ap.parse_args()

    import jax

    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update(
            "jax_compilation_cache_dir", str(ROOT / ".jax_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import jax.numpy as jnp

    from aware_tpu.config import AwareConfig
    from aware_tpu.embed import embed_batch
    from aware_tpu.models import init_params
    from tools.parity_eval import make_clip

    on_tpu = jax.default_backend() != "cpu"
    cfg = AwareConfig().replace(
        matmul_precision="default" if on_tpu else "highest",
        use_pallas_roundtrip=on_tpu,
    )
    variants = {"default": cfg}
    if not args.skip_turbo:
        turbo = AwareConfig.from_card(
            ROOT / "aware_tpu" / "cards" / "turbo.yaml"
        )
        variants["turbo"] = turbo.replace(use_pallas_roundtrip=on_tpu)

    params = {
        k: jnp.asarray(v) for k, v in init_params(cfg.detection_net).items()
    }
    rng = np.random.default_rng(args.seed)
    clips, wms, bits_all = [], [], []
    for i in range(args.clips):
        clips.append(make_clip(i, args.seed))
        b = rng.integers(0, 2, 20).astype(np.int32)
        bits_all.append(b)
        wms.append((2 * b - 1).astype(np.float32))
    lens = {len(c) for c in clips}
    assert len(lens) == 1, f"parity clips must share one length, got {lens}"
    clips_a = jnp.asarray(np.stack(clips))
    wms_a = jnp.asarray(np.stack(wms))

    out: dict[str, np.ndarray] = {
        "bits": np.stack(bits_all),
        "clips": np.stack(clips),
    }
    for name, vcfg in variants.items():
        t0 = time.time()
        chunks = []
        for s in range(0, args.clips, args.batch):
            res = embed_batch(
                params,
                clips_a[s : s + args.batch],
                wms_a[s : s + args.batch],
                vcfg,
            )
            chunks.append(np.asarray(res.audio))
            print(
                f"{name}: {min(s + args.batch, args.clips)}/{args.clips} "
                f"({time.time() - t0:.1f}s)",
                flush=True,
            )
        out[name] = np.concatenate(chunks)

    np.savez_compressed(ROOT / args.out, **out)
    meta = {
        "clips": args.clips,
        "seed": args.seed,
        "variants": sorted(v for v in variants),
        "backend": jax.default_backend(),
        "kernel_path": bool(on_tpu),
    }
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
