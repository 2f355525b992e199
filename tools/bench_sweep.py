"""Batch-size sweep of the driver benchmark -> BENCH_SWEEP.json.

Runs the bench.py pipeline at B in {16, 64, 128, 256} on the real chip,
recording steady-state clips/s and the clean BER at each point (the B=256
row is BASELINE config 2).  Round-4 additions (VERDICT item 4): a
robust-card row (cycle-EOT — the deployment desync config, which runs the
two-kernel composition rather than the whole-step kernel) and a 60 s
long-clip row (time-tiled kernel path), so every shipped operating point
has a measured clips/s at a stated BER.

Requires an otherwise-idle chip; the axon tunnel gotchas from CLAUDE.md
apply (inputs perturbed per repeat, host transfer as sync).

Run:  python tools/bench_sweep.py [--batches 16 64 128 256]
                                  [--skip-extras] [--extras-only]
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


def measure_row(cfg, batch: int, seconds: float, repeats: int,
                label: dict) -> dict:
    """Embed+detect a batch of ``seconds``-long 44.1 kHz clips under
    ``cfg``; returns one sweep row (or an error row)."""
    import jax
    import jax.numpy as jnp

    from bench import make_clips
    from aware_tpu.embed import embed_batch
    from aware_tpu.models import init_params
    from aware_tpu.models.detector import detect_values
    from aware_tpu.ops.resample import resample_poly

    params = {
        k: jnp.asarray(v) for k, v in init_params(cfg.detection_net).items()
    }
    clips44 = make_clips(batch, seconds=seconds)
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
        for r in range(repeats):
            t0 = time.time()
            values = pipeline(params, a44, w, jnp.float32(1e-6 * (r + 1)))
            _ = np.asarray(values)
            times.append(time.time() - t0)
        steady = min(times)
        ber = float(
            np.mean((np.asarray(values) > 0).astype(np.int32) != bits) * 100
        )
        return {
            **label,
            "batch": batch,
            "clip_seconds": seconds,
            "clips_per_sec": round(batch / steady, 3),
            "audio_sec_per_sec": round(batch * seconds / steady, 1),
            "steady_s": round(steady, 3),
            "compile_and_first_s": round(compile_s, 1),
            "clean_ber_pct": ber,
        }
    except Exception as e:  # OOM etc: record, continue
        return {**label, "batch": batch, "clip_seconds": seconds,
                "error": f"{type(e).__name__}: {e}"[:300]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[16, 64, 128, 256])
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--skip-extras", action="store_true",
                    help="only the default-card batch sweep")
    ap.add_argument("--extras-only", action="store_true",
                    help="only the robust-card + long-clip rows (appends "
                         "to an existing BENCH_SWEEP.json)")
    ap.add_argument("--robust-batch", type=int, default=64)
    ap.add_argument("--long-batch", type=int, default=16)
    args = ap.parse_args()

    import jax

    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update(
            "jax_compilation_cache_dir", str(ROOT / ".jax_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from aware_tpu.config import AwareConfig

    # the bench.py flagship configuration: kernel round trip + fused
    # detector + whole-step kernel (single-pass bf16 MXU)
    cfg = AwareConfig().replace(
        matmul_precision="default", scan_unroll=2, use_pallas_roundtrip=True
    )

    rows = []
    if args.extras_only:
        path = ROOT / "BENCH_SWEEP.json"
        if path.exists():
            rows = [r for r in json.loads(path.read_text())
                    if r.get("card", "default") == "default"
                    and r.get("clip_seconds", 10.0) == 10.0]
    else:
        for batch in args.batches:
            rows.append(measure_row(cfg, batch, 10.0, args.repeats,
                                    {"card": "default"}))
            print(rows[-1], flush=True)

    if not args.skip_extras:
        # robust (cycle-EOT) card: the deployment desync operating point;
        # EOT keeps the two-kernel composition (~2x base embed cost)
        rcfg = AwareConfig.from_card(
            ROOT / "aware_tpu" / "cards" / "robust.yaml"
        ).replace(use_pallas_roundtrip=True)
        rows.append(measure_row(rcfg, args.robust_batch, 10.0, args.repeats,
                                {"card": "robust"}))
        print(rows[-1], flush=True)
        # 60 s long-form clip: T ~ 3751 frames > the whole-clip VMEM bound,
        # so this exercises the time-tiled kernel path end-to-end
        rows.append(measure_row(cfg, args.long_batch, 60.0, args.repeats,
                                {"card": "default"}))
        print(rows[-1], flush=True)

    base = json.loads(
        (ROOT / "BASELINE_MEASURED.json").read_text()
    )["clips_per_sec"]
    for r in rows:
        if "clips_per_sec" in r and r.get("clip_seconds") == 10.0:
            r["vs_baseline"] = round(r["clips_per_sec"] / base, 1)
    (ROOT / "BENCH_SWEEP.json").write_text(json.dumps(rows, indent=2))
    print(f"wrote {ROOT / 'BENCH_SWEEP.json'}")


if __name__ == "__main__":
    main()
