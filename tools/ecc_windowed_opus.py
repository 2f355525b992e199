"""Does window-summed joint-ML decoding close opus_8k on LONG clips?

opus_8k is the one attack row no embed recipe moves below ~17-25% raw
slot BER (COMPRESSION_EOT_AB_*.json — a capacity limit of 8 kb/s CELP
at this payload density).  But the mark is uniform in time, so on long
material the per-window correlations of the [20,k] code ADD across
sliding windows (service/ecc.py decode_message_windows): the decode
statistic grows ~sqrt(n_windows) against the codec noise while a
whole-clip detection gives only ONE readout.  This measures that
directly: 60 s default-card embeds (time-tiled kernel path on chip),
REAL libopus 8 kb/s round-trip, then k-bit message recovery via
(a) whole-clip single decode and (b) window-summed joint-ML decode.

Run:  python tools/ecc_windowed_opus.py [--clips 16] [--k 8]
          [--rows opus_8k gsm_fr]      -> ECC_WINDOWED_OPUS.json
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
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--clips", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--rows", nargs="+", default=["opus_8k", "gsm_fr"])
    ap.add_argument("--window-seconds", type=float, default=2.0)
    ap.add_argument("--hop-seconds", type=float, default=1.0)
    ap.add_argument("--cpu", action="store_true",
                    help="CPU smoke (XLA path, short solve)")
    ap.add_argument("--iterations", type=int, default=None,
                    help="override num_iterations (smoke)")
    ap.add_argument("--out", default="ECC_WINDOWED_OPUS.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update(
            "jax_compilation_cache_dir", str(ROOT / ".jax_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import jax.numpy as jnp

    from bench import make_clips
    from aware_tpu.attacks import voice_codecs as vc
    from aware_tpu.config import AwareConfig
    from aware_tpu.embed import embed_batch
    from aware_tpu.models import init_params
    from aware_tpu.models.detector import detect_values
    from aware_tpu.ops.resample import resample_poly
    from aware_tpu.service.ecc import (decode_message,
                                       decode_message_windows, get_code)

    cfg = AwareConfig().replace(
        matmul_precision="default", scan_unroll=2, use_pallas_roundtrip=True
    )
    if args.cpu:
        cfg = cfg.replace(use_pallas_roundtrip=False,
                          use_pallas_detector=False,
                          use_pallas_iteration=False)
    if args.iterations:
        cfg = cfg.replace(num_iterations=args.iterations)
    params = {
        k: jnp.asarray(v) for k, v in init_params(cfg.detection_net).items()
    }
    sr = cfg.detection_net.sample_rate
    code = get_code(args.k, 20)
    rng = np.random.default_rng(7)
    msgs = rng.integers(0, 2, size=(args.clips, args.k)).astype(np.int32)
    slots = np.stack([code.encode(m) for m in msgs])
    wms = (2 * slots - 1).astype(np.float32)

    clips44 = make_clips(args.clips, seconds=args.seconds)

    @jax.jit
    def embed_pipeline(p, audio44, w):
        audio16 = resample_poly(audio44, 160, 441)
        return embed_batch(p, audio16, w, cfg).audio

    t0 = time.time()
    marked = np.asarray(
        embed_pipeline(params, jnp.asarray(clips44), jnp.asarray(wms))
    )
    print(f"embedded {args.clips}x{args.seconds:.0f}s in "
          f"{time.time()-t0:.0f}s (incl. compile)", flush=True)

    win = int(args.window_seconds * sr)
    hop = int(args.hop_seconds * sr)

    detect_one = jax.jit(lambda p, a: detect_values(
        p, a, cfg.detection_net, matmul_precision=cfg.matmul_precision))
    detect_wins = jax.jit(jax.vmap(lambda a: detect_values(
        params, a, cfg.detection_net,
        matmul_precision=cfg.matmul_precision)))

    def roundtrip(name: str, a: np.ndarray) -> np.ndarray:
        if name == "opus_8k":
            return vc.opus_roundtrip(a, sr, 8000)
        if name == "gsm_fr":
            return vc.gsm_roundtrip(a, sr)
        raise SystemExit(f"unknown row {name}")

    out: dict = {"clips": args.clips, "seconds": args.seconds, "k": args.k,
                 "window_seconds": args.window_seconds,
                 "hop_seconds": args.hop_seconds,
                 "code": {"n": code.n, "k": code.k, "d_min": code.d_min},
                 "backend": jax.default_backend(), "rows": {}}
    for name in ["identity"] + args.rows:
        whole_ok, win_ok, raw = [], [], []
        for i in range(args.clips):
            a = (marked[i] if name == "identity"
                 else roundtrip(name, marked[i]).astype(np.float32))
            v_whole = np.asarray(detect_one(params, jnp.asarray(a)))
            raw.append(float(np.mean(
                (v_whole > 0).astype(np.int32) != slots[i])) * 100)
            whole_ok.append(float(
                (decode_message(v_whole, args.k).msg_bits == msgs[i]).all()
            ))
            starts = np.arange(0, len(a) - win + 1, hop)
            wins = np.stack([a[s : s + win] for s in starts])
            v_wins = np.asarray(detect_wins(jnp.asarray(wins)))
            win_ok.append(float(
                (decode_message_windows(v_wins, args.k).msg_bits
                 == msgs[i]).all()
            ))
        out["rows"][name] = {
            "raw_slot_ber_pct_wholeclip": round(float(np.mean(raw)), 2),
            "msg_success_pct_wholeclip": round(
                100 * float(np.mean(whole_ok)), 2),
            "msg_success_pct_windowed": round(
                100 * float(np.mean(win_ok)), 2),
            "n_windows": int(len(starts)),
        }
        print(name, json.dumps(out["rows"][name]), flush=True)

    (ROOT / args.out).write_text(json.dumps(out, indent=1))
    print("wrote", ROOT / args.out)


if __name__ == "__main__":
    main()
