"""Hour-scale streaming detection eval on the real chip -> STREAMING_EVAL.json.

VERDICT round-3 item 7: the sliding-window localization service
(aware_tpu/service/streaming.py) is CPU-mesh-tested for correctness but had
no chip-scale artifact.  This runs the real thing end-to-end:

1. synthesize ``--hours`` of continuous unwatermarked speech-like audio;
2. embed ``--plants`` marks (default card, full 400-iteration solve, one
   batched chip dispatch) and splice them in at random non-overlapping
   offsets at varying gains — plants land at ARBITRARY sample offsets, so
   detection must survive non-frame-aligned windows;
3. run StreamingDetector.detect over the whole stream (null-calibrated
   threshold), timed;
4. score localization (segment recall/precision with +-window tolerance),
   payload bit accuracy on hits, and throughput (windows/s, audio-hours
   per wall-clock second);
5. re-calibrate the null threshold across seeds for a stability check.

Run:  python tools/streaming_eval.py [--hours 1.0] [--plants 24]
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


def build_stream(hours: float, sr: int, seed: int = 77) -> np.ndarray:
    """Continuous speech-like background: concatenated 10 s synth clips
    with per-clip gain variation (host-side, float32)."""
    from aware_tpu.eval.harness import synthesize_speech_clip

    total = int(hours * 3600 * sr)
    rng = np.random.default_rng(seed)
    parts, n = [], 0
    i = 0
    while n < total:
        clip = synthesize_speech_clip(seed * 1000 + i, seconds=10.0)
        clip = clip * float(rng.uniform(0.4, 1.0))
        parts.append(clip)
        n += len(clip)
        i += 1
    return np.concatenate(parts)[:total].astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=float, default=1.0)
    ap.add_argument("--plants", type=int, default=24)
    ap.add_argument("--plant-seconds", type=float, default=4.0)
    ap.add_argument("--window-seconds", type=float, default=2.0)
    ap.add_argument("--hop-seconds", type=float, default=1.0)
    ap.add_argument("--batch-windows", type=int, default=256)
    ap.add_argument("--message-k", type=int, default=8,
                    help="plant [20,k]-coded payloads and score joint-ML "
                         "message recovery over each matched segment's "
                         "windows (decode_message_windows); 0 plants raw "
                         "random slot bits like the round-4 eval")
    ap.add_argument("--out", default="STREAMING_EVAL.json")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU self-test: forces the CPU backend, the "
                         "XLA embed path (interpret-mode Pallas is too slow "
                         "to smoke), and a short solve — validates the "
                         "pipeline end-to-end before burning chip time")
    args = ap.parse_args()

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update(
            "jax_compilation_cache_dir", str(ROOT / ".jax_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import jax.numpy as jnp

    from aware_tpu.config import AwareConfig
    from aware_tpu.embed import embed_batch
    from aware_tpu.eval.harness import synthesize_speech_clip
    from aware_tpu.models import init_params
    from aware_tpu.service.api import AWAREDetector
    from aware_tpu.service.streaming import StreamingDetector

    cfg = AwareConfig().replace(
        matmul_precision="default", scan_unroll=2, use_pallas_roundtrip=True
    )
    if args.smoke:
        cfg = cfg.replace(use_pallas_roundtrip=False,
                          use_pallas_detector=False,
                          use_pallas_iteration=False,
                          num_iterations=20)
    params = {
        k: jnp.asarray(v) for k, v in init_params(cfg.detection_net).items()
    }
    sr = cfg.detection_net.sample_rate

    # ---- 1. background stream ------------------------------------------
    t0 = time.time()
    stream = build_stream(args.hours, sr)
    print(f"stream: {len(stream)/sr/3600:.2f} h "
          f"({time.time()-t0:.0f}s to synthesize)", flush=True)

    # ---- 2. embed plants (one batched dispatch) and splice them in ------
    rng = np.random.default_rng(11)
    plant_len = int(args.plant_seconds * sr)
    clips = np.stack([
        synthesize_speech_clip(5000 + i, seconds=args.plant_seconds)
        [:plant_len]
        for i in range(args.plants)
    ])
    if args.message_k:
        # each plant carries a k-bit payload through the soft-decision
        # code; the codeword IS the 20 slot bits, so bit-mode scoring
        # below is unchanged while message recovery is scored additively
        from aware_tpu.service.ecc import decode_message_windows, get_code

        code = get_code(args.message_k, 20)
        msgs = rng.integers(0, 2, size=(args.plants, args.message_k)
                            ).astype(np.int32)
        bits = np.stack([code.encode(m) for m in msgs])
    else:
        bits = rng.integers(0, 2, size=(args.plants, 20)).astype(np.int32)
    wms = (2 * bits - 1).astype(np.float32)
    t0 = time.time()
    res = embed_batch(params, jnp.asarray(clips), jnp.asarray(wms), cfg)
    marked = np.asarray(res.audio)
    embed_s = time.time() - t0
    print(f"embedded {args.plants} plants in {embed_s:.1f}s "
          f"(incl. compile)", flush=True)

    # non-overlapping random offsets with a window of clearance
    min_gap = len(marked[0]) + int(args.window_seconds * sr) * 2
    n_slots = (len(stream) - min_gap) // min_gap
    slots = rng.choice(n_slots, size=args.plants, replace=False)
    offsets = np.sort(slots * min_gap
                      + rng.integers(0, min_gap - plant_len, args.plants))
    for off, m in zip(offsets, marked):
        gain = float(rng.uniform(0.5, 1.0))
        stream[off : off + len(m)] = m * gain

    # ---- 3. timed sliding-window localization ---------------------------
    det = AWAREDetector(params=params, cfg=cfg)
    sd = StreamingDetector(
        det, window_seconds=args.window_seconds,
        hop_seconds=args.hop_seconds, batch_windows=args.batch_windows,
        threshold="auto",
    )
    # warm the batched-dispatch jit so the timing below is steady-state
    _ = sd.detect(stream[: sd.window * args.batch_windows + sd.hop], sr)
    t0 = time.time()
    result = sd.detect(stream, sr)
    detect_s = time.time() - t0
    n_windows = len(result.window_starts)

    # ---- 4. scoring ------------------------------------------------------
    plant_spans = [(o / sr, (o + len(marked[0])) / sr) for o in offsets]
    tol = args.window_seconds
    recalled, bit_errs, msg_ok = 0, [], []
    matched_segments: set[int] = set()
    for p_i, (s0, s1) in enumerate(plant_spans):
        best = None
        for si, seg in enumerate(result.segments):
            if seg.start_seconds < s1 + tol and seg.end_seconds > s0 - tol:
                if best is None or seg.confidence > best[1].confidence:
                    best = (si, seg)
        if best is None:
            if args.message_k:
                msg_ok.append(0.0)
            continue
        recalled += 1
        matched_segments.add(best[0])
        bit_errs.append(float(np.mean(best[1].bits != bits[p_i])))
        if args.message_k:
            # joint-ML decode over the matched segment's windows: the
            # per-codeword correlations add across windows, an
            # integration gain no single window provides
            seg = best[1]
            in_seg = (result.window_starts >= seg.start_seconds) & (
                result.window_starts <= seg.end_seconds)
            dec = decode_message_windows(
                result.values[in_seg], args.message_k)
            msg_ok.append(float((dec.msg_bits == msgs[p_i]).all()))
    false_segments = len(result.segments) - len(matched_segments)

    # ---- 5. null threshold stability ------------------------------------
    thresholds = [sd.threshold]
    for s in (4321, 9876):
        thresholds.append(sd._calibrate_null(seed=s))

    out = {
        "hours": args.hours,
        "plants": args.plants,
        "plant_seconds": args.plant_seconds,
        "window_seconds": args.window_seconds,
        "hop_seconds": args.hop_seconds,
        "n_windows": int(n_windows),
        "detect_wall_s": round(detect_s, 2),
        "windows_per_sec": round(n_windows / detect_s, 1),
        "audio_hours_per_sec": round(args.hours / detect_s, 4),
        "realtime_factor": round(args.hours * 3600 / detect_s, 1),
        "segment_recall": round(recalled / args.plants, 4),
        "false_positive_segments": int(false_segments),
        "rejected_by_confirmation": int(result.rejected_segments),
        "mean_hit_bit_error_pct": (
            round(100 * float(np.mean(bit_errs)), 3) if bit_errs else None
        ),
        "threshold": round(float(sd.threshold), 4),
        "threshold_across_seeds": [round(float(t), 4) for t in thresholds],
        "embed_plants_s_incl_compile": round(embed_s, 1),
        "backend": jax.default_backend(),
    }
    if args.message_k:
        out["message_k"] = args.message_k
        out["message_recovery_pct"] = round(
            100.0 * float(np.mean(msg_ok)), 2) if msg_ok else None
    print(json.dumps(out, indent=2))
    (ROOT / args.out).write_text(json.dumps(out, indent=2))
    print(f"wrote {ROOT / args.out}")


if __name__ == "__main__":
    main()
