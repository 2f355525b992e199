"""Driver benchmark: clips/sec/chip for embed+detect of 10 s 44.1 kHz clips.

Workload (BASELINE.json primary metric): a batch of B ten-second 44.1 kHz
mono clips is polyphase-resampled to the model's 16 kHz on device, embedded
(full 400-iteration adversarial solve, vmapped into one compiled program),
and re-detected.  Steady-state throughput is timed on the second run
(first run pays jit compilation).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is relative to the measured PyTorch-reference CPU oracle
(BASELINE_MEASURED.json, tools/baseline_torch.py; 33.8 s/clip on this
machine's single CPU core).

Usage: python bench.py [--batch 32] [--full]  (--full adds a BER check)

Tunnel resilience (round-4): the axon TPU tunnel is reached over the
network and has real outages (round 3's driver capture died with
"Unable to initialize backend 'axon'").  JAX caches a failed backend
init for the life of the process, so retries only help in FRESH
processes: the default entry point therefore (1) pre-flight-probes the
device in a subprocess with bounded backoff, then (2) runs the actual
benchmark as a --_worker subprocess, retrying on backend-unavailable
signatures and on hangs.  --_worker (or --no-retry) runs the old
single-process behavior.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

# substrings that identify a transient tunnel/backend failure (vs a real bug)
_BACKEND_ERR_MARKERS = (
    "Unable to initialize backend",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "failed to connect",
    "Socket closed",
    "Connection reset",
)

# backoff sleeps between pre-flight attempts.  Worst case (tunnel hard
# down, every probe hanging to its timeout) is bounded at ~30 min total —
# long enough to ride out a flap, short enough for a driver capture window.
_BACKOFF = (0, 15, 60, 120, 180)
_PROBE_TIMEOUT = 300  # s; first device init through the tunnel can be slow
_WORKER_TIMEOUT = 3000  # s; covers a cold ~10 min Mosaic compile with margin


def _is_transient(text: str) -> bool:
    return any(m in text for m in _BACKEND_ERR_MARKERS)


def _preflight() -> None:
    """Probe the TPU in fresh subprocesses until it answers (bounded)."""
    probe = (
        "import jax, numpy as np, jax.numpy as jnp;"
        "d = jax.devices(); x = jnp.ones((8, 8));"
        "np.asarray(x + x); print('preflight ok:', d[0])"
    )
    last = ""
    for i, sleep_s in enumerate(_BACKOFF):
        if sleep_s:
            print(f"# preflight retry {i}/{len(_BACKOFF) - 1} in {sleep_s}s",
                  file=sys.stderr)
            time.sleep(sleep_s)
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe],
                capture_output=True, text=True, timeout=_PROBE_TIMEOUT,
            )
        except subprocess.TimeoutExpired:
            last = f"probe hung >{_PROBE_TIMEOUT}s (tunnel stall)"
            print(f"# {last}", file=sys.stderr)
            continue
        if r.returncode == 0:
            print(f"# {r.stdout.strip()}", file=sys.stderr)
            return
        last = (r.stderr or r.stdout).strip().splitlines()[-1:] or ["?"]
        last = last[0]
        print(f"# preflight failed: {last}", file=sys.stderr)
        if not _is_transient(r.stderr + r.stdout):
            break  # a real error — retrying a fresh process won't change it
    raise SystemExit(
        f"bench.py: TPU backend unavailable after {len(_BACKOFF)} pre-flight "
        f"attempts (last: {last}). The axon tunnel is down; re-run when it "
        "recovers."
    )


def _supervise(argv: list[str]) -> None:
    """Pre-flight, then run the bench worker with retry on transient death."""
    _preflight()
    cmd = [sys.executable, os.path.abspath(__file__), "--_worker", *argv]
    for attempt in range(3):
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=_WORKER_TIMEOUT)
        except subprocess.TimeoutExpired:
            print(f"# worker hung >{_WORKER_TIMEOUT}s; retrying",
                  file=sys.stderr)
            _preflight()
            continue
        sys.stderr.write(r.stderr)
        if r.returncode == 0:
            sys.stdout.write(r.stdout)  # the one JSON line
            return
        if attempt < 2 and _is_transient(r.stderr + r.stdout):
            print("# transient backend failure; re-probing and retrying",
                  file=sys.stderr)
            _preflight()
            continue
        sys.stdout.write(r.stdout)
        raise SystemExit(r.returncode)
    raise SystemExit("bench.py: worker failed 3 attempts")


def make_clips(batch: int, seconds: float = 10.0, sr: int = 44100) -> np.ndarray:
    rng = np.random.default_rng(0)
    t = np.arange(int(seconds * sr)) / sr
    clips = []
    for i in range(batch):
        f0 = 100.0 + 10.0 * (i % 7) + 30.0 * np.sin(2 * np.pi * (2.0 + 0.1 * i) * t)
        ph = np.cumsum(2 * np.pi * f0 / sr)
        x = sum(np.cos(k * ph + 0.37 * i) / k for k in range(1, 25))
        x *= 0.4 + 0.6 * np.clip(np.sin(2 * np.pi * 3.1 * t + i), 0, None)
        x += 0.02 * rng.standard_normal(len(t))
        clips.append((x / np.max(np.abs(x))).astype(np.float32))
    return np.stack(clips)


def main() -> None:
    ap = argparse.ArgumentParser()
    # B=256 is the round-3 operating point: the whole-step iteration
    # kernel made per-clip cost monotone DECREASING in batch
    # (PERF_PROBE_STEP.json: 61.0 / 66.3 / 69.0 clips/s at B=16/64/256)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--full", action="store_true", help="verify BER too")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--_worker", action="store_true",
                    help="internal: run the bench in this process")
    ap.add_argument("--no-retry", action="store_true",
                    help="skip the pre-flight/retry supervisor")
    args = ap.parse_args()

    if not (args._worker or args.no_retry):
        _supervise([a for a in sys.argv[1:]])
        return

    import jax

    # persistent compile cache: the fused-kernel pipeline takes ~10 min of
    # XLA+Mosaic compilation cold; warmed by any prior bench run on this
    # machine (bit-identical program => cache hit)
    cache_dir = pathlib.Path(__file__).parent / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import jax.numpy as jnp

    from aware_tpu.config import AwareConfig
    from aware_tpu.embed import embed_batch
    from aware_tpu.models import init_params
    from aware_tpu.models.detector import detect_values
    from aware_tpu.ops.resample import resample_poly

    # full 400-iteration reference algorithm; single-pass bf16 MXU matmuls,
    # 2x scan unroll and the fused Pallas round-trip kernels are outcome-
    # validated (0% BER clean and under attacks, cross-precision detection
    # clean — see commit history / ITER_SWEEP.json / PERF_NOTES.md)
    cfg = AwareConfig().replace(
        matmul_precision="default", scan_unroll=2, use_pallas_roundtrip=True
    )
    params = {k: jnp.asarray(v) for k, v in init_params(cfg.detection_net).items()}

    clips44 = make_clips(args.batch)
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, size=(args.batch, 20)).astype(np.int32)
    wms = (2 * bits - 1).astype(np.float32)

    @jax.jit
    def pipeline(p, audio44, w, eps):
        # on-device input perturbation: defeats the tunnel's identical-
        # buffer re-execution elision without re-uploading the batch (this
        # dev environment reaches the chip through a network tunnel; the
        # benchmark measures chip throughput, not tunnel bandwidth)
        audio16 = resample_poly(audio44 * (1.0 + eps), 160, 441)
        res = embed_batch(p, audio16, w, cfg)
        values = jax.vmap(
            lambda a: detect_values(p, a, cfg.detection_net,
                                    matmul_precision=cfg.matmul_precision)
        )(res.audio)
        return res.audio, values

    a44 = jax.device_put(jnp.asarray(clips44))
    w = jnp.asarray(wms)

    t0 = time.time()
    out_audio, values = pipeline(params, a44, w, jnp.float32(0.0))
    _ = np.asarray(values)  # host transfer: the only reliable sync on axon
    compile_and_first = time.time() - t0

    times = []
    for r in range(args.repeats):
        t0 = time.time()
        out_audio, values = pipeline(params, a44, w, jnp.float32(1e-6 * (r + 1)))
        _ = np.asarray(values)
        times.append(time.time() - t0)
    steady = min(times)
    clips_per_sec = args.batch / steady

    baseline_path = pathlib.Path(__file__).parent / "BASELINE_MEASURED.json"
    vs_baseline = None
    if baseline_path.exists():
        base = json.loads(baseline_path.read_text())["clips_per_sec"]
        vs_baseline = clips_per_sec / base

    if args.full:
        detected = (np.asarray(values) > 0).astype(np.int32)
        ber = float(np.mean(detected != bits) * 100)
        print(f"# BER after embed+detect: {ber:.3f}%  "
              f"(compile+first: {compile_and_first:.1f}s, steady: {steady:.2f}s)",
              file=sys.stderr)

    print(json.dumps({
        "metric": "clips/sec/chip embed+detect (10s @44.1kHz)",
        "value": round(clips_per_sec, 4),
        "unit": "clips/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
