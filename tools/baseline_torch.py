"""Measure the PyTorch-reference CPU baseline for bench.py's denominator.

The reference publishes no numbers (BASELINE.md), so the 50x target's
denominator is measured here: embed (400 NAdam iterations) + detect of one
10 s clip through a reference-faithful torch oracle
(tests/oracles/torch_ref.py), on CPU, per the driver metric
"clips/sec/chip embed+detect (10s @44.1kHz)" — the 44.1 kHz clip is
resampled to the model's 16 kHz exactly as the reference harness does
(reference: scripts/test.py:60-65).

Writes BASELINE_MEASURED.json at the repo root.  Dev tool; run once per
machine:  python tools/baseline_torch.py [--repeats 1]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import platform
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from tests.oracles.torch_ref import (  # noqa: E402
    OracleDetectorNet,
    oracle_detect_values,
    oracle_embed,
)


def make_clip(seconds: float, sr: int) -> np.ndarray:
    rng = np.random.default_rng(0)
    t = np.arange(int(seconds * sr)) / sr
    ph = np.cumsum(2 * np.pi * (120 + 30 * np.sin(2 * np.pi * 2.3 * t)) / sr)
    x = sum(np.cos(k * ph) / k for k in range(1, 25))
    x *= 0.4 + 0.6 * np.clip(np.sin(2 * np.pi * 3.1 * t), 0, None)
    x += 0.02 * rng.standard_normal(len(t))
    return (x / np.max(np.abs(x))).astype(np.float32)


def main() -> None:
    import scipy.signal

    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--seconds", type=float, default=10.0)
    args = ap.parse_args()

    clip44 = make_clip(args.seconds, 44100)
    clip16 = scipy.signal.resample_poly(
        clip44.astype(np.float64), 16000, 44100
    ).astype(np.float32)

    net = OracleDetectorNet().eval()
    bits = np.random.default_rng(7).integers(0, 2, 20).astype(np.int32)
    wm = (2 * bits - 1).astype(np.float32)

    times = []
    for r in range(args.repeats):
        t0 = time.time()
        out = oracle_embed(net, clip16, wm)
        _ = oracle_detect_values(net, out)
        times.append(time.time() - t0)
        print(f"run {r}: {times[-1]:.1f}s")

    sec = float(np.median(times))
    result = {
        "metric": "clips/sec embed+detect (10s @44.1kHz -> 16k), torch reference oracle, CPU",
        "seconds_per_clip": sec,
        "clips_per_sec": 1.0 / sec,
        "num_iterations": 400,
        "clip_seconds": args.seconds,
        "machine": platform.processor() or platform.machine(),
        "nproc": __import__("os").cpu_count(),
    }
    out_path = pathlib.Path(__file__).parent.parent / "BASELINE_MEASURED.json"
    out_path.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
