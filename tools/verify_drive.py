"""End-to-end drive of the public API on the real chip (verify recipe).

load -> embed_watermark -> detect_watermark on a speech-like harmonic clip
(the VAD gate rejects silence and white noise), asserting BER 0.0 and a
sane SNR.  Run WITHOUT JAX_PLATFORMS so the ambient axon TPU platform is
used; exits nonzero on any mismatch so tools/chip_queue.sh records it.
"""

from __future__ import annotations

import os
import pathlib
import sys
import tempfile
import time

import numpy as np

REPO = str(pathlib.Path(__file__).resolve().parent.parent)


def main() -> int:
    # run from a scratch cwd so `import aware_tpu` resolves via sys.path
    # like a user's site-packages import, not an accidental relative one
    os.chdir(tempfile.mkdtemp(prefix="aware_verify_"))
    sys.path.insert(0, REPO)

    import jax

    print("devices:", jax.devices(), flush=True)

    from aware_tpu import detect_watermark, embed_watermark, load

    sr = 16000
    t = np.arange(2 * sr) / sr
    ph = np.cumsum(2 * np.pi * (120 + 30 * np.sin(2 * np.pi * 2.3 * t)) / sr)
    x = sum(np.cos(k * ph) / k for k in range(1, 25))
    x *= 0.4 + 0.6 * np.clip(np.sin(2 * np.pi * 3.1 * t), 0, None)
    x += 0.02 * np.random.default_rng(0).standard_normal(len(t))
    x = (x / np.max(np.abs(x))).astype(np.float32)

    embedder, detector = load()
    print("use_pallas_roundtrip:", embedder.cfg.use_pallas_roundtrip, flush=True)
    bits = np.random.default_rng(7).integers(0, 2, 20, dtype=np.int32)

    t0 = time.time()
    wm = embed_watermark(x, sr, bits, embedder)
    cold = time.time() - t0
    detected = detect_watermark(wm, sr, detector)
    ber = float(np.mean(detected != bits))
    n = min(len(wm), len(x))
    snr = 10 * np.log10(np.sum(x[:n] ** 2) / np.sum((wm[:n] - x[:n]) ** 2))
    print(f"BER {ber} SNR {snr:.2f} dB cold_embed {cold:.1f}s", flush=True)

    # warm repeat (same length hits the in-process jit cache)
    t0 = time.time()
    wm2 = embed_watermark(x * 0.97, sr, bits, embedder)
    warm = time.time() - t0
    ber2 = float(np.mean(detect_watermark(wm2, sr, detector) != bits))
    print(f"warm_embed {warm:.1f}s warm BER {ber2}", flush=True)

    ok = ber == 0.0 and ber2 == 0.0 and 10.0 < snr < 30.0
    print("VERIFY", "PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
