"""Extract the AWARE key material (seeded detector weights) to an npz bundle.

The reference never stores weights: the detector CNN is rebuilt every run
from ``torch.manual_seed(328656719)`` + xavier-uniform init
(reference: src/AWARE/detection/multibit_detector_net.py:78-107) — the seed
*is* the shared secret between embedder and detector.  Torch's CPU RNG
stream cannot be reproduced in JAX, so the rebuild ships the materialized
weights as a golden "key bundle" instead, decoupling the runtime from torch.

This is a dev-time tool (torch CPU required).  Run:

    python tools/extract_key.py [--seed 328656719] [--out aware_tpu/models/_key/aware_key_v1.npz]

RNG accounting (verified in tests/test_detector.py against a full torch
module-tree oracle): under ``Module.apply`` the only RNG consumers are the
four Conv1d weights, initialized depth-first in registration order
(block0..block3); biases are zero-filled and InstanceNorm1d layers are
non-affine, so they draw nothing.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from aware_tpu.config import DetectorNetConfig  # noqa: E402


def extract_key(cfg: DetectorNetConfig) -> dict[str, np.ndarray]:
    import torch

    torch.manual_seed(cfg.seed)
    params: dict[str, np.ndarray] = {}
    channels = cfg.channels
    for i in range(cfg.num_blocks + 1):
        w = torch.empty(channels[i + 1], channels[i], cfg.kernel_size)
        torch.nn.init.xavier_uniform_(w)
        params[f"conv{i}_w"] = w.squeeze(-1).numpy().astype(np.float32)
        params[f"conv{i}_b"] = np.zeros(channels[i + 1], dtype=np.float32)
    return params


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=DetectorNetConfig.seed)
    ap.add_argument(
        "--out",
        type=pathlib.Path,
        default=pathlib.Path(__file__).parent.parent
        / "aware_tpu/models/_key/aware_key_v1.npz",
    )
    args = ap.parse_args()

    cfg = DetectorNetConfig(seed=args.seed)
    params = extract_key(cfg)
    args.out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(args.out, seed=np.int64(args.seed), **params)
    total = sum(v.size for k, v in params.items())
    print(f"wrote {args.out} ({total} params, seed {args.seed})")


if __name__ == "__main__":
    main()
