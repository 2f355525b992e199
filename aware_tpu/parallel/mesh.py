"""Device-mesh helpers.

The framework's two parallel axes (SURVEY.md §2.10):

* ``data`` — clips are embarrassingly parallel (the reference processes one
  clip at a time on one device; here a v5e slice embeds B clips per step).
* ``seq``  — long-form streaming detection shards the STFT frame axis with
  halo exchange; the detector's global pools become psum-merged partials.

Tensor/pipeline/expert parallelism are intentionally absent: the detector
is a 1.7M-parameter CNN that fits (replicated) in a fraction of one chip's
VMEM budget; sharding its weights would add collective latency for zero
memory benefit.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def get_mesh(
    axes: tuple[str, ...] = ("data",),
    shape: tuple[int, ...] | None = None,
    devices=None,
) -> Mesh:
    """Build a mesh over available devices.

    Default: all devices on one axis.  ``shape`` splits them, e.g.
    ``axes=("data", "seq"), shape=(2, 4)`` on 8 devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    return Mesh(np.asarray(devices).reshape(shape), axes)
