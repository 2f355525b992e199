"""Profiling / tracing hooks.

The reference's only telemetry is wall-clock logging inside the optimize
loop (reference: multibit_embedder.py:74,124-137).  Here, per-iteration
loss curves come back as scan outputs (`EmbedResult`/`losses`), and this
module adds device-level tracing via ``jax.profiler`` for kernel-level
inspection in TensorBoard / Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax

from aware_tpu.utils.logger import logger


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/aware_tpu_trace") -> Iterator[None]:
    """Capture an XLA device trace for the enclosed block.

    View with: tensorboard --logdir <log_dir>  (or open the .pb in
    Perfetto).  Note: the axon TPU tunnel used in CI may not support
    device-side tracing; the context degrades to a wall-clock log.
    """
    t0 = time.time()
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # tunnel/backend without profiling support
        logger.warning("device trace unavailable (%s); timing only", e)
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                logger.info("trace written to %s", log_dir)
            except Exception as e:
                logger.warning("trace stop failed: %s", e)
        logger.info("traced block took %.3fs", time.time() - t0)


@contextlib.contextmanager
def timed(label: str) -> Iterator[None]:
    """Wall-clock log of the enclosed block (host side)."""
    t0 = time.time()
    yield
    logger.info("%s: %.3fs", label, time.time() - t0)
