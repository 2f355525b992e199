"""aware_tpu — TPU-native audio watermarking framework.

A from-scratch JAX/XLA/Pallas rebuild of the AWARE audio watermarker
(zero-training, optimization-based multi-bit watermarking).  The public API
mirrors the reference surface (reference: README.md:11-47):

    from aware_tpu import load, embed_watermark, detect_watermark
    from aware_tpu.metrics import BER, SNR, STOI, PESQ

Design: pure functions over a frozen params pytree; the per-clip adversarial
embed loop is a single ``lax.scan`` compiled under ``jit``; batching is
``vmap``; multi-chip scale-out is ``shard_map`` over a device mesh.
"""

from aware_tpu.version import __version__

__all__ = [
    "__version__",
    "load",
    "embed_watermark",
    "detect_watermark",
]


def __getattr__(name):
    # Lazy so that `import aware_tpu.ops` doesn't pull in the full service
    # stack (keeps cold-start light for kernel-only users).
    if name in ("load", "embed_watermark", "detect_watermark"):
        from aware_tpu import service

        return getattr(service, name)
    raise AttributeError(f"module 'aware_tpu' has no attribute {name!r}")
