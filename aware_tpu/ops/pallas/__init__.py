from aware_tpu.ops.pallas.ola_norm import ola_normalize

__all__ = ["ola_normalize"]
