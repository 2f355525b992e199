from aware_tpu.metrics.audio import (
    BER,
    PESQ,
    SNR,
    STOI,
    ber,
    pesq,
    pesq_proxy,
    snr,
    stoi,
    stoi_device,
)
from aware_tpu.metrics.pesq_p862 import pesq_wb
from aware_tpu.metrics.stoi_exact import stoi_exact

__all__ = [
    "BER", "SNR", "STOI", "PESQ",
    "ber", "snr", "stoi", "stoi_device", "stoi_exact",
    "pesq", "pesq_wb", "pesq_proxy",
]
