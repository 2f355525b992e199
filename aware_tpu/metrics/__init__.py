from aware_tpu.metrics.audio import (
    BER,
    PESQ,
    SNR,
    STOI,
    ber,
    pesq_proxy,
    snr,
    stoi,
    stoi_device,
)
from aware_tpu.metrics.stoi_exact import stoi_exact

__all__ = [
    "BER", "SNR", "STOI", "PESQ",
    "ber", "snr", "stoi", "stoi_device", "stoi_exact", "pesq_proxy",
]
