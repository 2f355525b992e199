from aware_tpu.metrics.audio import BER, SNR, STOI, PESQ, ber, snr, stoi, pesq_proxy

__all__ = ["BER", "SNR", "STOI", "PESQ", "ber", "snr", "stoi", "pesq_proxy"]
