from aware_tpu.ops.windows import get_window
from aware_tpu.ops.stft import (
    stft,
    istft,
    stft_frames,
    num_frames,
    istft_length,
    overlap_add,
    peak_normalize,
    magphase,
    polar,
)
from aware_tpu.ops.mel import mel_filter_bank

__all__ = [
    "get_window",
    "stft",
    "istft",
    "stft_frames",
    "num_frames",
    "istft_length",
    "overlap_add",
    "peak_normalize",
    "magphase",
    "polar",
    "mel_filter_bank",
]
