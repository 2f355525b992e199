from aware_tpu.attacks.attacks import (
    Attack,
    PCMBitDepthConversion,
    MP3Compression,
    DeleteSamples,
    Cropout,
    TimeStretch,
    PitchShift,
    Resample,
    RandomBandstop,
    SampleSupression,
    LowPassFilter,
    HighPassFilter,
    GaussianNoise,
    default_attack_suite,
)
from aware_tpu.attacks.codec import mp3_approx
from aware_tpu.attacks.vocoder import time_stretch, pitch_shift

__all__ = [
    "Attack",
    "PCMBitDepthConversion",
    "MP3Compression",
    "DeleteSamples",
    "Cropout",
    "TimeStretch",
    "PitchShift",
    "Resample",
    "RandomBandstop",
    "SampleSupression",
    "LowPassFilter",
    "HighPassFilter",
    "GaussianNoise",
    "default_attack_suite",
    "mp3_approx",
    "time_stretch",
    "pitch_shift",
]
