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
    SpeedChange,
    default_attack_suite,
)
from aware_tpu.attacks.codec import mp3_approx
from aware_tpu.attacks.mp3_real import (
    MP3CompressionReal,
    mp3_roundtrip,
)
from aware_tpu.attacks.mp3_real import available as mp3_real_available
from aware_tpu.attacks.voice_codecs import (
    GSMFullRate,
    OpusCompression,
    extended_attack_suite,
    gsm_roundtrip,
    opus_roundtrip,
)
from aware_tpu.attacks.av_codecs import (
    AACCompression,
    G722Telephony,
    SpeexWideband,
    VorbisCompression,
    avc_available,
    avc_roundtrip,
)
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
    "SpeedChange",
    "default_attack_suite",
    "mp3_approx",
    "MP3CompressionReal",
    "mp3_roundtrip",
    "mp3_real_available",
    "OpusCompression",
    "GSMFullRate",
    "opus_roundtrip",
    "gsm_roundtrip",
    "extended_attack_suite",
    "AACCompression",
    "VorbisCompression",
    "SpeexWideband",
    "G722Telephony",
    "avc_available",
    "avc_roundtrip",
    "time_stretch",
    "pitch_shift",
]
