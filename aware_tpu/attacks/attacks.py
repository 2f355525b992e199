"""Signal-edit attack suite.

TPU-native rebuild of the reference's 12 attack classes
(reference: scripts/attacks.py:16-455).  Every attack is a small dataclass
with ``apply(audio, sr, key=None) -> np.ndarray`` (numpy in/out, JAX
compute inside, jit-cached per shape).  Random attacks take an explicit
``jax.random`` key (or an int seed) instead of mutating global RNG state —
deterministic and vmappable by construction.

Where the reference shells out to native tools, the rebuild is in-graph:

* MP3Compression  -> MDCT perceptual-quantization approximation (codec.py)
* TimeStretch / PitchShift -> phase vocoder (vocoder.py)
* butter/filtfilt/lfilter  -> ops.iir (SOS cascades where f32 needs them)

Length-changing attacks (DeleteSamples, Cropout, TimeStretch) return
shorter/longer arrays exactly like the reference — desync is the point.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from aware_tpu.attacks.codec import mp3_approx
from aware_tpu.attacks.vocoder import pitch_shift, time_stretch
from aware_tpu.ops.iir import butter, butter_sos, lfilter, sosfiltfilt
from aware_tpu.ops.resample import resample_poly


def _key(key) -> jax.Array:
    if key is None:
        raise ValueError(
            "this attack is randomized: pass key= (jax PRNGKey or int seed)"
        )
    if isinstance(key, int):
        return jax.random.PRNGKey(key)
    return key


class Attack:
    """Base attack (reference: attacks.py:16-30)."""

    name: str = "attack"

    def apply(self, audio: np.ndarray, sr: int, key=None) -> np.ndarray:
        raise NotImplementedError


@dataclasses.dataclass
class PCMBitDepthConversion(Attack):
    """Quantize to signed 8/12/16/24-bit PCM and back (reference: :33-70).

    Matches the reference's truncating float->int cast.
    """

    pcm: int = 16

    _LEVELS = {8: (127.0, -128, 127), 12: (4095.0, -4096, 4095),
               16: (32767.0, -32768, 32767), 24: (8388607.0, -8388608, 8388607)}

    def __post_init__(self):
        if self.pcm not in self._LEVELS:
            raise ValueError(f"Unsupported PCM bit depth: {self.pcm}")
        self.name = f"pcm_{self.pcm}"

    def apply(self, audio, sr, key=None):
        scale, lo, hi = self._LEVELS[self.pcm]
        x = jnp.asarray(audio, jnp.float32)
        x = x / (jnp.max(jnp.abs(x)) + 1e-8)
        q = jnp.trunc(jnp.clip(x * scale, lo, hi))  # C-cast truncation
        return np.asarray(q / scale, dtype=np.float32)


@dataclasses.dataclass
class MP3Compression(Attack):
    """In-graph lossy-compression approximation (differentiable MDCT
    model; the REAL codec lives in :mod:`aware_tpu.attacks.mp3_real` and
    reports as ``mp3_{q}`` like the reference's ffmpeg rows
    (reference: :73-148); this approximation reports as
    ``mp3approx_{q}``)."""

    quality: int = 2
    pcm_bits: int = 16

    def __post_init__(self):
        self.name = f"mp3approx_{self.quality}"

    def apply(self, audio, sr, key=None):
        pre = PCMBitDepthConversion(self.pcm_bits).apply(audio, sr)
        return np.asarray(
            mp3_approx(jnp.asarray(pre), sr, self.quality), dtype=np.float32
        )


@dataclasses.dataclass
class DeleteSamples(Attack):
    """Remove a random contiguous fraction — desync (reference: :151-178)."""

    percentage: float = 0.1

    def __post_init__(self):
        self.name = f"delete_{self.percentage}"

    def apply(self, audio, sr, key=None):
        k = _key(key)
        n = len(audio)
        d = int(self.percentage * n)
        start = int(jax.random.randint(k, (), 0, n - d))
        return np.concatenate([audio[:start], audio[start + d :]])


@dataclasses.dataclass
class Cropout(Attack):
    """Drop the first percentage*sr samples (reference: :181-205)."""

    percentage: float = 0.1

    def __post_init__(self):
        self.name = f"cropout_{self.percentage}"

    def apply(self, audio, sr, key=None):
        return np.asarray(audio)[int(self.percentage * sr) :]


@dataclasses.dataclass
class TimeStretch(Attack):
    """Phase-vocoder speed change (reference: :208-228 via rubberband)."""

    rate: float = 1.0

    def __post_init__(self):
        self.name = f"ts_{self.rate}"

    def apply(self, audio, sr, key=None):
        return np.asarray(
            time_stretch(jnp.asarray(audio, jnp.float32), self.rate),
            dtype=np.float32,
        )


@dataclasses.dataclass
class PitchShift(Attack):
    """Pitch shift by cents/100 semitones — the reference's unit quirk
    (5 'cents' -> 0.05 semitones) is preserved (reference: :231-252)."""

    cents: float = 5

    def __post_init__(self):
        self.name = f"ps_{self.cents}"  # reference names the default "ps_5"

    def apply(self, audio, sr, key=None):
        return np.asarray(
            pitch_shift(jnp.asarray(audio, jnp.float32), self.cents / 100.0),
            dtype=np.float32,
        )


@dataclasses.dataclass
class Resample(Attack):
    """Rate round trip (reference: :256-294): naive decimate + linear
    re-interp when sr is a multiple of target, else a 441/160 polyphase
    round trip."""

    target_sr: int = 16000

    def __post_init__(self):
        self.name = f"resample_{self.target_sr}"

    def apply(self, audio, sr, key=None):
        factor = sr // self.target_sr
        x = jnp.asarray(audio, jnp.float32)
        if factor > 1:
            down = x[::factor]
            t = np.arange(len(audio))
            tp = np.arange(0, len(audio), factor)
            return np.interp(t, tp, np.asarray(down)).astype(np.float32)
        y = resample_poly(x, 441, 160)
        y = resample_poly(y, 160, 441)
        return np.asarray(y, dtype=np.float32)


@dataclasses.dataclass
class RandomBandstop(Attack):
    """Zero-phase Butterworth stop of a random 200 Hz band in
    [min_freq, max_freq] (reference: :298-356).  Uses an SOS cascade —
    the order-8 narrow bandstop is unstable in f32 direct form."""

    band_width: float = 200.0
    min_freq: float = 300.0
    max_freq: float = 4000.0
    order: int = 4

    def __post_init__(self):
        self.name = f"bandstop_{int(self.band_width)}Hz"

    def apply(self, audio, sr, key=None):
        k = _key(key)
        f_low = float(
            jax.random.uniform(
                k, (), minval=self.min_freq, maxval=self.max_freq - self.band_width
            )
        )
        nyq = sr / 2.0
        sos = butter_sos(
            self.order, (f_low / nyq, (f_low + self.band_width) / nyq), "bandstop"
        )
        return np.asarray(
            sosfiltfilt(sos, jnp.asarray(audio, jnp.float32)), dtype=np.float32
        )


@dataclasses.dataclass
class SampleSupression(Attack):
    """Zero a random percentage*sr window (reference: :359-385).

    (Class name [sic] kept for API compatibility.)
    """

    percentage: float = 0.1

    def __post_init__(self):
        self.name = f"sample_supression_{self.percentage}"

    def apply(self, audio, sr, key=None):
        k = _key(key)
        n = len(audio)
        d = int(self.percentage * sr)
        start = int(jax.random.randint(k, (), 0, n - d))
        out = np.array(audio, copy=True)
        out[start : start + d] = 0
        return out


@dataclasses.dataclass
class LowPassFilter(Attack):
    """Causal Butterworth LP (reference: :388-423)."""

    cut_off: float = 4000.0
    order: int = 6

    def __post_init__(self):
        self.name = "low_pass"

    def apply(self, audio, sr, key=None):
        b, a = butter(self.order, self.cut_off / (0.5 * sr), "low")
        return np.asarray(
            lfilter(b, a, jnp.asarray(audio, jnp.float32)), dtype=np.float32
        )


@dataclasses.dataclass
class HighPassFilter(Attack):
    """Causal Butterworth HP (reference: :426-455); SOS cascade for f32
    stability of the near-DC poles."""

    cut_off: float = 500.0
    order: int = 4

    def __post_init__(self):
        self.name = "high_pass"

    def apply(self, audio, sr, key=None):
        from aware_tpu.ops.iir import sosfilt

        sos = butter_sos(self.order, self.cut_off / (0.5 * sr), "high")
        return np.asarray(
            sosfilt(sos, jnp.asarray(audio, jnp.float32)), dtype=np.float32
        )


@dataclasses.dataclass
class SpeedChange(Attack):
    """Playback-rate change (tape/vinyl speed): resampling desync that
    shifts both time base and pitch (TPU-rebuild extension; recoverable by
    service.robust.detect_watermark_robust)."""

    rate: float = 1.05

    def __post_init__(self):
        self.name = f"speed_{self.rate}"

    def apply(self, audio, sr, key=None):
        frac = __import__("fractions").Fraction(self.rate).limit_denominator(64)
        return np.asarray(
            resample_poly(
                jnp.asarray(audio, jnp.float32), frac.numerator, frac.denominator
            ),
            dtype=np.float32,
        )


@dataclasses.dataclass
class GaussianNoise(Attack):
    """Additive white noise at a target SNR (TPU-rebuild extension; the
    driver's north star lists additive noise among the edit simulations)."""

    snr_db: float = 30.0

    def __post_init__(self):
        self.name = f"noise_{self.snr_db}dB"

    def apply(self, audio, sr, key=None):
        k = _key(key)
        x = jnp.asarray(audio, jnp.float32)
        p_sig = jnp.mean(x**2)
        p_noise = p_sig / (10.0 ** (self.snr_db / 10.0))
        noise = jnp.sqrt(p_noise) * jax.random.normal(k, x.shape)
        return np.asarray(x + noise, dtype=np.float32)


def default_attack_suite(real_mp3: bool | None = None) -> list[Attack]:
    """The reference eval harness's 22 attack instances
    (reference: scripts/test.py:15-18).

    The four MP3 rows use the REAL codec (libmp3lame/libmpg123 bound in
    :mod:`aware_tpu.attacks.mp3_real` — the same codec the reference's
    ffmpeg subprocess runs) when the libraries are present, matching the
    reference's row semantics exactly; ``real_mp3=False`` forces the
    in-graph approximation (``mp3approx_{q}`` rows), e.g. for a fully
    jittable suite.
    """
    from aware_tpu.attacks import mp3_real

    if real_mp3 is None:
        real_mp3 = mp3_real.available()
    mp3_cls = mp3_real.MP3CompressionReal if real_mp3 else MP3Compression
    return [
        PCMBitDepthConversion(8), PCMBitDepthConversion(12),
        PCMBitDepthConversion(16), PCMBitDepthConversion(24),
        mp3_cls(9), mp3_cls(5), mp3_cls(2),
        mp3_cls(0),
        DeleteSamples(0.1), DeleteSamples(0.15), DeleteSamples(0.2),
        TimeStretch(0.8), TimeStretch(0.9), TimeStretch(1.1), TimeStretch(1.2),
        PitchShift(),
        Resample(),
        RandomBandstop(),
        SampleSupression(0.1), SampleSupression(0.25),
        LowPassFilter(), HighPassFilter(),
    ]
