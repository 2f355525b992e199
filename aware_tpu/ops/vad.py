"""Voice-activity silence gate.

The reference gates embedding on a WebRTC-VAD check: a clip is "silent"
(rejected) when fewer than 0.01 s of its 30 ms frames are classified as
speech — with 30 ms frames that means *no* frame is voiced
(reference: src/AWARE/service/embed.py:44-50,
src/AWARE/utils/audio/waveform.py:22-46).

WebRTC's GMM VAD is a host C extension; this rebuild uses a vmappable
spectral-energy VAD with the same gate semantics: a frame is voiced when it
has (a) enough energy relative to full scale, (b) a dominant share of its
energy in the speech band (80-3500 Hz), and (c) a moderate zero-crossing
rate (rejects pure tones less aggressively than hiss/DC).  Aggressiveness
maps to the energy threshold.  The C++ runtime (aware_tpu/_native) provides
the same classifier for host-side streaming ingest.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# energy thresholds (dBFS) per aggressiveness 0..3; 3 is the reference's
# setting and the strictest
_ENERGY_DBFS = (-55.0, -50.0, -45.0, -40.0)


def frame_voiced_flags(
    audio: jnp.ndarray,
    sample_rate: int = 16000,
    frame_ms: float = 30.0,
    aggressiveness: int = 3,
) -> jnp.ndarray:
    """Per-frame voiced decisions for a mono clip in [-1, 1]. -> bool (F,)"""
    frame_len = int(sample_rate * frame_ms / 1000.0)
    n = audio.shape[-1] // frame_len
    frames = audio[..., : n * frame_len].reshape(*audio.shape[:-1], n, frame_len)

    # (a) energy gate
    rms = jnp.sqrt(jnp.mean(frames**2, axis=-1) + 1e-12)
    energy_db = 20.0 * jnp.log10(rms + 1e-12)
    energetic = energy_db > _ENERGY_DBFS[aggressiveness]

    # (b) speech-band energy share via a short rFFT per frame
    spec = jnp.abs(jnp.fft.rfft(frames, axis=-1)) ** 2
    freqs = np.fft.rfftfreq(frame_len, 1.0 / sample_rate)
    band = jnp.asarray((freqs >= 80.0) & (freqs <= 3500.0), spec.dtype)
    band_share = jnp.sum(spec * band, axis=-1) / (jnp.sum(spec, axis=-1) + 1e-12)
    speechy = band_share > 0.5

    # (c) zero-crossing rate: speech sits well below white noise (~0.5)
    signs = jnp.sign(frames)
    zcr = jnp.mean(jnp.abs(jnp.diff(signs, axis=-1)) > 0, axis=-1)
    not_noise = zcr < 0.35

    return energetic & speechy & not_noise


@functools.partial(jax.jit, static_argnames=("sample_rate", "frame_ms", "aggressiveness", "min_speech_seconds"))
def _is_silent_jit(audio, sample_rate, frame_ms, aggressiveness, min_speech_seconds):
    flags = frame_voiced_flags(audio, sample_rate, frame_ms, aggressiveness)
    speech_seconds = jnp.sum(flags, axis=-1) * (frame_ms / 1000.0)
    return speech_seconds < min_speech_seconds


def is_silent(
    audio: np.ndarray | jnp.ndarray,
    sample_rate: int = 16000,
    frame_ms: float = 30.0,
    aggressiveness: int = 3,
    min_speech_seconds: float = 0.01,
) -> bool | jnp.ndarray:
    """True when the clip contains (effectively) no voiced frames.

    Accepts (L,) or batched (..., L) input; batched input returns an array.
    """
    out = _is_silent_jit(
        jnp.asarray(audio, jnp.float32),
        sample_rate,
        frame_ms,
        aggressiveness,
        min_speech_seconds,
    )
    return bool(out) if out.ndim == 0 else out
