"""Differentiable CELP-flavored compression view (LPC-envelope codec).

VERDICT r4 item 4: the MDCT-quantization view (attacks/codec.py) hardens
marks against transform codecs but demonstrably does not model CELP-family
speech codecs (COMPRESSION_EOT_AB.json: gsm_fr 16.7->7.5% but opus_8k only
26.7->23.3%).  What an 8 kb/s CELP/SILK-family codec actually transmits:

* a COARSELY QUANTIZED short-term LPC spectral envelope (LSF codebook,
  ~1-1.5 dB average spectral distortion),
* pitch/long-term prediction plus sparse codebook excitation — the fine
  spectral structure of the residual is mostly REPLACED, only its
  envelope-scale gain survives,
* a band limit (8 kb/s speech modes code ~0.1-4 kHz).

So the only channel through such a codec is slow, envelope-scale spectral
modulation — exactly what this view exposes to the solver, end-to-end
differentiably:

    STFT (20 ms frames) -> per-frame autocorrelation (Wiener-Khinchin,
    irfft of the power spectrum) -> order-10 Levinson-Durbin ->
    all-pole envelope on the rfft grid -> straight-through log-domain
    envelope quantization (models LSF distortion) -> excitation
    flattening (mag/env)^alpha (models codebook replacement of fine
    structure) -> envelope-shaped noise floor (models coding noise) ->
    soft band limit -> ISTFT with the original phase.

Keeping the original phase is deliberately CONSERVATIVE (a real CELP
decoder's phase is synthetic): the view must never claim more damage
than the real codec, only force the mark into the surviving channel.
The real codecs (attacks/voice_codecs.py — libopus/libgsm in-process)
remain the ground-truth eval; this module is the in-graph training/
embedding pressure, like mp3_approx is for MDCT codecs.

No reference counterpart (the reference has no EOT embedding at all);
grounded against the real codecs by tools/compression_eot_ab.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_ORDER = 10          # classic narrowband CELP short-term predictor order
_FRAME_MS = 20.0

# named pressure modes: (env_step_db, alpha, noise_rel_db, cutoff_hz)
#   env_step_db  — straight-through quantization step of the log envelope
#   alpha        — excitation fine-structure exponent (1 = keep, 0 = flat)
#   noise_rel_db — envelope-shaped noise floor relative to the envelope
#   cutoff_hz    — soft band limit (None = keep full band)
MODES: dict[str, tuple[float, float, float, float | None]] = {
    # ~GSM-FR / 8 kb/s CELP pressure: strong flattening, NB limit
    "nb8k": (1.5, 0.35, -14.0, 3900.0),
    # milder medium-bitrate CELP/SILK pressure
    "mb16k": (1.0, 0.6, -20.0, 6500.0),
}


@functools.lru_cache(maxsize=8)
def _lpc_freq_tables(n_rfft: int, n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """cos/sin tables (order+1, n_rfft) evaluating A(e^{-jw}) on the grid."""
    w = 2.0 * np.pi * np.arange(n_rfft) / n_fft
    k = np.arange(_ORDER + 1)[:, None]
    return (
        np.cos(k * w[None, :]).astype(np.float32),
        np.sin(k * w[None, :]).astype(np.float32),
    )


def _ste_round(x: jnp.ndarray) -> jnp.ndarray:
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def _levinson(r: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Levinson-Durbin over the leading axis of ``r`` ((order+1, T) lags).

    Returns (a, g2): predictor coefficients a_0..a_p (a_0 = 1) shaped
    (order+1, T) and the prediction-error power g2 (T,).  Unrolled over
    the fixed order — 10 steps of pure arithmetic, differentiable, and
    trivially fused by XLA.  Regularized with a white-noise floor so
    silent/degenerate frames stay finite.
    """
    t = r.shape[1]
    r = r / (r[0:1] + 1e-10)            # normalize: r0 = 1 exactly
    r = r.at[0].set(1.0 + 1e-4)          # white-noise regularization floor
    a = jnp.zeros((_ORDER + 1, t), r.dtype).at[0].set(1.0)
    e = r[0]
    for m in range(1, _ORDER + 1):
        acc = jnp.einsum("kt,kt->t", a[:m], r[m:0:-1][-m:])
        k = -acc / e
        k = jnp.clip(k, -0.999, 0.999)   # keep the filter stable
        # a'[j] = a[j] + k * a[m-j]  (j = 0..m), with a[m] currently 0
        rev = a[:m][::-1]                # a[m-1] .. a[0]
        a = a.at[1 : m + 1].set(a[1 : m + 1] + k[None, :] * rev)
        e = e * (1.0 - k * k)
    return a, e


def celp_envelope(mag: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """All-pole (LPC-10) spectral envelope of a magnitude STFT (F, T).

    Autocorrelation comes from the frame's own power spectrum
    (Wiener-Khinchin), so no re-framing of the waveform is needed and the
    envelope lands exactly on the detector's rfft grid.
    """
    n_rfft = mag.shape[0]
    power = mag.astype(jnp.float32) ** 2
    # irfft over the frequency axis -> autocorrelation lags (n_fft, T)
    r = jnp.fft.irfft(power, n=n_fft, axis=0)[: _ORDER + 1]
    a, g2 = _levinson(r)
    cos_t, sin_t = _lpc_freq_tables(n_rfft, n_fft)
    re = jnp.einsum("kt,kf->ft", a, jnp.asarray(cos_t))
    im = jnp.einsum("kt,kf->ft", a, jnp.asarray(sin_t))
    inv_a2 = 1.0 / (re * re + im * im + 1e-8)
    # scale so the envelope matches the frame's actual in-band power
    env2 = g2[None, :] * inv_a2
    scale = jnp.sum(power, axis=0, keepdims=True) / (
        jnp.sum(env2, axis=0, keepdims=True) + 1e-10
    )
    return jnp.sqrt(env2 * scale + 1e-12)


def celp_approx_mag(
    mag: jnp.ndarray,
    sr: int,
    n_fft: int,
    mode: str = "nb8k",
) -> jnp.ndarray:
    """CELP-flavored re-coding of a magnitude STFT (F, T) -> (F, T)."""
    env_step_db, alpha, noise_rel_db, cutoff = MODES[mode]
    env = celp_envelope(mag, n_fft)

    # LSF-style coarse envelope quantization (straight-through, log domain)
    step = env_step_db / 20.0            # step in log10 magnitude
    log_env = jnp.log10(env + 1e-10)
    env_q = 10.0 ** (_ste_round(log_env / step) * step)

    # codebook excitation: compress the residual's fine structure toward
    # flat; pitch harmonics (the large peaks) survive, watermark-scale
    # wiggles are crushed.  The smoothed power form keeps the x^alpha
    # gradient bounded at ratio -> 0 (raw |x|^(alpha-1) would blow up).
    ratio = mag / (env + 1e-10)
    ratio_q = (ratio * ratio + 1e-4) ** (alpha / 2.0)

    out = env_q * ratio_q
    # envelope-shaped coding-noise floor (deterministic per-bin pseudo-
    # noise: fixed phase pattern, magnitude tied to the envelope)
    noise = 10.0 ** (noise_rel_db / 20.0) * env_q
    out = jnp.sqrt(out * out + noise * noise)

    if cutoff is not None:
        f = jnp.arange(mag.shape[0]) * (sr / n_fft)
        # soft rolloff over ~300 Hz so the view stays smooth for gradients
        gate = jax.nn.sigmoid((cutoff - f) / 60.0)
        out = out * gate[:, None]
    return out.astype(mag.dtype)


def celp_approx(x: jnp.ndarray, sr: int, mode: str = "nb8k") -> jnp.ndarray:
    """Waveform-level CELP view: length-preserving, differentiable.

    Frames with the detector's own 20 ms-scale analysis (n_fft 512 at
    16 kHz, 50% hop) and keeps the ORIGINAL phase (conservative — see the
    module docstring).
    """
    from aware_tpu.ops.stft import istft, magphase, polar, stft
    from aware_tpu.ops.windows import get_window

    n_fft = int(2 ** np.ceil(np.log2(_FRAME_MS * 1e-3 * sr)))
    hop = n_fft // 2
    w = get_window("hann", n_fft)  # numpy: istft folds it host-side
    mag, phase = magphase(stft(x, n_fft, hop, w))
    out = celp_approx_mag(mag, sr, n_fft, mode)
    y = istft(polar(out, phase), n_fft, hop, w)
    return y[..., : x.shape[-1]]
