"""Audio quality / detection metrics.

Device-side, vmappable implementations of the reference metric surface
(reference: src/AWARE/metrics/audio.py:8-89):

* ``ber``  — bit error rate **as a percentage** (reference quirk, :16).
* ``snr``  — 10*log10(P_out / P_err) with the *output* power in the
  numerator (nonstandard; reference :89), +inf on identical signals.
* ``stoi`` — exact host-side STOI (aware_tpu.metrics.stoi_exact — the
  pystoi algorithm the reference calls); ``stoi_device`` is the traced
  approximation for in-graph use (tracks exact to <2e-3 on additive
  noise).
* ``pesq`` — wideband PESQ MOS-LQO via the host-side P.862.2 pipeline
  (aware_tpu.metrics.pesq_p862; reference calls the ITU C extension).
* ``pesq_proxy`` — traced PESQ-style score in [1.02, 4.64] for in-graph /
  training use; its map is least-squares calibrated against ``pesq`` over
  a 72-pair degradation corpus spanning continuous AND pause-bearing
  speech (tools/calibrate_proxy.py — MAE 0.155 MOS, Pearson 0.97;
  PROXY_CALIBRATION.json).

All metrics take (output, target) in reference argument order, accept
stereo (L, 2) input (mean-downmixed, :27-33), truncate to the common
length, and resample to their operating rate on-device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aware_tpu.ops.resample import resample
from aware_tpu.ops.stft import stft
from aware_tpu.ops.windows import get_window


def _downmix_pair(output, target):
    """Stereo -> mono mean downmix + truncate to common length (host-side
    shape logic; reference :27-35)."""
    output = np.asarray(output, dtype=np.float32)
    target = np.asarray(target, dtype=np.float32)
    if output.ndim == 2 and output.shape[1] == 2:
        output = output.mean(axis=1)
    if target.ndim == 2 and target.shape[1] == 2:
        target = target.mean(axis=1)
    n = min(len(output), len(target))
    return output[:n], target[:n]


# ------------------------------------------------------------------- BER ---

def ber(output, target) -> float:
    """Percent bit mismatches (reference: :8-17)."""
    output = np.asarray(output)
    target = np.asarray(target)
    return float(np.mean(output != target) * 100.0)


# ------------------------------------------------------------------- SNR ---

def snr(output, target) -> float:
    """Reference-form SNR (output power over error power), dB (:68-89)."""
    output, target = _downmix_pair(output, target)
    if np.array_equal(output, target):
        return float("inf")
    return float(
        10.0
        * np.log10(np.mean(output**2) / np.mean((output - target) ** 2))
    )


# ------------------------------------------------------------------ STOI ---

_STOI_SR = 10000
_STOI_NFFT = 512
_STOI_FRAME = 256
_STOI_HOP = 128
_STOI_NBANDS = 15
_STOI_MINFREQ = 150.0
_STOI_N = 30          # 384 ms segments
_STOI_BETA_DB = -15.0  # SDR clip
_STOI_DYN_RANGE = 40.0


@functools.lru_cache(maxsize=4)
def _third_octave_matrix() -> np.ndarray:
    """(15, 257) one-third-octave band aggregation matrix at 10 kHz."""
    f = np.linspace(0, _STOI_SR / 2, _STOI_NFFT // 2 + 1)
    cf = _STOI_MINFREQ * 2.0 ** (np.arange(_STOI_NBANDS) / 3.0)
    lo = cf * 2.0 ** (-1.0 / 6.0)
    hi = cf * 2.0 ** (1.0 / 6.0)
    mat = np.zeros((_STOI_NBANDS, len(f)), dtype=np.float32)
    for i in range(_STOI_NBANDS):
        # snap band edges to the nearest FFT bins (as the published
        # implementation does)
        lo_i = np.argmin((f - lo[i]) ** 2)
        hi_i = np.argmin((f - hi[i]) ** 2)
        mat[i, lo_i:hi_i] = 1.0
    return mat


def _frames(x: jnp.ndarray, frame: int, hop: int) -> jnp.ndarray:
    n = (x.shape[-1] - frame) // hop + 1
    idx = np.arange(n)[:, None] * hop + np.arange(frame)[None, :]
    return x[..., idx]


def _stoi_core(x10: jnp.ndarray, y10: jnp.ndarray) -> jnp.ndarray:
    """STOI of two equal-length 10 kHz signals (traced; silent-frame removal
    uses a mask-weighted formulation to stay shape-static)."""
    w = jnp.asarray(get_window("hann", _STOI_FRAME + 1)[1:], jnp.float32)
    # hanning(256) in the published MATLAB is symmetric with zero endpoints;
    # approximation: periodic hann shifted — close enough for correlation
    # statistics; exactness vs pystoi is not claimed (package unavailable).
    xf = _frames(x10, _STOI_FRAME, _STOI_HOP) * w
    yf = _frames(y10, _STOI_FRAME, _STOI_HOP) * w

    # silent-frame mask from the *clean* signal energy (x = target)
    e = 20.0 * jnp.log10(jnp.linalg.norm(xf, axis=-1) + 1e-12)
    mask = e > (jnp.max(e) - _STOI_DYN_RANGE)

    spec_x = jnp.abs(jnp.fft.rfft(xf, n=_STOI_NFFT, axis=-1)) ** 2
    spec_y = jnp.abs(jnp.fft.rfft(yf, n=_STOI_NFFT, axis=-1)) ** 2
    octmat = jnp.asarray(_third_octave_matrix())
    X = jnp.sqrt(spec_x @ octmat.T + 1e-20)  # (F, 15)
    Y = jnp.sqrt(spec_y @ octmat.T + 1e-20)

    # segments of N frames; a segment counts when all frames are non-silent
    n_frames = X.shape[0]
    n_seg = n_frames - _STOI_N + 1
    seg_idx = np.arange(max(n_seg, 1))[:, None] + np.arange(_STOI_N)[None, :]
    Xs = X[seg_idx]           # (S, N, 15)
    Ys = Y[seg_idx]
    seg_ok = jnp.all(mask[seg_idx], axis=1)  # (S,)

    # normalize Y to X energy per (segment, band), clip at -15 dB SDR
    alpha = jnp.sqrt(
        jnp.sum(Xs**2, axis=1, keepdims=True)
        / (jnp.sum(Ys**2, axis=1, keepdims=True) + 1e-20)
    )
    Yn = Ys * alpha
    clip = 10.0 ** (-_STOI_BETA_DB / 20.0)
    Yn = jnp.minimum(Yn, Xs * (1.0 + clip))

    xm = Xs - jnp.mean(Xs, axis=1, keepdims=True)
    ym = Yn - jnp.mean(Yn, axis=1, keepdims=True)
    corr = jnp.sum(xm * ym, axis=1) / (
        jnp.linalg.norm(xm, axis=1) * jnp.linalg.norm(ym, axis=1) + 1e-20
    )  # (S, 15)
    seg_d = jnp.mean(corr, axis=-1)
    w_ok = seg_ok.astype(seg_d.dtype)
    return jnp.sum(seg_d * w_ok) / (jnp.sum(w_ok) + 1e-20)


def stoi_device(output, target, sampling_rate: int) -> float:
    """Traced/vmappable STOI approximation (in-graph & training use).

    For reported scores use :func:`stoi`, which runs the exact pystoi
    algorithm host-side.
    """
    output, target = _downmix_pair(output, target)
    x = resample(jnp.asarray(target), sampling_rate, _STOI_SR)
    y = resample(jnp.asarray(output), sampling_rate, _STOI_SR)
    return float(_stoi_core(x, y))


def stoi(output, target, sampling_rate: int) -> float:
    """Exact STOI of ``output`` given clean ``target``.

    Mirrors the reference wrapper (metrics/audio.py:42-64): stereo
    mean-downmix, truncate to common length, resample to 16 kHz, then the
    pystoi algorithm (which itself resamples to 10 kHz) — implemented
    exactly in aware_tpu.metrics.stoi_exact.
    """
    from aware_tpu.metrics.stoi_exact import stoi_exact

    output, target = _downmix_pair(output, target)
    if sampling_rate != 16000:
        output = np.asarray(resample(jnp.asarray(output), sampling_rate, 16000))
        target = np.asarray(resample(jnp.asarray(target), sampling_rate, 16000))
    return stoi_exact(target, output, 16000)


# ------------------------------------------------------------ PESQ proxy ---

_PESQ_SR = 16000


def _bark_matrix(n_fft: int, sr: int, n_bands: int = 49) -> np.ndarray:
    """Triangular Bark-scale aggregation (z = 13 atan(.00076 f) +
    3.5 atan((f/7500)^2))."""
    f = np.linspace(0, sr / 2, n_fft // 2 + 1)
    z = 13.0 * np.arctan(0.00076 * f) + 3.5 * np.arctan((f / 7500.0) ** 2)
    z_edges = np.linspace(z[1], z[-1], n_bands + 2)
    mat = np.zeros((n_bands, len(f)), dtype=np.float32)
    for i in range(n_bands):
        lo, cf, hi = z_edges[i], z_edges[i + 1], z_edges[i + 2]
        up = (z - lo) / max(cf - lo, 1e-6)
        dn = (hi - z) / max(hi - cf, 1e-6)
        mat[i] = np.clip(np.minimum(up, dn), 0.0, None)
    return mat


@functools.lru_cache(maxsize=4)
def _pesq_bark() -> np.ndarray:
    return _bark_matrix(512, _PESQ_SR)


def _pesq_nd(ref16: jnp.ndarray, deg16: jnp.ndarray) -> jnp.ndarray:
    """Normalized perceptual disturbance (pre-map) of the PESQ proxy.

    Level-normalizes both signals (PESQ is level-invariant), compares Bark
    loudness over ALL frames — silent frames included, exactly where
    additive noise hurts most in P.862 — with the P.862 asymmetry idea
    (added disturbance weighted above removed signal).
    """
    w = get_window("hann", 512)
    ref16 = ref16 / (jnp.sqrt(jnp.mean(ref16**2)) + 1e-9)
    deg16 = deg16 / (jnp.sqrt(jnp.mean(deg16**2)) + 1e-9)
    R = jnp.abs(stft(ref16, 512, 256, w)) ** 2  # (257, T)
    D = jnp.abs(stft(deg16, 512, 256, w)) ** 2
    bark = jnp.asarray(_pesq_bark())
    # loudness-ish compression (Zwicker exponent on band power)
    Lr = (bark @ R + 1e-10) ** 0.23
    Ld = (bark @ D + 1e-10) ** 0.23
    diff = Ld - Lr
    # P.862 asymmetry: added distortion hurts more than removed signal
    disturbance = jnp.where(diff > 0, 1.8 * diff, -0.6 * diff)
    d = jnp.mean(jnp.mean(disturbance, axis=0))
    rms_l = jnp.sqrt(jnp.mean(jnp.mean(Lr, axis=0) ** 2))
    return d / (rms_l + 1e-9)


def _pesq_core(ref16: jnp.ndarray, deg16: jnp.ndarray) -> jnp.ndarray:
    nd = _pesq_nd(ref16, deg16)
    # stretched-exponential map to the wideband MOS-LQO range [1.02, 4.64];
    # constants least-squares fitted against the exact P.862.2
    # implementation (tools/calibrate_proxy.py, PROXY_CALIBRATION.json)
    return 1.02 + 3.6296 * jnp.exp(-2.6283 * (nd + 1e-9) ** 1.1667)


def pesq_proxy(output, target, sampling_rate: int) -> float:
    """Traced PESQ-style perceptual proxy in [1.02, 4.64] for in-graph /
    training use; calibrated against :func:`pesq` (the host P.862.2
    implementation) — see tools/calibrate_proxy.py and
    PROXY_CALIBRATION.json.  For reported scores use :func:`pesq`.
    """
    output, target = _downmix_pair(output, target)
    d = resample(jnp.asarray(output), sampling_rate, _PESQ_SR)
    r = resample(jnp.asarray(target), sampling_rate, _PESQ_SR)
    return float(_pesq_core(r, d))


def pesq(output, target, sampling_rate: int) -> float:
    """Wideband PESQ MOS-LQO (P.862.2 pipeline, host-side).

    Mirrors the reference wrapper (metrics/audio.py:19-39): stereo
    mean-downmix, truncate to common length, resample to 16 kHz, then
    ``pesq(16000, ref, deg, 'wb')`` — implemented in
    aware_tpu.metrics.pesq_p862 (see its docstring for the exactness
    statement: ITU pipeline/constants, reconstructed band tables).
    """
    from aware_tpu.metrics.pesq_p862 import pesq_wb

    output, target = _downmix_pair(output, target)
    if sampling_rate != 16000:
        output = np.asarray(resample(jnp.asarray(output), sampling_rate, 16000))
        target = np.asarray(resample(jnp.asarray(target), sampling_rate, 16000))
    return pesq_wb(target, output, 16000)


# ------------------------------------------------- reference-style classes ---

class BER:
    """Callable matching the reference class surface (reference: :8-17)."""

    def __call__(self, output, target) -> float:
        return ber(output, target)


class SNR:
    def __call__(self, output, target) -> float:
        return snr(output, target)


class STOI:
    def __call__(self, output, target, sampling_rate: int) -> float:
        return stoi(output, target, sampling_rate)


class PESQ:
    """Wideband PESQ callable (P.862.2 pipeline; reference calls the ITU C
    extension at :19-39)."""

    def __call__(self, output, target, sampling_rate: int) -> float:
        return pesq(output, target, sampling_rate)
