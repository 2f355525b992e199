"""STFT/ISTFT parity vs torch oracles.

The embed solver differentiates through an ISTFT->STFT round trip every
iteration (reference: multibit_embedder.py:49-67), so these ops must match
``torch.stft``/``torch.istft`` to float tolerance.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from aware_tpu.ops import (
    get_window,
    istft,
    istft_length,
    magphase,
    num_frames,
    overlap_add,
    peak_normalize,
    polar,
    stft,
)

N_FFT, HOP = 1024, 256


def _torch_stft(x: np.ndarray, window: str = "hann"):
    w = torch.hann_window(N_FFT) if window == "hann" else torch.hamming_window(N_FFT)
    return torch.stft(
        torch.from_numpy(x), n_fft=N_FFT, hop_length=HOP, center=True,
        window=w, return_complex=True,
    ).numpy()


def _torch_istft(z: np.ndarray, window: str = "hann"):
    w = torch.hann_window(N_FFT) if window == "hann" else torch.hamming_window(N_FFT)
    return torch.istft(
        torch.from_numpy(z), n_fft=N_FFT, hop_length=HOP, center=True, window=w
    ).numpy()


@pytest.mark.parametrize("length", [4096, 16000, 16001, 16123])
@pytest.mark.parametrize("window", ["hann", "hamming"])
def test_stft_matches_torch(rng, length, window):
    x = rng.standard_normal(length).astype(np.float32)
    ours = np.asarray(stft(jnp.asarray(x), N_FFT, HOP, window))
    ref = _torch_stft(x, window)
    assert ours.shape == ref.shape == (N_FFT // 2 + 1, num_frames(length, HOP))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-5)


@pytest.mark.parametrize("length", [4096, 16000, 16123])
def test_istft_matches_torch(rng, length):
    x = rng.standard_normal(length).astype(np.float32)
    z = _torch_stft(x)
    ours = np.asarray(istft(jnp.asarray(z), N_FFT, HOP, "hann"))
    ref = _torch_istft(z)
    assert ours.shape == ref.shape == (istft_length(z.shape[1], HOP),)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


def test_istft_on_modified_magnitude(rng):
    """Round trip on a *modified* (non-consistent) spectrogram — the actual
    embed-loop case — must still match torch."""
    x = rng.standard_normal(16000).astype(np.float32)
    z = _torch_stft(x)
    mag, phase = np.abs(z), np.angle(z)
    mag2 = mag * (1.0 + 0.3 * rng.standard_normal(mag.shape)).astype(np.float32)
    z2 = (mag2 * np.exp(1j * phase)).astype(np.complex64)
    ours = np.asarray(istft(polar(jnp.asarray(mag2), jnp.asarray(phase)), N_FFT, HOP))
    ref = _torch_istft(z2)
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-5)


def test_roundtrip_reconstruction(rng):
    """STFT -> ISTFT on an unmodified signal reconstructs it (minus the tail
    truncation to a hop multiple)."""
    x = rng.standard_normal(16123).astype(np.float32)
    y = np.asarray(istft(stft(jnp.asarray(x), N_FFT, HOP), N_FFT, HOP))
    n = len(y)
    assert n == (16123 // HOP) * HOP
    np.testing.assert_allclose(y, x[:n], atol=1e-5, rtol=1e-5)


def test_overlap_add_generic_matches_fast(rng):
    frames = rng.standard_normal((10, 1024)).astype(np.float32)
    fast = np.asarray(overlap_add(jnp.asarray(frames), 256))
    # generic scatter path (hop not dividing n_fft is emulated via hop=255)
    ref = np.zeros((9 * 256 + 1024,), np.float32)
    for t in range(10):
        ref[t * 256 : t * 256 + 1024] += frames[t]
    np.testing.assert_allclose(fast, ref, atol=1e-5)


def test_batched_and_jitted(rng):
    xs = rng.standard_normal((3, 8192)).astype(np.float32)
    f = jax.jit(jax.vmap(lambda x: stft(x, N_FFT, HOP)))
    out = np.asarray(f(jnp.asarray(xs)))
    for i in range(3):
        np.testing.assert_allclose(out[i], _torch_stft(xs[i]), atol=2e-4, rtol=1e-5)


def test_gradient_flows_through_roundtrip(rng):
    x = rng.standard_normal(8192).astype(np.float32)
    z = stft(jnp.asarray(x), N_FFT, HOP)
    mag, phase = magphase(z)

    def loss(m):
        y = istft(polar(m, phase), N_FFT, HOP)
        m2 = jnp.abs(stft(peak_normalize(y), N_FFT, HOP))
        return jnp.sum(m2**2)

    g = jax.grad(loss)(mag)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_peak_normalize_matches_reference_semantics(rng):
    x = rng.standard_normal(1000).astype(np.float32) * 7.3
    ours = np.asarray(peak_normalize(jnp.asarray(x)))
    ref = x / (np.max(np.abs(x)) + 1e-8)
    np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_window_matches_torch():
    np.testing.assert_allclose(
        get_window("hann", 1024), torch.hann_window(1024).numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        get_window("hamming", 1024), torch.hamming_window(1024).numpy(), atol=1e-6
    )
