"""Polyphase resampler vs scipy.signal.resample_poly."""

import numpy as np
import pytest
import scipy.signal

import jax
import jax.numpy as jnp

from aware_tpu.ops.resample import resample, resample_poly


@pytest.mark.parametrize(
    "up,down,n",
    [
        (160, 441, 44100),   # 44.1k -> 16k
        (441, 160, 16000),   # 16k -> 44.1k
        (2, 1, 8000),
        (1, 3, 9001),
        (320, 441, 22050),
    ],
)
def test_matches_scipy(rng, up, down, n):
    x = rng.standard_normal(n).astype(np.float32)
    ref = scipy.signal.resample_poly(x.astype(np.float64), up, down)
    ours = np.asarray(resample_poly(jnp.asarray(x), up, down))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-4)


def test_resample_rate_helper(rng):
    x = rng.standard_normal(44100).astype(np.float32)
    y = np.asarray(resample(jnp.asarray(x), 44100, 16000))
    assert len(y) == 16000
    ref = scipy.signal.resample_poly(x.astype(np.float64), 160, 441)
    np.testing.assert_allclose(y, ref, atol=5e-5)


def test_batched_and_differentiable(rng):
    xs = rng.standard_normal((3, 8000)).astype(np.float32)
    f = jax.jit(lambda a: resample_poly(a, 2, 5))
    out = np.asarray(f(jnp.asarray(xs)))
    assert out.shape == (3, 3200)
    g = jax.grad(lambda a: jnp.sum(resample_poly(a, 2, 5) ** 2))(jnp.asarray(xs[0]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_identity():
    x = jnp.ones(100)
    assert resample_poly(x, 7, 7) is x
