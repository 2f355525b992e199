"""Test harness configuration.

Runs all tests on CPU with 8 fake XLA host devices so multi-chip sharding
paths (shard_map / pjit over a Mesh) are exercised without TPU hardware —
the standard JAX fake-multi-device trick.  Must set env before jax import.
"""

import os
import sys

# Force CPU: the ambient environment pins JAX_PLATFORMS to the TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The image's jax distribution force-selects the 'axon' TPU platform in its
# own config regardless of JAX_PLATFORMS; override it for the test suite.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def speechlike(rng) -> np.ndarray:
    """A 2-second 16 kHz speech-like test clip (harmonics + noise bursts).

    Deterministic, energetic in the 500-4000 Hz embedding band.
    """
    sr = 16000
    t = np.arange(2 * sr) / sr
    f0 = 120.0 + 30.0 * np.sin(2 * np.pi * 2.3 * t)
    x = np.zeros_like(t)
    phase = np.cumsum(2 * np.pi * f0 / sr)
    for k in range(1, 25):
        x += np.cos(k * phase) / k
    # amplitude envelope: syllable-like bursts
    env = 0.4 + 0.6 * np.clip(np.sin(2 * np.pi * 3.1 * t), 0, None)
    x = x * env + 0.02 * rng.standard_normal(len(t))
    return (x / np.max(np.abs(x))).astype(np.float32)
