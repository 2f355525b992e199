"""Fused OLA/normalize Pallas kernel vs the unfused XLA chain.

Runs in interpreter mode on CPU (the kernel auto-selects); the same code
compiles to Mosaic on TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aware_tpu.config import AwareConfig
from aware_tpu.ops.pallas import ola_normalize
from aware_tpu.ops.stft import istft_synthesis, peak_normalize
from aware_tpu.ops.windows import get_window

N_FFT, HOP = 1024, 256


def _xla_chain(wframes, window):
    return peak_normalize(
        peak_normalize(istft_synthesis(wframes, N_FFT, HOP, window))
    )


@pytest.fixture(scope="module")
def wframes(rng):
    t = 63  # 16k-sample clip
    return jnp.asarray(rng.standard_normal((2, t, N_FFT)).astype(np.float32))


@pytest.fixture(scope="module")
def window():
    return get_window("hann", N_FFT)


def test_forward_matches_xla(wframes, window):
    wkey = tuple(window.tolist())
    ours = np.asarray(ola_normalize(wframes, N_FFT, HOP, wkey))
    for i in range(wframes.shape[0]):
        ref = np.asarray(_xla_chain(wframes[i], window))
        np.testing.assert_allclose(ours[i], ref, atol=1e-6, rtol=1e-6)


def test_gradient_matches_autodiff(wframes, window):
    wkey = tuple(window.tolist())
    probe = jnp.asarray(
        np.random.default_rng(3).standard_normal(
            (wframes.shape[0], (wframes.shape[1] - 1) * HOP)
        ).astype(np.float32)
    )

    def loss_pallas(wf):
        return jnp.sum(ola_normalize(wf, N_FFT, HOP, wkey) * probe)

    def loss_xla(wf):
        return sum(
            jnp.sum(_xla_chain(wf[i], window) * probe[i])
            for i in range(wf.shape[0])
        )

    g_pallas = jax.grad(loss_pallas)(wframes)
    g_xla = jax.grad(loss_xla)(wframes)
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_xla), atol=1e-5, rtol=1e-4
    )


def test_solver_pallas_flag_matches(rng, speechlike):
    """Embed with the Pallas path enabled tracks the XLA path (outcome
    level; the chaotic loop amplifies fp differences)."""
    from aware_tpu.embed import embed_one
    from aware_tpu.models import init_params

    cfg_off = AwareConfig().replace(num_iterations=15, use_pallas_ola=False)
    cfg_on = AwareConfig().replace(num_iterations=15, use_pallas_ola=True)
    params = init_params(cfg_off.detection_net)
    wm = jnp.asarray((rng.integers(0, 2, 20) * 2 - 1).astype(np.float32))
    x = jnp.asarray(speechlike)
    r_off = embed_one(params, x, wm, cfg_off)
    r_on = embed_one(params, x, wm, cfg_on)
    assert abs(float(r_off.best_loss) - float(r_on.best_loss)) < 2e-2
    np.testing.assert_allclose(
        np.asarray(r_on.audio), np.asarray(r_off.audio), atol=1e-1
    )


def test_vmap_compatible(wframes, window):
    wkey = tuple(window.tolist())
    single = lambda wf: ola_normalize(wf[None], N_FFT, HOP, wkey)[0]
    batched = jax.vmap(single)(wframes)
    ref = ola_normalize(wframes, N_FFT, HOP, wkey)
    np.testing.assert_allclose(
        np.asarray(batched), np.asarray(ref), atol=1e-6
    )
