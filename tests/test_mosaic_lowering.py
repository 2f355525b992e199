"""AOT Mosaic lowering regression tests (CPU-only, no chip).

The rest of the suite runs Pallas kernels in interpret mode, which skips
Mosaic lowering entirely — a kernel edit can keep every equivalence test
green yet fail to lower on the real chip (round-5 example: jax 0.9.0
Mosaic rejects strided sublane slices as an unsupported gather, which
broke every chip program while CPU tests passed).  These tests build the
real Mosaic modules via jax's cross-platform AOT path
(``.trace(...).lower(lowering_platforms=("tpu",))``), which needs no TPU
device.  The full program set (megakernel, whole-step, composition) is
covered by ``python tools/mosaic_lower_check.py``; here we gate the two
detector programs every chip path shares, which is fast enough for the
default suite.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture()
def params():
    from aware_tpu.config import AwareConfig
    from aware_tpu.models import init_params

    return init_params(AwareConfig().detection_net)


@pytest.fixture()
def force_mosaic(monkeypatch):
    """Disable interpret mode in the kernel modules for this test only."""
    from aware_tpu.ops.pallas import analysis_detector, detector

    monkeypatch.setattr(detector, "_use_interpret", lambda: False)
    monkeypatch.setattr(analysis_detector, "_use_interpret", lambda: False)


def _lower_tpu(fn, *args):
    jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


def test_detector_fused_lowers_to_mosaic(params, force_mosaic):
    from aware_tpu.config import AwareConfig, in_band_bins
    from aware_tpu.ops.mel import mel_filter_bank
    from aware_tpu.ops.pallas.detector import (
        P_BAND,
        detector_fused,
        fused_detector_consts,
    )

    cfg = AwareConfig()
    net = cfg.detection_net
    lo, hi = in_band_bins(net.sample_rate, net.n_fft, cfg.embedding_bands)
    nb = hi - lo
    t_frames = 126
    basis = mel_filter_bank(net.sample_rate, net.n_fft, net.n_mels)
    p = {k: jnp.asarray(v) for k, v in params.items()}
    consts = fused_detector_consts(p, basis, lo, hi, t_frames)

    rng = np.random.default_rng(3)
    cs = np.zeros((t_frames, 2 * P_BAND), np.float32)
    cs[:, :nb] = rng.standard_normal((t_frames, nb)) * 0.1
    cs[:, P_BAND : P_BAND + nb] = rng.standard_normal((t_frames, nb)) * 0.1
    cs = jnp.asarray(cs)
    g = jnp.asarray(rng.standard_normal(20).astype(np.float32))

    _lower_tpu(lambda c: detector_fused(c, consts), cs)
    _lower_tpu(
        lambda c, gg: jax.vjp(lambda cc: detector_fused(cc, consts), c)[1](gg),
        cs,
        g,
    )
