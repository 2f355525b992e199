"""Fused Pallas detector kernels (ops/pallas/detector.py) vs the XLA
detector and autodiff.

Runs in interpreter mode on CPU (the kernels auto-select); the same code
compiles to Mosaic on TPU.  Comparison ladder:

1. kernel forward == pure-jax bf16-identical replica (near-exact);
2. kernel forward ~= f32 XLA ``detector_apply_banded`` (bf16 tolerance);
3. kernel VJP ~= autodiff of the replica (bf16-cotangent tolerance);
4. the 25-iteration solve through roundtrip+detector kernels lands at the
   XLA-detector kernel path's loss with 0 BER (outcome level — the
   chaotic loop amplifies trajectory fp differences, see CLAUDE.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aware_tpu.config import AwareConfig, in_band_bins
from aware_tpu.models import init_params
from aware_tpu.ops.mel import mel_filter_bank
from aware_tpu.ops.pallas.detector import (
    P_BAND,
    DetConsts,
    detector_fused,
    detector_fused_reference,
    fused_detector_consts,
    fused_detector_supported,
)

CFG = AwareConfig()
NET = CFG.detection_net
LO, HI = in_band_bins(NET.sample_rate, NET.n_fft, CFG.embedding_bands)
NB = HI - LO
T = 126  # 2 s clip


@pytest.fixture(scope="module")
def params():
    return {k: jnp.asarray(v) for k, v in init_params(NET).items()}


@pytest.fixture(scope="module")
def consts(params):
    basis = mel_filter_bank(NET.sample_rate, NET.n_fft, NET.n_mels)
    return fused_detector_consts(params, basis, LO, HI, T)


@pytest.fixture(scope="module")
def cs():
    """In-band Re/Im with realistic magnitude scale, zero in the padding
    columns and a few exactly-zero bins (the sgn(0)=0 surface).

    Locally-seeded (not the session rng fixture): the tolerance
    assertions here sit near the bf16 noise floor, so the data must not
    depend on which tests consumed the shared stream first."""
    r = np.random.default_rng(42)
    x = np.zeros((T, 2 * P_BAND), np.float32)
    x[:, :NB] = r.standard_normal((T, NB)) * 0.1
    x[:, P_BAND : P_BAND + NB] = r.standard_normal((T, NB)) * 0.1
    x[3:6, 7] = 0.0
    x[3:6, P_BAND + 7] = 0.0
    return jnp.asarray(x)


def test_forward_matches_replica(cs, consts):
    # not bit-exact: pallas emulates the MXU contraction in a different
    # accumulation order than a plain XLA dot, and the norm chains amplify
    # ulp-level differences; 1e-4 on the tanh readout bounds it
    got = np.asarray(detector_fused(cs, consts))
    want = np.asarray(detector_fused_reference(cs, consts))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_forward_matches_xla_detector(cs, consts, params):
    """Against the f32 banded XLA forward — bf16 single-pass matmuls bound
    the deviation of the tanh readout."""
    from aware_tpu.models.detector import detector_apply_banded
    from aware_tpu.ops.stft import safe_magnitude

    m2_in = safe_magnitude(
        cs[:, :NB], cs[:, P_BAND : P_BAND + NB]
    ).T  # (nb, T)
    want = np.asarray(
        detector_apply_banded(params, m2_in, LO, HI, NET, "highest")
    )
    got = np.asarray(detector_fused(cs, consts))
    np.testing.assert_allclose(got, want, atol=3e-2)
    assert np.array_equal(np.sign(got), np.sign(want))


def test_vjp_matches_replica_autodiff(cs, consts):
    g = jnp.asarray(
        np.random.default_rng(43).standard_normal(20).astype(np.float32)
    )
    _, vk = jax.vjp(lambda c: detector_fused(c, consts), cs)
    _, vr = jax.vjp(lambda c: detector_fused_reference(c, consts), cs)
    dk, dr = vk(g)[0], vr(g)[0]
    scale = float(jnp.max(jnp.abs(dr)))
    assert float(jnp.max(jnp.abs(dk - dr))) / scale < 0.02
    # exactly-zero bins keep exactly-zero gradients (sgn(0)=0 convention)
    assert float(jnp.max(jnp.abs(dk[3:6, 7]))) == 0.0


def test_vjp_matches_xla_detector_autodiff(cs, consts, params):
    """End-to-end gradient direction agrees with the f32 XLA detector's
    autodiff (tolerance: bf16 matmuls in fwd+bwd)."""
    from aware_tpu.models.detector import detector_apply_banded
    from aware_tpu.ops.stft import safe_magnitude

    g = jnp.asarray(
        np.random.default_rng(44).standard_normal(20).astype(np.float32)
    )

    def xla_det(c):
        m2 = safe_magnitude(c[:, :NB], c[:, P_BAND : P_BAND + NB]).T
        return detector_apply_banded(params, m2, LO, HI, NET, "highest")

    def cos(a, b):
        return float(
            jnp.sum(a * b)
            / (jnp.linalg.norm(a.ravel()) * jnp.linalg.norm(b.ravel()))
        )

    _, vk = jax.vjp(lambda c: detector_fused(c, consts), cs)
    _, vrep = jax.vjp(
        lambda c: detector_fused_reference(c, consts), cs
    )
    _, vr = jax.vjp(xla_det, cs)
    dk, drep, dr = vk(g)[0], vrep(g)[0], vr(g)[0]
    # measured: EXACT autodiff of the bf16 replica already sits at ~0.988
    # vs f32 (single-pass bf16 forward statistics feed the norm
    # backwards), so the kernel cannot beat that — assert it adds nothing
    # beyond the bf16 floor, and that the floor itself holds
    assert cos(dk, drep) > 0.995, cos(dk, drep)
    assert cos(dk, dr) >= cos(drep, dr) - 0.005
    assert cos(dk, dr) > 0.98, cos(dk, dr)


def test_vmap_batches_to_grid(cs, consts):
    batch = jnp.stack([cs, cs * 0.7 + 0.01])
    got = jax.vmap(lambda c: detector_fused(c, consts))(batch)
    assert got.shape == (2, 20)
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(got[i]),
            np.asarray(detector_fused(batch[i], consts)),
            atol=1e-6,
        )


def test_supported_gating():
    assert fused_detector_supported(NET, NB, T)
    assert not fused_detector_supported(NET, NB, 2000)  # VMEM bound
    import dataclasses

    gelu = dataclasses.replace(NET, activation="gelu")
    assert not fused_detector_supported(gelu, NB, T)
    wide = dataclasses.replace(
        NET, n_filters=(500, 1024, 1024)
    )
    assert not fused_detector_supported(wide, NB, T)


def test_solver_objective_uses_fused_detector(params, speechlike):
    """With both flags on, the default (non-EOT) objective jaxpr carries
    the iteration megakernel; switching use_pallas_detector off keeps
    the XLA banded forward next to the separate analysis kernel."""
    from aware_tpu.embed.solver import build_problem

    wm = jnp.ones((20,), jnp.float32)
    clip = jnp.asarray(speechlike)
    on = AwareConfig().replace(use_pallas_roundtrip=True)
    pb = build_problem(params, clip, wm, on)
    jx = str(jax.make_jaxpr(pb.objective)(pb.coeffs0)).lower()
    assert jx.count("pallas_call") == 1  # the iteration megakernel
    assert "_iteration_raw" in jx

    off = on.replace(use_pallas_detector=False)
    pb2 = build_problem(params, clip, wm, off)
    jx2 = str(jax.make_jaxpr(pb2.objective)(pb2.coeffs0)).lower()
    assert jx2.count("pallas_call") == 2  # synth + band_analysis
    assert "_iteration_raw" not in jx2


def test_solver_outcome_with_fused_detector(params, speechlike):
    """25-iteration embed through roundtrip+detector kernels reads back
    0 BER and lands at the XLA-detector kernel path's loss."""
    from aware_tpu.embed.solver import embed_core
    from aware_tpu.models import detect_values

    bits = np.random.default_rng(11).integers(0, 2, 20)
    wm = jnp.asarray((2 * bits - 1).astype(np.float32))
    clip = jnp.asarray(speechlike)
    cfg_on = AwareConfig().replace(
        use_pallas_roundtrip=True, num_iterations=25
    )
    cfg_off = cfg_on.replace(use_pallas_detector=False)
    r_on = embed_core(params, clip, wm, cfg_on)
    r_off = embed_core(params, clip, wm, cfg_off)
    v = np.asarray(detect_values(params, r_on.audio))
    assert np.mean((v > 0).astype(int) != bits) == 0.0
    assert abs(float(r_on.best_loss) - float(r_off.best_loss)) < 0.02
