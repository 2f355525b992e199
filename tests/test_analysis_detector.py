"""Merged analysis+detector kernel (ops/pallas/analysis_detector.py) vs
the round-2 two-kernel composition and autodiff.

Runs in interpreter mode on CPU (kernels auto-select); the same code
compiles to Mosaic on TPU.  Comparison ladder:

1. the flip-matmul pad rows == exact bf16-rounded reflect-pad slices;
2. merged forward ~= band_analysis + edge_corrections + detector_fused
   (the composition computes the four boundary frames' pad content in
   f32 XLA; the merged kernel at bf16 — tolerance covers that);
3. merged forward ~= bf16-identical pure-jax replica (tight);
4. merged VJP ~= autodiff of the two-kernel composition (incl. the
   reflect-pad routing back into the boundary signal rows);
5. vmap batches to the kernel grid;
6. the 25-iteration solve through the merged path lands at the
   unmerged kernel path's loss with 0 BER (outcome level).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aware_tpu.config import AwareConfig, in_band_bins
from aware_tpu.models import init_params
from aware_tpu.ops.mel import mel_filter_bank
from aware_tpu.ops.pallas.analysis_detector import (
    _pad_rows,
    analysis_detector,
    analysis_detector_reference,
    reflect_pad_matrices,
)
from aware_tpu.ops.pallas.detector import (
    P_BAND,
    detector_fused,
    fused_detector_consts,
)
from aware_tpu.ops.pallas.roundtrip import (
    band_analysis,
    edge_corrections,
)
from aware_tpu.ops.stft import rfft_basis
from aware_tpu.ops.windows import get_window

CFG = AwareConfig()
NET = CFG.detection_net
N_FFT, HOP = CFG.frame_length, CFG.hop_length
LO, HI = in_band_bins(NET.sample_rate, N_FFT, CFG.embedding_bands)
NB = HI - LO
T = 126  # 2 s clip
LR = T - 1
R = N_FFT // HOP


@pytest.fixture(scope="module")
def params():
    return {k: jnp.asarray(v) for k, v in init_params(NET).items()}


@pytest.fixture(scope="module")
def consts(params):
    basis = mel_filter_bank(NET.sample_rate, N_FFT, NET.n_mels)
    return fused_detector_consts(params, basis, LO, HI, T)


@pytest.fixture(scope="module")
def bases():
    C, S = rfft_basis(N_FFT)
    w = np.asarray(get_window(CFG.window, CFG.win_length), np.float32)
    csw_np = np.zeros((N_FFT, 2 * P_BAND), np.float32)
    csw_np[:, :NB] = C[:, LO:HI] * w[:, None]
    csw_np[:, P_BAND : P_BAND + NB] = S[:, LO:HI] * w[:, None]
    csw = jnp.asarray(csw_np, jnp.bfloat16)
    cswt = jnp.asarray(csw_np.T.copy(), jnp.bfloat16)
    csw_k = [jnp.asarray(csw_np[k * HOP : (k + 1) * HOP]) for k in range(R)]
    return csw, cswt, csw_k, jnp.asarray(csw_np)


@pytest.fixture(scope="module")
def y2():
    # locally-seeded signal rows with realistic scale (post peak-norm)
    r = np.random.default_rng(45)
    x = np.tanh(r.standard_normal((LR, HOP))).astype(np.float32) * 0.8
    return jnp.asarray(x)


def _compose(y2v, csw, cswt, csw_k, consts):
    """Round-2 path: separate analysis kernel + f32 XLA edge scatter +
    standalone detector kernel."""
    yf = y2v.reshape(-1)
    cs2 = band_analysis(y2v, csw, cswt) + edge_corrections(
        yf, csw_k, N_FFT, HOP, T
    )
    return detector_fused(cs2, consts)


def _merged(y2v, csw, cswt, consts):
    pads = reflect_pad_matrices(HOP)
    return analysis_detector(y2v, pads, csw, cswt, consts)


def test_pad_rows_are_exact_bf16_reflections(y2):
    """Each flip-matmul output element is a single bf16 product, so the
    pad rows equal the bf16-rounded reversed signal slices exactly."""
    pads = reflect_pad_matrices(HOP)
    y2b = y2.astype(jnp.bfloat16)
    top0, top1, bot0, bot1 = (
        np.asarray(v)[0] for v in _pad_rows(y2b, pads, LR, HOP)
    )
    yfb = np.asarray(y2b, np.float32).reshape(-1)
    half = N_FFT // 2
    lp = yfb[1 : half + 1][::-1]
    rp = yfb[-half - 1 : -1][::-1]
    np.testing.assert_array_equal(top0, lp[:HOP])
    np.testing.assert_array_equal(top1, lp[HOP:])
    np.testing.assert_array_equal(bot0, rp[:HOP])
    np.testing.assert_array_equal(bot1, rp[HOP:])


def test_forward_matches_composition(y2, bases, consts):
    csw, cswt, csw_k, _ = bases
    want = np.asarray(_compose(y2, csw, cswt, csw_k, consts))
    got = np.asarray(_merged(y2, csw, cswt, consts))
    np.testing.assert_allclose(got, want, atol=3e-3)


def test_forward_matches_replica(y2, bases, consts):
    csw, cswt, _, csw_f32 = bases
    got = np.asarray(_merged(y2, csw, cswt, consts))
    want = np.asarray(analysis_detector_reference(y2, csw_f32, consts))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_vjp_matches_replica_autodiff(y2, bases, consts):
    """The closed-form in-kernel backward (incl. the reflect-pad routing)
    agrees with autodiff of the bf16-identical replica — the
    apples-to-apples oracle.  Measured: 0.6% max element, cos 0.99998."""
    csw, cswt, _, csw_f32 = bases
    g = jnp.asarray(
        np.random.default_rng(46).standard_normal(20).astype(np.float32)
    )
    _, vm = jax.vjp(lambda v: _merged(v, csw, cswt, consts), y2)
    _, vr = jax.vjp(
        lambda v: analysis_detector_reference(v, csw_f32, consts), y2
    )
    dm, dr = vm(g)[0], vr(g)[0]
    scale = float(jnp.max(jnp.abs(dr)))
    assert float(jnp.max(jnp.abs(dm - dr))) / scale < 0.02
    cos = float(
        jnp.sum(dm * dr)
        / (jnp.linalg.norm(dm.ravel()) * jnp.linalg.norm(dr.ravel()))
    )
    assert cos > 0.999, cos


def test_vjp_direction_vs_composition(y2, bases, consts):
    """Against the round-2 composition (f32 XLA edge handling) the merged
    cotangent agrees in direction; elementwise deviation is bounded by
    the bf16 forward-residual noise amplified through the norm
    backwards (measured ~7% of the max element on the round-3 math,
    ~17% after the round-4 f32 strided pool — the old bf16 pool
    quantized both paths' residual noise identically, masking part of
    it), not a routing error — the replica-autodiff test above pins the
    routing at 2%."""
    csw, cswt, csw_k, _ = bases
    g = jnp.asarray(
        np.random.default_rng(46).standard_normal(20).astype(np.float32)
    )
    _, vm = jax.vjp(lambda v: _merged(v, csw, cswt, consts), y2)
    _, vc = jax.vjp(lambda v: _compose(v, csw, cswt, csw_k, consts), y2)
    dm, dc = vm(g)[0], vc(g)[0]
    cos = float(
        jnp.sum(dm * dc)
        / (jnp.linalg.norm(dm.ravel()) * jnp.linalg.norm(dc.ravel()))
    )
    assert cos > 0.995, cos
    assert float(jnp.max(jnp.abs(dm - dc))) / float(
        jnp.max(jnp.abs(dc))
    ) < 0.20


def test_vmap_batches_to_grid(y2, bases, consts):
    csw, cswt, _, _ = bases
    batch = jnp.stack([y2, y2 * 0.6 + 0.01])
    got = jax.vmap(lambda v: _merged(v, csw, cswt, consts))(batch)
    assert got.shape == (2, 20)
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(got[i]),
            np.asarray(_merged(batch[i], csw, cswt, consts)),
            atol=1e-6,
        )


def test_solver_outcome_with_merged_kernel(params, speechlike):
    """25-iteration embed through the merged path reads back 0 BER and
    lands at the unmerged (XLA-detector) kernel path's loss."""
    from aware_tpu.embed.solver import embed_core
    from aware_tpu.models import detect_values

    bits = np.random.default_rng(12).integers(0, 2, 20)
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
