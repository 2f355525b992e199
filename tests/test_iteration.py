"""Iteration megakernel (ops/pallas/iteration.py) vs the two-kernel
composition it fuses.

The megakernel's in-kernel math is operation-for-operation identical to
synth_norm -> analysis_detector, so forward AND backward must agree to
float noise (the only difference is that y2/gy2 stay in VMEM).  Runs in
interpreter mode on CPU; compiles to Mosaic on TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aware_tpu.config import AwareConfig, in_band_bins
from aware_tpu.models import init_params
from aware_tpu.ops.mel import mel_filter_bank
from aware_tpu.ops.pallas.analysis_detector import (
    analysis_detector,
    reflect_pad_matrices,
)
from aware_tpu.ops.pallas.detector import P_BAND, fused_detector_consts
from aware_tpu.ops.pallas.iteration import IterConsts, iteration_forward
from aware_tpu.ops.pallas.roundtrip import synth_norm
from aware_tpu.ops.stft import (
    _ola_envelope,
    irfft_basis,
    istft_synthesis,
    magphase,
    peak_normalize,
    rfft_basis,
    stft,
)
from aware_tpu.ops.windows import get_window

CFG = AwareConfig()
NET = CFG.detection_net
N_FFT, HOP = CFG.frame_length, CFG.hop_length
LO, HI = in_band_bins(NET.sample_rate, N_FFT, CFG.embedding_bands)
NB = HI - LO
R = N_FFT // HOP


@pytest.fixture(scope="module")
def params():
    return {k: jnp.asarray(v) for k, v in init_params(NET).items()}


def make_problem(params, clip):
    """Solver-identical megakernel constants + initial coefficients for a
    clip (mirrors the build_problem kernel-path setup).  Plain function so
    the real-chip tier (tests_tpu) can reuse it."""
    window = get_window(CFG.window, CFG.win_length)
    x = peak_normalize(jnp.asarray(clip))
    mag, phase = magphase(stft(x, N_FFT, HOP, window))
    t_frames = mag.shape[-1]
    cos_in = jnp.cos(phase)[LO:HI]
    sin_in = jnp.sin(phase)[LO:HI]

    A, Bm = irfft_basis(N_FFT)
    C, S = rfft_basis(N_FFT)
    wvec = np.asarray(window, np.float32)
    Aw = jnp.asarray(A * wvec[None, :])
    Bw = jnp.asarray(Bm * wvec[None, :])
    re_full = mag * jnp.cos(phase)
    im_full = mag * jnp.sin(phase)
    frames_const = (
        jnp.matmul(re_full[:LO].T, Aw[:LO])
        + jnp.matmul(re_full[HI:].T, Aw[HI:])
        + jnp.matmul(im_full[:LO].T, Bw[:LO])
        + jnp.matmul(im_full[HI:].T, Bw[HI:])
    )
    env = jnp.asarray(
        _ola_envelope(tuple(wvec.tolist()), N_FFT, HOP, t_frames),
        jnp.float32,
    ).reshape(t_frames - 1, HOP)
    y_const2d = istft_synthesis(frames_const, N_FFT, HOP, window).reshape(
        t_frames - 1, HOP
    )

    P = P_BAND
    ab_np = np.zeros((2 * P, N_FFT), np.float32)
    ab_np[:NB] = (A * wvec[None, :])[LO:HI]
    ab_np[P : P + NB] = (Bm * wvec[None, :])[LO:HI]
    csw_np = np.zeros((N_FFT, 2 * P), np.float32)
    csw_np[:, :NB] = C[:, LO:HI] * wvec[:, None]
    csw_np[:, P : P + NB] = S[:, LO:HI] * wvec[:, None]

    csin = jnp.zeros((t_frames, 2 * P), jnp.float32)
    csin = csin.at[:, :NB].set(cos_in.T)
    csin = csin.at[:, P : P + NB].set(sin_in.T)
    csin = csin.astype(jnp.bfloat16)
    ab = jnp.asarray(ab_np, jnp.bfloat16)
    abt = jnp.asarray(ab_np.T.copy(), jnp.bfloat16)
    csw = jnp.asarray(csw_np, jnp.bfloat16)
    cswt = jnp.asarray(csw_np.T.copy(), jnp.bfloat16)
    pads = reflect_pad_matrices(HOP)
    det = fused_detector_consts(
        params,
        mel_filter_bank(NET.sample_rate, N_FFT, NET.n_mels),
        LO, HI, t_frames,
    )
    consts = IterConsts(
        csin=csin, y_const=y_const2d, env=env, ab=ab, abt=abt,
        pads=pads, csw=csw, cswt=cswt, det=det,
    )
    ct = jnp.zeros((t_frames, P), jnp.float32).at[:, :NB].set(mag[LO:HI].T)
    return consts, ct


@pytest.fixture(scope="module")
def problem(params, speechlike):
    return make_problem(params, speechlike)


def _compose(ct, c: IterConsts):
    y2 = synth_norm(ct, c.csin, c.y_const, c.env, c.ab, c.abt)
    return analysis_detector(y2, c.pads, c.csw, c.cswt, c.det)


def test_forward_matches_composition(problem):
    c, ct = problem
    got = np.asarray(iteration_forward(ct, c))
    want = np.asarray(_compose(ct, c))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_vjp_matches_composition(problem):
    c, ct = problem
    g = jnp.asarray(
        np.random.default_rng(47).standard_normal(20).astype(np.float32)
    )
    _, vm = jax.vjp(lambda v: iteration_forward(v, c), ct)
    _, vc = jax.vjp(lambda v: _compose(v, c), ct)
    dm, dc = np.asarray(vm(g)[0]), np.asarray(vc(g)[0])
    scale = np.max(np.abs(dc)) + 1e-12
    np.testing.assert_allclose(dm, dc, atol=1e-6 * scale + 1e-9)


def test_vmap_batches_to_grid(problem):
    c, ct = problem
    batch = jnp.stack([ct, ct * 0.9])
    got = jax.vmap(lambda v: iteration_forward(v, c))(batch)
    assert got.shape == (2, 20)
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(got[i]),
            np.asarray(iteration_forward(batch[i], c)),
            atol=1e-6,
        )


def test_step_kernel_matches_manual_step(problem):
    """The whole-step kernel (fwd + push_extremes grad + bwd + NAdam +
    clamp + best) == the same step assembled from iteration_forward's
    custom VJP plus the XLA NAdam update."""
    from aware_tpu.embed.losses import push_extremes
    from aware_tpu.embed.optim import get_optimizer
    from aware_tpu.ops.pallas.iteration import iteration_step

    c, ct = problem
    n_bits = 20
    rngl = np.random.default_rng(49)
    bits = rngl.integers(0, 2, n_bits)
    wm = jnp.asarray((2 * bits - 1).astype(np.float32))
    wm_pad = jnp.zeros((1, 128), jnp.float32).at[0, :n_bits].set(wm)
    delta = ct * (10.0 ** (-6.0 / 20.0))
    lower = jnp.maximum(ct - delta, 0.0)
    upper = ct + delta

    # manual: value_and_grad through the megakernel VJP + XLA NAdam
    opt = get_optimizer("nadam")
    state = opt.init(ct)
    loss_m, g = jax.value_and_grad(
        lambda v: push_extremes(iteration_forward(v, c), wm)
    )(ct)
    lr = 0.1
    new_m, st2 = opt.update(g, state, ct, lr)
    new_m = jnp.clip(new_m, lower, upper)

    # kernel: scalar schedule coefficients for step t=1 (torch NAdam)
    b1, b2, psi, eps = 0.9, 0.999, 4e-3, 1e-8
    t = 1.0
    mu_t = b1 * (1.0 - 0.5 * 0.96 ** (t * psi))
    mu_next = b1 * (1.0 - 0.5 * 0.96 ** ((t + 1.0) * psi))
    mu_prod = 1.0 * mu_t
    s1 = jnp.full((1, 1), lr * (1.0 - mu_t) / (1.0 - mu_prod), jnp.float32)
    s2 = jnp.full(
        (1, 1), lr * mu_next / (1.0 - mu_prod * mu_next), jnp.float32
    )
    d2 = jnp.full((1, 1), 1.0 - b2**t, jnp.float32)
    loss_k, ct_k, m_k, v_k, best_k, bl_k = iteration_step(
        ct, state["m"], state["v"], ct, wm_pad, lower, upper,
        s1, s2, d2, jnp.full((1, 1), jnp.inf, jnp.float32), c,
        b1=b1, b2=b2, eps=eps, n_bits=n_bits,
    )

    np.testing.assert_allclose(
        float(loss_k[0, 0]), float(loss_m), rtol=1e-5, atol=1e-6
    )
    scale = float(jnp.max(jnp.abs(new_m))) + 1e-12
    np.testing.assert_allclose(
        np.asarray(ct_k), np.asarray(new_m), atol=2e-5 * scale
    )
    np.testing.assert_allclose(
        np.asarray(m_k), np.asarray(st2["m"]),
        atol=2e-5 * (float(jnp.max(jnp.abs(st2["m"]))) + 1e-12),
    )
    np.testing.assert_allclose(
        np.asarray(v_k), np.asarray(st2["v"]),
        atol=2e-5 * (float(jnp.max(jnp.abs(st2["v"]))) + 1e-12),
    )
    # loss < inf -> best snapshot = the new post-clamp coefficients
    np.testing.assert_array_equal(np.asarray(best_k), np.asarray(ct_k))
    assert float(bl_k[0, 0]) == float(loss_k[0, 0])


def test_solver_scan_body_is_one_kernel(params, speechlike):
    """Default card: the whole embed_core scan body jaxpr carries exactly
    one pallas_call (the step kernel)."""
    from aware_tpu.embed.solver import build_problem

    wm = jnp.ones((20,), jnp.float32)
    clip = jnp.asarray(speechlike)
    on = AwareConfig().replace(use_pallas_roundtrip=True)
    pb = build_problem(params, clip, wm, on)
    step_fused = pb.carry[3]
    assert step_fused is not None
    ct = pb.carry[1](pb.coeffs0)
    z = jnp.zeros_like(ct)
    s = jnp.ones((1, 1), jnp.float32)
    jx = str(
        jax.make_jaxpr(
            lambda a, b, c_, d: step_fused(a, b, c_, d, s, s, s, s)
        )(ct, z, z, ct)
    ).lower()
    assert jx.count("pallas_call") == 1

    # non-default loss opts out of the fused step but keeps the megakernel
    pb2 = build_problem(params, clip, wm, on.replace(loss="mse"))
    assert pb2.carry[3] is None


def test_solver_uses_megakernel_without_eot(params, speechlike):
    """Default card objective = ONE pallas_call (the iteration kernel);
    EOT cards keep the two-kernel composition (live waveform needed)."""
    from aware_tpu.embed.solver import build_problem

    wm = jnp.ones((20,), jnp.float32)
    clip = jnp.asarray(speechlike)
    on = AwareConfig().replace(use_pallas_roundtrip=True)
    pb = build_problem(params, clip, wm, on)
    obj_c = pb.carry[0]
    jx = str(jax.make_jaxpr(obj_c)(pb.carry[1](pb.coeffs0))).lower()
    assert "_iteration_raw" in jx
    assert jx.count("pallas_call") == 1

    eot = on.replace(eot_stretch_rates=(0.9,), eot_mode="all")
    pb2 = build_problem(params, clip, wm, eot)
    jx2 = str(jax.make_jaxpr(pb2.carry[0])(pb2.carry[1](pb2.coeffs0))).lower()
    assert "_iteration_raw" not in jx2
    assert "_analysis_detector_raw" in jx2

    # the explicit opt-out keeps the two-kernel composition too
    off = on.replace(use_pallas_iteration=False)
    pb3 = build_problem(params, clip, wm, off)
    assert pb3.carry[3] is None
    jx3 = str(jax.make_jaxpr(pb3.carry[0])(pb3.carry[1](pb3.coeffs0))).lower()
    assert "_iteration_raw" not in jx3
    assert "_analysis_detector_raw" in jx3


def test_solver_outcome_with_megakernel(params, speechlike):
    """25-iteration embed through the megakernel reads back 0 BER and
    lands at the unmerged (XLA-detector) kernel path's loss."""
    from aware_tpu.embed.solver import embed_core
    from aware_tpu.models import detect_values

    bits = np.random.default_rng(13).integers(0, 2, 20)
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
