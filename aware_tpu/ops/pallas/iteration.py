"""The iteration megakernel — the embed solver's whole differentiable
step as ONE Pallas program per direction.

Composes the synthesis half (ops/pallas/roundtrip.py: slab DFT matmuls,
shifted-row OLA, envelope, fused double peak-norm) with the merged
analysis+detector half (ops/pallas/analysis_detector.py: exact
flip-matmul reflect-pad framing, slab analysis DFT, |.|, the conv/norm
detector stack) so the per-iteration dataflow is

    forward:  coeffs (T, P) -> [ONE kernel] -> bit prediction (20,)
    backward: dL/dpred      -> [ONE kernel] -> dL/dcoeffs (T, P)

The only per-iteration HBM traffic left is the coefficient tensor, the
backward residuals (bf16), and the constants (amortized across the
vmap grid).  The intermediate waveform y2 is written once as a backward
residual but never re-read by a second forward kernel; its cotangent
``gy2`` never exists in HBM at all.  Round-3 stage isolation measured
the 4-kernel split at ~2.6 MB/iter/clip of removable boundary traffic
plus two grid dispatches — this module removes both.

Reference dataflow being implemented (behavior, not structure): one
optimizer step of the embed loop — scatter -> ISTFT -> peak-norm ->
STFT -> |.| -> detector -> loss gradient
(multibit_embedder.py:95-134).

Only serves the non-EOT objective (the robust/EOT cards need the
waveform y2 as a live output for the vocoder views and keep the
two-kernel composition).  In-kernel math is operation-for-operation
identical to that composition — the equivalence tests assert near-bit
equality against it (tests/test_iteration.py).
"""

from __future__ import annotations

import typing

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aware_tpu.ops.pallas.detector import (
    CH,
    DetConsts,
    _det_bwd_values,
    _det_fwd_values,
    _use_interpret,
)
from aware_tpu.ops.pallas.analysis_detector import _pad_rows

_EPS = 1e-8


class IterConsts(typing.NamedTuple):
    """Everything constant across iterations: synthesis bases + phase,
    reflect-pad flips, analysis basis, and the detector key material."""

    csin: jnp.ndarray    # (T, 2P) bf16 [cos | sin] in-band phase
    y_const: jnp.ndarray  # (T-1, hop) f32 envelope-divided out-of-band wave
    env: jnp.ndarray     # (T-1, hop) f32 OLA envelope
    ab: jnp.ndarray      # (2P, n_fft) bf16 synthesis basis (window folded)
    abt: jnp.ndarray     # (n_fft, 2P) bf16 its transpose (backward)
    pads: jnp.ndarray    # (4*hop, hop) bf16 reflect-pad flip matrices
    csw: jnp.ndarray     # (n_fft, 2P) bf16 windowed analysis basis
    cswt: jnp.ndarray    # (2P, n_fft) bf16 its transpose (backward)
    det: DetConsts


# ----------------------------------------------------------------- fwd ---

def _iter_fwd_kernel(ct_ref, csin_ref, ycon_ref, env_ref, ab_ref, pads_ref,
                     csw_ref, melb_ref, pmt_ref, w0t_ref, w1t_ref, w2t_ref,
                     w3t_ref, b_ref, eo_ref,
                     pred_ref, nph_ref, mel_ref, y0_ref, y1_ref, y2o_ref,
                     y3_ref, mu1_ref, r1_ref, rin0_ref, rin1_ref, rin2_ref,
                     rin3_ref, gmu_ref, gr_ref, s_ref, y2_ref, m1_ref,
                     reim, yd):
    t, p = ct_ref.shape
    lr, hop = env_ref.shape
    r = yd.shape[0] - t + 1
    pad_rows = r // 2
    p2 = nph_ref.shape[1]
    ph = p2 // 2

    # --- synthesis: slab DFT -> OLA -> envelope -> fused double norm ---
    c = ct_ref[:]
    reim[:, :p] = (c * csin_ref[:, :p]).astype(jnp.bfloat16)
    reim[:, p:] = (c * csin_ref[:, p:]).astype(jnp.bfloat16)
    rb = reim[:]
    yd[:] = jnp.zeros_like(yd)
    for k in range(r):
        yd[k : k + t, :] += jnp.dot(
            rb, ab_ref[:][:, k * hop : (k + 1) * hop],
            preferred_element_type=jnp.float32,
        )
    u = yd[pad_rows : pad_rows + lr, :] / env_ref[:] + ycon_ref[:]
    m1 = jnp.max(jnp.abs(u))
    cden = m1 * (1.0 + _EPS) + _EPS * _EPS
    y2 = u / cden
    y2_ref[:] = y2
    m1_ref[0, 0] = m1

    # --- exact reflect-pad framing, in place in the OLA scratch (same
    # row geometry: interior rows pad_rows..pad_rows+lr, flips outside) ---
    yd[pad_rows : pad_rows + lr, :] = y2
    y2b = y2.astype(jnp.bfloat16)
    top0, top1, bot0, bot1 = _pad_rows(y2b, pads_ref[:], lr, hop)
    yd[0:1, :] = top0
    yd[1:2, :] = top1
    yd[pad_rows + lr : pad_rows + lr + 1, :] = bot0
    yd[pad_rows + lr + 1 : pad_rows + lr + 2, :] = bot1

    # --- slab analysis DFT ---
    cs2 = jnp.zeros((t, p2), jnp.float32)
    for k in range(r):
        yk = yd[k : k + t, :].astype(jnp.bfloat16)
        cs2 = cs2 + jnp.dot(
            yk, csw_ref[:][k * hop : (k + 1) * hop, :],
            preferred_element_type=jnp.float32,
        )

    # --- detector forward (shared value-level body) ---
    (pred, nph_re, nph_im, mel, ys, mu1, r1, rins, gmu, gr, s) = (
        _det_fwd_values(
            cs2, melb_ref[:], pmt_ref[:], w0t_ref[:], w1t_ref[:],
            w2t_ref[:], w3t_ref[:], b_ref[:], eo_ref[:],
        )
    )
    nph_ref[:, :ph] = nph_re
    nph_ref[:, ph:] = nph_im
    mel_ref[:] = mel
    for ref, y in zip((y0_ref, y1_ref, y2o_ref, y3_ref), ys):
        ref[:] = y
    mu1_ref[:] = mu1
    r1_ref[:] = r1
    for ref, rr in zip((rin0_ref, rin1_ref, rin2_ref, rin3_ref), rins):
        ref[:] = rr
    gmu_ref[0, 0] = gmu
    gr_ref[0, 0] = gr
    s_ref[0, 0] = s
    pred_ref[:] = pred


def _iter_fwd_impl(ct, c: IterConsts):
    t, p = ct.shape
    lr, hop = c.env.shape
    r = c.ab.shape[1] // hop
    p2 = c.csw.shape[1]
    t2 = c.det.pmt.shape[0]
    vs = pl.BlockSpec(memory_space=pltpu.VMEM)
    ss = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shapes = [
        jax.ShapeDtypeStruct((1, 128), jnp.float32),        # pred
        jax.ShapeDtypeStruct((t, p2), jnp.bfloat16),        # nph
        jax.ShapeDtypeStruct((t, 128), jnp.bfloat16),       # mel
        jax.ShapeDtypeStruct((t2, CH[1]), jnp.bfloat16),    # y0
        jax.ShapeDtypeStruct((t2, CH[2]), jnp.bfloat16),    # y1
        jax.ShapeDtypeStruct((t2, CH[3]), jnp.bfloat16),    # y2
        jax.ShapeDtypeStruct((t2, CH[4]), jnp.bfloat16),    # y3
        jax.ShapeDtypeStruct((1, 128), jnp.float32),        # mu1
        jax.ShapeDtypeStruct((1, 128), jnp.float32),        # r1
        jax.ShapeDtypeStruct((1, CH[1]), jnp.float32),      # rin0
        jax.ShapeDtypeStruct((1, CH[2]), jnp.float32),      # rin1
        jax.ShapeDtypeStruct((1, CH[3]), jnp.float32),      # rin2
        jax.ShapeDtypeStruct((1, CH[4]), jnp.float32),      # rin3
        jax.ShapeDtypeStruct((1, 1), jnp.float32),          # gmu
        jax.ShapeDtypeStruct((1, 1), jnp.float32),          # gr
        jax.ShapeDtypeStruct((1, 1), jnp.float32),          # s
        jax.ShapeDtypeStruct((lr, hop), jnp.float32),       # y2
        jax.ShapeDtypeStruct((1, 1), jnp.float32),          # m1
    ]
    return pl.pallas_call(
        _iter_fwd_kernel,
        in_specs=[vs] * 15,
        out_specs=[vs] * 13 + [ss] * 3 + [vs, ss],
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((t, 2 * p), jnp.bfloat16),
            pltpu.VMEM((t + r - 1, hop), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=_use_interpret(),
    )(ct, c.csin, c.y_const, c.env, c.ab, c.pads, c.csw, c.det.melb,
      c.det.pmt, c.det.w0t, c.det.w1t, c.det.w2t, c.det.w3t,
      c.det.biases, c.det.eo)


# ----------------------------------------------------------------- bwd ---

def _iter_bwd_kernel(g_ref, pred_ref, nph_ref, mel_ref, y0_ref, y1_ref,
                     y2r_ref, y3_ref, mu1_ref, r1_ref, rin0_ref, rin1_ref,
                     rin2_ref, rin3_ref, gmu_ref, gr_ref, s_ref,
                     y2_ref, m1_ref,
                     pm_ref, w0_ref, w1_ref, w2_ref, w3_ref, eot_ref,
                     melbt_ref, cswt_ref, pads_ref, csin_ref, env_ref,
                     abt_ref,
                     dct_ref, work, dreim):
    t = nph_ref.shape[0]
    lr, hop = y2_ref.shape
    r = work.shape[0] - t + 1
    pad_rows = r // 2
    p = dct_ref.shape[1]

    # --- detector backward (shared value-level body) -> dcs in VMEM ---
    dcs = _det_bwd_values(
        g_ref[:], pred_ref[:], nph_ref[:], mel_ref[:],
        [y0_ref[:], y1_ref[:], y2r_ref[:], y3_ref[:]],
        mu1_ref[:], r1_ref[:],
        [rin0_ref[:], rin1_ref[:], rin2_ref[:], rin3_ref[:]],
        gmu_ref[0, 0], gr_ref[0, 0], s_ref[0, 0],
        pm_ref[:], w0_ref[:], w1_ref[:], w2_ref[:], w3_ref[:],
        eot_ref[:], melbt_ref[:],
    )

    # --- analysis backward: transposed slab matmuls into the work rows ---
    gb = dcs.astype(jnp.bfloat16)
    work[:] = jnp.zeros_like(work)
    for k in range(r):
        work[k : k + t, :] += jnp.dot(
            gb, cswt_ref[:][:, k * hop : (k + 1) * hop],
            preferred_element_type=jnp.float32,
        )

    # reflect-pad backward: pad-row cotangents into boundary signal rows
    pads = pads_ref[:]
    h = hop
    f1, e1 = pads[0:h], pads[h : 2 * h]
    f2, e2 = pads[2 * h : 3 * h], pads[3 * h : 4 * h]
    g0 = work[0:1, :].astype(jnp.bfloat16)
    g1 = work[1:2, :].astype(jnp.bfloat16)
    gb0 = work[pad_rows + lr : pad_rows + lr + 1, :].astype(jnp.bfloat16)
    gb1 = work[pad_rows + lr + 1 : pad_rows + lr + 2, :].astype(jnp.bfloat16)

    def dot(v, m):
        return jnp.dot(v, m, preferred_element_type=jnp.float32)

    work[pad_rows : pad_rows + 1, :] += dot(g1, f1)
    work[pad_rows + 1 : pad_rows + 2, :] += dot(g0, f1) + dot(g1, e1)
    work[pad_rows + 2 : pad_rows + 3, :] += dot(g0, e1)
    work[pad_rows + lr - 3 : pad_rows + lr - 2, :] += dot(gb1, e2)
    work[pad_rows + lr - 2 : pad_rows + lr - 1, :] += (
        dot(gb0, e2) + dot(gb1, f2)
    )
    work[pad_rows + lr - 1 : pad_rows + lr, :] += dot(gb0, f2)
    gy2 = work[pad_rows : pad_rows + lr, :]

    # --- synthesis backward: double-norm VJP, envelope, slab matmuls ---
    y2 = y2_ref[:]
    m1 = m1_ref[0, 0]
    cden = m1 * (1.0 + _EPS) + _EPS * _EPS
    q = jnp.sum(gy2 * y2)
    m2b = jnp.max(jnp.abs(y2))
    mask = (jnp.abs(y2) == m2b).astype(jnp.float32)
    ties = jnp.sum(mask)
    g_u = gy2 / cden - (q * (1.0 + _EPS) / cden) * jnp.sign(y2) * mask / ties
    g_crop = g_u / env_ref[:]

    work[:] = jnp.zeros_like(work)
    work[pad_rows : pad_rows + lr, :] = g_crop
    for k in range(r):
        gk = work[k : k + t, :].astype(jnp.bfloat16)
        d = jnp.dot(
            gk, abt_ref[:][k * hop : (k + 1) * hop, :],
            preferred_element_type=jnp.float32,
        )
        if k == 0:
            dreim[:] = d
        else:
            dreim[:] += d
    dct_ref[:] = (
        dreim[:, :p] * csin_ref[:, :p] + dreim[:, p:] * csin_ref[:, p:]
    )


def _iter_bwd_impl(g, res):
    (pred, nph, mel, y0, y1, y2r, y3, mu1, r1, rin0, rin1, rin2, rin3,
     gmu, gr, s, y2, m1, t, p, c) = res
    lr, hop = y2.shape
    r = c.ab.shape[1] // hop
    vs = pl.BlockSpec(memory_space=pltpu.VMEM)
    ss = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        _iter_bwd_kernel,
        in_specs=[vs] * 14 + [ss] * 3 + [vs, ss] + [vs] * 12,
        out_specs=vs,
        out_shape=jax.ShapeDtypeStruct((t, p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t + r - 1, hop), jnp.float32),
            pltpu.VMEM((t, 2 * p), jnp.float32),
        ],
        # at T=626 the whole-iteration backward sits ~1% above the default
        # 16M scoped-vmem limit; the chip has headroom, so raise the cap
        # instead of splitting the kernel back in two
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=_use_interpret(),
    )(g, pred, nph, mel, y0, y1, y2r, y3, mu1, r1, rin0, rin1, rin2, rin3,
      gmu, gr, s, y2, m1, c.det.pm, c.det.w0, c.det.w1, c.det.w2, c.det.w3,
      c.det.eot, c.det.melbt, c.cswt, c.pads, c.csin, c.env, c.abt)


# ------------------------------------------------------------- wrapper ---

def _it_fwd(ct, c):
    outs = _iter_fwd_impl(ct, c)
    t, p = ct.shape
    return outs[0][0, :20], (*outs, t, p, c)


def _it_bwd(res, g):
    (*_outs, t, p, c) = res
    gpad = jnp.zeros((1, 128), jnp.float32).at[0, :20].set(g)
    dct = _iter_bwd_impl(gpad, res)
    zero_c = jax.tree_util.tree_map(jnp.zeros_like, c)
    return dct, zero_c


def iteration_forward(ct, c: IterConsts) -> jnp.ndarray:
    """Whole-iteration forward for ONE clip: padded time-major in-band
    coefficients (T, P) -> (20,) tanh bit values, with a single-kernel
    custom VJP back to the coefficients.  Batch with ``vmap`` (batch ->
    kernel grid).  Requires T >= 8."""
    return _iteration_raw(ct, c)


@jax.custom_vjp
def _iteration_raw(ct, c: IterConsts):
    outs = _iter_fwd_impl(ct, c)
    return outs[0][0, :20]


_iteration_raw.defvjp(_it_fwd, _it_bwd)


# ------------------------------------------------- whole-step kernel ---

def _step_kernel(ct_ref, m_ref, v_ref, best_ref, wm_ref, lo_ref, hi_ref,
                 s1_ref, s2_ref, d2_ref, bl_ref,
                 csin_ref, ycon_ref, env_ref, ab_ref, pads_ref, csw_ref,
                 melb_ref, pmt_ref, w0t_ref, w1t_ref, w2t_ref, w3t_ref,
                 b_ref, eo_ref,
                 pm_ref, w0_ref, w1_ref, w2_ref, w3_ref, eot_ref,
                 melbt_ref, cswt_ref, abt_ref,
                 oct_ref, om_ref, ov_ref, obest_ref, loss_ref, obl_ref,
                 reim, yd, dreim,
                 *, b1, b2, eps, n_bits):
    t, p = ct_ref.shape
    lr_rows, hop = env_ref.shape
    r = yd.shape[0] - t + 1
    pad_rows = r // 2
    p2 = csw_ref.shape[1]
    ph = p2 // 2

    # ---------------- forward (residuals stay in VMEM as values) -------
    c = ct_ref[:]
    reim[:, :p] = (c * csin_ref[:, :p]).astype(jnp.bfloat16)
    reim[:, p:] = (c * csin_ref[:, p:]).astype(jnp.bfloat16)
    rb = reim[:]
    yd[:] = jnp.zeros_like(yd)
    for k in range(r):
        yd[k : k + t, :] += jnp.dot(
            rb, ab_ref[:][:, k * hop : (k + 1) * hop],
            preferred_element_type=jnp.float32,
        )
    u = yd[pad_rows : pad_rows + lr_rows, :] / env_ref[:] + ycon_ref[:]
    m1 = jnp.max(jnp.abs(u))
    cden = m1 * (1.0 + _EPS) + _EPS * _EPS
    y2 = u / cden

    yd[pad_rows : pad_rows + lr_rows, :] = y2
    y2b = y2.astype(jnp.bfloat16)
    top0, top1, bot0, bot1 = _pad_rows(y2b, pads_ref[:], lr_rows, hop)
    yd[0:1, :] = top0
    yd[1:2, :] = top1
    yd[pad_rows + lr_rows : pad_rows + lr_rows + 1, :] = bot0
    yd[pad_rows + lr_rows + 1 : pad_rows + lr_rows + 2, :] = bot1

    cs2 = jnp.zeros((t, p2), jnp.float32)
    for k in range(r):
        yk = yd[k : k + t, :].astype(jnp.bfloat16)
        cs2 = cs2 + jnp.dot(
            yk, csw_ref[:][k * hop : (k + 1) * hop, :],
            preferred_element_type=jnp.float32,
        )

    (pred, nph_re, nph_im, mel, ys, mu1, r1, rins, gmu, gr, s) = (
        _det_fwd_values(
            cs2, melb_ref[:], pmt_ref[:], w0t_ref[:], w1t_ref[:],
            w2t_ref[:], w3t_ref[:], b_ref[:], eo_ref[:],
        )
    )

    # ------------- loss + dL/dpred (push_extremes, masked lanes) -------
    mask = (
        jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) < n_bits
    ).astype(jnp.float32)
    wm = wm_ref[:]
    diff = (pred - wm) * mask
    loss = (
        jnp.sum(diff * diff) - 0.1 * jnp.sum(jnp.abs(pred) * mask)
    ) / n_bits
    loss_ref[0, 0] = loss
    dpred = (2.0 * diff - 0.1 * jnp.sign(pred) * mask) / n_bits

    # ---------------- backward (values straight from the forward) ------
    nph = jnp.concatenate([nph_re, nph_im], axis=1)
    dcs = _det_bwd_values(
        dpred, pred, nph, mel, ys, mu1, r1, rins, gmu, gr, s,
        pm_ref[:], w0_ref[:], w1_ref[:], w2_ref[:], w3_ref[:],
        eot_ref[:], melbt_ref[:],
    )

    gb = dcs.astype(jnp.bfloat16)
    yd[:] = jnp.zeros_like(yd)
    for k in range(r):
        yd[k : k + t, :] += jnp.dot(
            gb, cswt_ref[:][:, k * hop : (k + 1) * hop],
            preferred_element_type=jnp.float32,
        )
    pads = pads_ref[:]
    h = hop
    f1, e1 = pads[0:h], pads[h : 2 * h]
    f2, e2 = pads[2 * h : 3 * h], pads[3 * h : 4 * h]
    g0 = yd[0:1, :].astype(jnp.bfloat16)
    g1 = yd[1:2, :].astype(jnp.bfloat16)
    gb0 = yd[pad_rows + lr_rows : pad_rows + lr_rows + 1, :].astype(
        jnp.bfloat16
    )
    gb1 = yd[pad_rows + lr_rows + 1 : pad_rows + lr_rows + 2, :].astype(
        jnp.bfloat16
    )

    def dot(v_, m_):
        return jnp.dot(v_, m_, preferred_element_type=jnp.float32)

    yd[pad_rows : pad_rows + 1, :] += dot(g1, f1)
    yd[pad_rows + 1 : pad_rows + 2, :] += dot(g0, f1) + dot(g1, e1)
    yd[pad_rows + 2 : pad_rows + 3, :] += dot(g0, e1)
    yd[pad_rows + lr_rows - 3 : pad_rows + lr_rows - 2, :] += dot(gb1, e2)
    yd[pad_rows + lr_rows - 2 : pad_rows + lr_rows - 1, :] += (
        dot(gb0, e2) + dot(gb1, f2)
    )
    yd[pad_rows + lr_rows - 1 : pad_rows + lr_rows, :] += dot(gb0, f2)
    gy2 = yd[pad_rows : pad_rows + lr_rows, :]

    q = jnp.sum(gy2 * y2)
    m2b = jnp.max(jnp.abs(y2))
    tmask = (jnp.abs(y2) == m2b).astype(jnp.float32)
    ties = jnp.sum(tmask)
    g_u = gy2 / cden - (q * (1.0 + _EPS) / cden) * jnp.sign(y2) * tmask / ties
    g_crop = g_u / env_ref[:]

    yd[:] = jnp.zeros_like(yd)
    yd[pad_rows : pad_rows + lr_rows, :] = g_crop
    for k in range(r):
        gk = yd[k : k + t, :].astype(jnp.bfloat16)
        d = jnp.dot(
            gk, abt_ref[:][k * hop : (k + 1) * hop, :],
            preferred_element_type=jnp.float32,
        )
        if k == 0:
            dreim[:] = d
        else:
            dreim[:] += d
    g = dreim[:, :p] * csin_ref[:, :p] + dreim[:, p:] * csin_ref[:, p:]

    # --------- NAdam step (torch-trajectory-exact; scalar coefficients
    # s1 = lr(1-mu_t)/(1-mu_prod), s2 = lr*mu_next/(1-mu_prod_next) and
    # d2 = 1-b2^t come precomputed from XLA) + clamp + best tracking ----
    m_in = m_ref[:]
    v_in = v_ref[:]
    m_new = m_in + (1.0 - b1) * (g - m_in)
    v_new = b2 * v_in + (1.0 - b2) * (g * g)
    denom = jnp.sqrt(v_new / d2_ref[0, 0]) + eps
    pnew = c - (s1_ref[0, 0] * g) / denom
    pnew = pnew - (s2_ref[0, 0] * m_new) / denom
    pnew = jnp.clip(pnew, lo_ref[:], hi_ref[:])
    om_ref[:] = m_new
    ov_ref[:] = v_new
    oct_ref[:] = pnew

    best_loss = bl_ref[0, 0]
    better = loss < best_loss
    obl_ref[0, 0] = jnp.where(better, loss, best_loss)
    obest_ref[:] = jnp.where(better, pnew, best_ref[:])


def iteration_step(ct, m, v, best, wm_pad, lower, upper,
                   s1, s2, d2, best_loss, c: IterConsts,
                   *, b1: float, b2: float, eps: float, n_bits: int):
    """One whole solver step for ONE clip in a single kernel.

    forward -> push_extremes loss + gradient -> backward -> NAdam update
    (scalar schedule coefficients precomputed by the caller) -> box clamp
    -> best-snapshot tracking; nothing but the optimizer state touches
    HBM.  Returns (loss, new_ct, new_m, new_v, new_best, new_best_loss);
    scalars are (1, 1) arrays.  Batch with ``vmap``.
    """
    import functools

    t, p = ct.shape
    lr_rows, hop = c.env.shape
    r = c.ab.shape[1] // hop
    vs = pl.BlockSpec(memory_space=pltpu.VMEM)
    ss = pl.BlockSpec(memory_space=pltpu.SMEM)
    kernel = functools.partial(
        _step_kernel, b1=b1, b2=b2, eps=eps, n_bits=n_bits
    )
    outs = pl.pallas_call(
        kernel,
        in_specs=[vs] * 5 + [vs] * 2 + [ss] * 4 + [vs] * 23,
        out_specs=[vs] * 4 + [ss] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((t, p), jnp.float32),   # new ct
            jax.ShapeDtypeStruct((t, p), jnp.float32),   # new m
            jax.ShapeDtypeStruct((t, p), jnp.float32),   # new v
            jax.ShapeDtypeStruct((t, p), jnp.float32),   # new best
            jax.ShapeDtypeStruct((1, 1), jnp.float32),   # loss
            jax.ShapeDtypeStruct((1, 1), jnp.float32),   # new best_loss
        ],
        scratch_shapes=[
            pltpu.VMEM((t, 2 * p), jnp.bfloat16),
            pltpu.VMEM((t + r - 1, hop), jnp.float32),
            pltpu.VMEM((t, 2 * p), jnp.float32),
        ],
        input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_use_interpret(),
    )(ct, m, v, best, wm_pad, lower, upper, s1, s2, d2, best_loss,
      c.csin, c.y_const, c.env, c.ab, c.pads, c.csw,
      c.det.melb, c.det.pmt, c.det.w0t, c.det.w1t, c.det.w2t, c.det.w3t,
      c.det.biases, c.det.eo,
      c.det.pm, c.det.w0, c.det.w1, c.det.w2, c.det.w3, c.det.eot,
      c.det.melbt, c.cswt, c.abt)
    new_ct, new_m, new_v, new_best, loss, new_bl = outs
    return loss, new_ct, new_m, new_v, new_best, new_bl
