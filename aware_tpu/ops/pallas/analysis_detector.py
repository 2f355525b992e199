"""Merged analysis+detector Pallas kernels — the iteration's front half
in ONE program per direction.

Round 2 ran the embed iteration as four kernels (synthesis, analysis,
detector fwd, detector/analysis bwd pairs); between the analysis and
detector kernels the (T, 2P) in-band Re/Im tensor ``cs2`` (and its
cotangent ``dcs`` on the way back) round-tripped HBM every iteration —
~5 MB/iter/clip of pure interconnect traffic plus two extra grid
dispatches (docs/PERF_NOTES.md round-3 stage isolation).  This module
fuses re-framing + slab analysis DFT + |.| + the whole conv/norm
detector stack into a single forward kernel (and the mirrored single
backward kernel), so ``cs2``/``dcs`` never leave VMEM.

Reference dataflow being implemented (behavior, not structure):
STFT re-analysis feeding the frozen detector net —
multibit_embedder.py:103-107 -> multibit_detector_net.py:109-140.

Reflect padding without lane reversals: the round-2 kernels framed with
zero padding and the four affected boundary frames were corrected in
XLA (``edge_corrections``).  Here the TRUE reflect-pad rows are built
inside the kernel as tiny flip-matmuls — the reversal+shift is folded
into constant 0/1 matrices (``reflect_pad_matrices``): with h = hop,

    pad_top0    = y2[1]    @ F1 + y2[2]    @ E1
    pad_top1    = y2[0]    @ F1 + y2[1]    @ E1
    pad_bot0    = y2[lr-1] @ F2 + y2[lr-2] @ E2
    pad_bot1    = y2[lr-2] @ F2 + y2[lr-3] @ E2

where F1[j,i]=1 iff i+j=h, E1=[0,0], F2[j,i]=1 iff i+j=h-2,
E2=[h-1,h-1] (all four symmetric, so the backward reuses them).  The
framing is therefore exact — no XLA edge stage in either direction —
with the pad rows entering at the same bf16 operand precision as every
other frame row.

All matmuls are bf16 operands with f32 accumulation; equivalence to the
round-2 composition (analysis kernel + f32 XLA edge scatter + detector
kernel) is asserted at bf16-boundary tolerance, and to a bf16-identical
pure-jax replica near-exactly (tests/test_analysis_detector.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aware_tpu.ops.pallas.detector import (
    CH,
    DetConsts,
    _det_bwd_values,
    _det_fwd_values,
    _use_interpret,
)


@functools.lru_cache(maxsize=4)
def _pad_mats_np(hop: int) -> np.ndarray:
    """(4*hop, hop) stack [F1; E1; F2; E2] of the reflect-pad flip
    matrices (see module docstring)."""
    h = hop
    m = np.zeros((4 * h, h), np.float32)
    j = np.arange(1, h)
    m[j, h - j] = 1.0              # F1: i + j = h
    m[h, 0] = 1.0                  # E1: [0, 0]
    j2 = np.arange(0, h - 1)
    m[2 * h + j2, h - 2 - j2] = 1.0  # F2: i + j = h - 2
    m[4 * h - 1, h - 1] = 1.0      # E2: [h-1, h-1]
    return m


def reflect_pad_matrices(hop: int) -> jnp.ndarray:
    """bf16 (4*hop, hop) [F1; E1; F2; E2] for the merged kernels."""
    return jnp.asarray(_pad_mats_np(hop), jnp.bfloat16)


def _pad_rows(y2b, pads, lr, h):
    """The four reflect-pad rows from bf16 y2 rows (kernel + replica)."""
    f1, e1 = pads[0:h], pads[h : 2 * h]
    f2, e2 = pads[2 * h : 3 * h], pads[3 * h : 4 * h]

    def dot(v, m):
        return jnp.dot(v, m, preferred_element_type=jnp.float32)

    top0 = dot(y2b[1:2], f1) + dot(y2b[2:3], e1)
    top1 = dot(y2b[0:1], f1) + dot(y2b[1:2], e1)
    bot0 = dot(y2b[lr - 1 : lr], f2) + dot(y2b[lr - 2 : lr - 1], e2)
    bot1 = dot(y2b[lr - 2 : lr - 1], f2) + dot(y2b[lr - 3 : lr - 2], e2)
    return top0, top1, bot0, bot1


# ----------------------------------------------------------------- fwd ---

def _ad_fwd_kernel(y2_ref, pads_ref, csw_ref, melb_ref, pmt_ref, w0t_ref,
                   w1t_ref, w2t_ref, w3t_ref, b_ref, eo_ref,
                   pred_ref, nph_ref, mel_ref, y0_ref, y1_ref, y2o_ref,
                   y3_ref, mu1_ref, r1_ref, rin0_ref, rin1_ref, rin2_ref,
                   rin3_ref, gmu_ref, gr_ref, s_ref, yp):
    lr, hop = y2_ref.shape
    t = lr + 1
    r = yp.shape[0] - t + 1
    pad_rows = r // 2
    p2 = nph_ref.shape[1]
    p = p2 // 2

    # --- exact reflect-pad framing (flip-matmul pad rows) ---
    y2 = y2_ref[:]
    y2b = y2.astype(jnp.bfloat16)
    pads = pads_ref[:]
    top0, top1, bot0, bot1 = _pad_rows(y2b, pads, lr, hop)
    yp[0:1, :] = top0
    yp[1:2, :] = top1
    yp[pad_rows : pad_rows + lr, :] = y2
    yp[pad_rows + lr : pad_rows + lr + 1, :] = bot0
    yp[pad_rows + lr + 1 : pad_rows + lr + 2, :] = bot1

    cs2 = jnp.zeros((t, p2), jnp.float32)
    for k in range(r):
        yk = yp[k : k + t, :].astype(jnp.bfloat16)
        cs2 = cs2 + jnp.dot(
            yk, csw_ref[:][k * hop : (k + 1) * hop, :],
            preferred_element_type=jnp.float32,
        )

    # --- detector forward, VMEM-resident (shared value-level body) ---
    (pred, nph_re, nph_im, mel, ys, mu1, r1, rins, gmu, gr, s) = (
        _det_fwd_values(
            cs2, melb_ref[:], pmt_ref[:], w0t_ref[:], w1t_ref[:],
            w2t_ref[:], w3t_ref[:], b_ref[:], eo_ref[:],
        )
    )
    nph_ref[:, :p] = nph_re
    nph_ref[:, p:] = nph_im
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


def _ad_fwd_impl(y2, pads, csw, c: DetConsts):
    lr, hop = y2.shape
    t = lr + 1
    r = csw.shape[0] // hop
    p2 = csw.shape[1]
    t2 = c.pmt.shape[0]
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
    ]
    return pl.pallas_call(
        _ad_fwd_kernel,
        in_specs=[vs] * 11,
        out_specs=[vs] * 13 + [ss] * 3,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((t + r - 1, hop), jnp.float32)],
        interpret=_use_interpret(),
    )(y2, pads, csw, c.melb, c.pmt, c.w0t, c.w1t, c.w2t, c.w3t,
      c.biases, c.eo)


# ----------------------------------------------------------------- bwd ---

def _ad_bwd_kernel(g_ref, pred_ref, nph_ref, mel_ref, y0_ref, y1_ref,
                   y2r_ref, y3_ref, mu1_ref, r1_ref, rin0_ref, rin1_ref,
                   rin2_ref, rin3_ref, gmu_ref, gr_ref, s_ref,
                   pm_ref, w0_ref, w1_ref, w2_ref, w3_ref, eot_ref,
                   melbt_ref, cswt_ref, pads_ref,
                   gy2_ref, gyp):
    t = nph_ref.shape[0]
    lr, hop = gy2_ref.shape
    r = gyp.shape[0] - t + 1
    pad_rows = r // 2

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

    # --- analysis backward: transposed slab matmuls, un-framing ---
    gb = dcs.astype(jnp.bfloat16)
    gyp[:] = jnp.zeros_like(gyp)
    for k in range(r):
        gyp[k : k + t, :] += jnp.dot(
            gb, cswt_ref[:][:, k * hop : (k + 1) * hop],
            preferred_element_type=jnp.float32,
        )
    gy2_ref[:] = gyp[pad_rows : pad_rows + lr, :]

    # reflect-pad backward: the pad rows' cotangents route into the
    # boundary signal rows through the SAME (symmetric) flip matrices
    pads = pads_ref[:]
    h = hop
    f1, e1 = pads[0:h], pads[h : 2 * h]
    f2, e2 = pads[2 * h : 3 * h], pads[3 * h : 4 * h]
    g0 = gyp[0:1, :].astype(jnp.bfloat16)
    g1 = gyp[1:2, :].astype(jnp.bfloat16)
    gb0 = gyp[pad_rows + lr : pad_rows + lr + 1, :].astype(jnp.bfloat16)
    gb1 = gyp[pad_rows + lr + 1 : pad_rows + lr + 2, :].astype(jnp.bfloat16)

    def dot(v, m):
        return jnp.dot(v, m, preferred_element_type=jnp.float32)

    gy2_ref[0:1, :] += dot(g1, f1)
    gy2_ref[1:2, :] += dot(g0, f1) + dot(g1, e1)
    gy2_ref[2:3, :] += dot(g0, e1)
    gy2_ref[lr - 3 : lr - 2, :] += dot(gb1, e2)
    gy2_ref[lr - 2 : lr - 1, :] += dot(gb0, e2) + dot(gb1, f2)
    gy2_ref[lr - 1 : lr, :] += dot(gb0, f2)


def _ad_bwd_impl(g, res):
    (pred, nph, mel, y0, y1, y2r, y3, mu1, r1, rin0, rin1, rin2, rin3,
     gmu, gr, s, lr, hop, cswt, pads, c) = res
    t = nph.shape[0]
    r = cswt.shape[1] // hop
    vs = pl.BlockSpec(memory_space=pltpu.VMEM)
    ss = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        _ad_bwd_kernel,
        in_specs=[vs] * 14 + [ss] * 3 + [vs] * 9,
        out_specs=vs,
        out_shape=jax.ShapeDtypeStruct((lr, hop), jnp.float32),
        scratch_shapes=[pltpu.VMEM((t + r - 1, hop), jnp.float32)],
        interpret=_use_interpret(),
    )(g, pred, nph, mel, y0, y1, y2r, y3, mu1, r1, rin0, rin1, rin2, rin3,
      gmu, gr, s, c.pm, c.w0, c.w1, c.w2, c.w3, c.eot, c.melbt, cswt, pads)


# ------------------------------------------------------------- wrapper ---

def _ad_fwd2(y2, pads, csw, cswt, c):
    outs = _ad_fwd_impl(y2, pads, csw, c)
    lr, hop = y2.shape
    return outs[0][0, :20], (*outs, lr, hop, cswt, pads, c)


def _ad_bwd2(res, g):
    (*_outs, lr, hop, cswt, pads, c) = res
    gpad = jnp.zeros((1, 128), jnp.float32).at[0, :20].set(g)
    gy2 = _ad_bwd_impl(gpad, res)
    zero_c = jax.tree_util.tree_map(jnp.zeros_like, c)
    return (gy2, jnp.zeros_like(pads), jnp.zeros_like(cswt).T,
            jnp.zeros_like(cswt), zero_c)


def analysis_detector(y2, pads, csw, cswt, c: DetConsts) -> jnp.ndarray:
    """Fused analysis+detector for ONE clip.

    ``y2``: (T-1, hop) f32 normalized signal rows (the synthesis kernel's
    output); ``pads``: the (4*hop, hop) bf16 reflect-pad flip matrices
    (``reflect_pad_matrices(hop)``); ``csw``/``cswt``: bf16 windowed
    analysis basis and its transpose.  Returns the (20,) tanh bit
    values; batch with ``vmap`` (batch -> kernel grid).  Requires
    T >= 8 (distinct boundary rows).
    """
    return _analysis_detector_raw(y2, pads, csw, cswt, c)


@jax.custom_vjp
def _analysis_detector_raw(y2, pads, csw, cswt, c: DetConsts):
    outs = _ad_fwd_impl(y2, pads, csw, c)
    return outs[0][0, :20]


_analysis_detector_raw.defvjp(_ad_fwd2, _ad_bwd2)


# ----------------------------------------------------- pure-jax replica ---

def analysis_detector_reference(y2, csw_f32, c: DetConsts):
    """Op-for-op pure-jax replica (same bf16 casts) for interpret-mode
    equality and CPU tests: flip-matmul reflect-pad rows + framing +
    slab DFT + the detector replica math."""
    from aware_tpu.ops.pallas.detector import detector_fused_reference

    lr, hop = y2.shape
    t = lr + 1
    r = csw_f32.shape[0] // hop
    pad_rows = r // 2
    pads = reflect_pad_matrices(hop)
    y2b = y2.astype(jnp.bfloat16)
    top0, top1, bot0, bot1 = _pad_rows(y2b, pads, lr, hop)
    yp = jnp.zeros((t + r - 1, hop), jnp.float32)
    yp = yp.at[0].set(top0[0])
    yp = yp.at[1].set(top1[0])
    yp = yp.at[pad_rows : pad_rows + lr].set(y2)
    yp = yp.at[pad_rows + lr].set(bot0[0])
    yp = yp.at[pad_rows + lr + 1].set(bot1[0])
    p2 = csw_f32.shape[1]
    cs2 = jnp.zeros((t, p2), jnp.float32)
    for k in range(r):
        cs2 = cs2 + jnp.dot(
            yp[k : k + t].astype(jnp.bfloat16),
            csw_f32[k * hop : (k + 1) * hop].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    return detector_fused_reference(cs2, c)
