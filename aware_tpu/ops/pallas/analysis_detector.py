"""Merged analysis+detector Pallas kernels — the iteration's front half
in ONE program per direction.

Round 2 ran the embed iteration as four kernels (synthesis, analysis,
detector fwd, detector/analysis bwd pairs); between the analysis and
detector kernels the (T, 2P) in-band Re/Im tensor ``cs2`` (and its
cotangent ``dcs`` on the way back) round-tripped HBM every iteration —
~5 MB/iter/clip of pure interconnect traffic plus two extra grid
dispatches (docs/PERF_NOTES.md round-3 stage isolation).  This module
fuses re-framing + slab analysis DFT + reflect-pad edge rows + |.| +
the whole conv/norm detector stack into a single forward kernel (and
the mirrored single backward kernel), so ``cs2``/``dcs`` never leave
VMEM.

Reference dataflow being implemented (behavior, not structure):
STFT re-analysis feeding the frozen detector net —
multibit_embedder.py:103-107 -> multibit_detector_net.py:109-140.

The reflect-pad boundary handling keeps the round-2 design split: the
kernel frames with zero padding, and the four affected boundary frames'
corrections enter as a tiny (8, 2P) row tensor computed in XLA from the
signal (``edge_correction_rows`` in roundtrip.py — lane reversals stay
out of Mosaic).  The backward emits the matching (8, 2P) ``dcorr`` rows
and XLA's autodiff of the row builder routes them back into the signal
cotangent.

All matmuls are bf16 operands with f32 accumulation — bit-identical
operand roundings to the round-2 two-kernel chain, so the merged op is
near-exact against composing ``band_analysis`` + ``detector_fused``
(tests/test_analysis_detector.py).
"""

from __future__ import annotations

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


# ----------------------------------------------------------------- fwd ---

def _ad_fwd_kernel(y2_ref, corr_ref, csw_ref, melb_ref, pmt_ref, w0t_ref,
                   w1t_ref, w2t_ref, w3t_ref, b_ref, eo_ref,
                   pred_ref, nph_ref, mel_ref, y0_ref, y1_ref, y2o_ref,
                   y3_ref, mu1_ref, r1_ref, rin0_ref, rin1_ref, rin2_ref,
                   rin3_ref, gmu_ref, gr_ref, s_ref, yp):
    lr, hop = y2_ref.shape
    t = lr + 1
    r = yp.shape[0] - t + 1
    pad_rows = r // 2
    p2 = corr_ref.shape[1]
    p = p2 // 2

    # --- slab analysis (zero-pad framing; boundary rows seeded from the
    # XLA-side reflect-pad corrections so cs2 is complete in-kernel) ---
    yp[:] = jnp.zeros_like(yp)
    yp[pad_rows : pad_rows + lr, :] = y2_ref[:]

    corr = corr_ref[:]
    cs2 = jnp.concatenate(
        [corr[0:2], jnp.zeros((t - 4, p2), jnp.float32), corr[2:4]], axis=0
    )
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


def _ad_fwd_impl(y2, corr, csw, c: DetConsts):
    lr, hop = y2.shape
    t = lr + 1
    r = csw.shape[0] // hop
    p2 = corr.shape[1]
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
    )(y2, corr, csw, c.melb, c.pmt, c.w0t, c.w1t, c.w2t, c.w3t,
      c.biases, c.eo)


# ----------------------------------------------------------------- bwd ---

def _ad_bwd_kernel(g_ref, pred_ref, nph_ref, mel_ref, y0_ref, y1_ref,
                   y2r_ref, y3_ref, mu1_ref, r1_ref, rin0_ref, rin1_ref,
                   rin2_ref, rin3_ref, gmu_ref, gr_ref, s_ref,
                   pm_ref, w0_ref, w1_ref, w2_ref, w3_ref, eot_ref,
                   melbt_ref, cswt_ref,
                   gy2_ref, dcorr_ref, gyp):
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

    # edge-correction cotangent: corr enters cs2 additively on the four
    # boundary frames, so dcorr is just those dcs rows
    dcorr_ref[0:2] = dcs[0:2]
    dcorr_ref[2:4] = dcs[t - 2 : t]
    dcorr_ref[4:8] = jnp.zeros((4, dcs.shape[1]), jnp.float32)

    # --- analysis backward: transposed slab matmuls, un-framing ---
    gb = dcs.astype(jnp.bfloat16)
    gyp[:] = jnp.zeros_like(gyp)
    for k in range(r):
        gyp[k : k + t, :] += jnp.dot(
            gb, cswt_ref[:][:, k * hop : (k + 1) * hop],
            preferred_element_type=jnp.float32,
        )
    gy2_ref[:] = gyp[pad_rows : pad_rows + lr, :]


def _ad_bwd_impl(g, res):
    (pred, nph, mel, y0, y1, y2r, y3, mu1, r1, rin0, rin1, rin2, rin3,
     gmu, gr, s, lr, hop, cswt, c) = res
    t = nph.shape[0]
    p2 = nph.shape[1]
    r = cswt.shape[1] // hop
    vs = pl.BlockSpec(memory_space=pltpu.VMEM)
    ss = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        _ad_bwd_kernel,
        in_specs=[vs] * 14 + [ss] * 3 + [vs] * 8,
        out_specs=[vs, vs],
        out_shape=[
            jax.ShapeDtypeStruct((lr, hop), jnp.float32),   # gy2
            jax.ShapeDtypeStruct((8, p2), jnp.float32),     # dcorr
        ],
        scratch_shapes=[pltpu.VMEM((t + r - 1, hop), jnp.float32)],
        interpret=_use_interpret(),
    )(g, pred, nph, mel, y0, y1, y2r, y3, mu1, r1, rin0, rin1, rin2, rin3,
      gmu, gr, s, c.pm, c.w0, c.w1, c.w2, c.w3, c.eot, c.melbt, cswt)


# ------------------------------------------------------------- wrapper ---

def _ad_fwd2(y2, corr, csw, cswt, c):
    outs = _ad_fwd_impl(y2, corr, csw, c)
    lr, hop = y2.shape
    return outs[0][0, :20], (*outs, lr, hop, cswt, c)


def _ad_bwd2(res, g):
    (*outs, lr, hop, cswt, c) = res
    gpad = jnp.zeros((1, 128), jnp.float32).at[0, :20].set(g)
    gy2, dcorr = _ad_bwd_impl(gpad, (*outs, lr, hop, cswt, c))
    zero_c = jax.tree_util.tree_map(jnp.zeros_like, c)
    return (gy2, dcorr, jnp.zeros_like(cswt).T, jnp.zeros_like(cswt),
            zero_c)


def analysis_detector(y2, corr, csw, cswt, c: DetConsts) -> jnp.ndarray:
    """Fused analysis+detector for ONE clip.

    ``y2``: (T-1, hop) f32 normalized signal rows (the synthesis kernel's
    output); ``corr``: (8, 2P) f32 reflect-pad edge rows
    (``edge_correction_rows``, rows [frame0, frame1, frameT-2, frameT-1,
    0...]); ``csw``/``cswt``: bf16 windowed analysis basis and its
    transpose; ``c``: the packed detector constants.  Returns the (20,)
    tanh bit values; batch with ``vmap`` (batch -> kernel grid).
    """
    return _analysis_detector_raw(y2, corr, csw, cswt, c)


@jax.custom_vjp
def _analysis_detector_raw(y2, corr, csw, cswt, c: DetConsts):
    outs = _ad_fwd_impl(y2, corr, csw, c)
    return outs[0][0, :20]


_analysis_detector_raw.defvjp(_ad_fwd2, _ad_bwd2)


# ----------------------------------------------------- pure-jax replica ---

def analysis_detector_reference(y2, corr, csw_f32, c: DetConsts):
    """Op-for-op pure-jax replica (same bf16 casts) for interpret-mode
    equality and CPU tests: zero-pad framing + slab DFT + corr rows +
    the detector replica math."""
    from aware_tpu.ops.pallas.detector import detector_fused_reference

    lr, hop = y2.shape
    t = lr + 1
    r = csw_f32.shape[0] // hop
    pad_rows = r // 2
    yp = jnp.zeros((t + r - 1, hop), jnp.float32)
    yp = yp.at[pad_rows : pad_rows + lr].set(y2)
    p2 = corr.shape[1]
    cs2 = jnp.concatenate(
        [corr[0:2], jnp.zeros((t - 4, p2), jnp.float32), corr[2:4]], axis=0
    )
    for k in range(r):
        cs2 = cs2 + jnp.dot(
            yp[k : k + t].astype(jnp.bfloat16),
            csw_f32[k * hop : (k + 1) * hop].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    return detector_fused_reference(cs2, c)
