"""Fused Pallas detector kernels — the conv/norm stack VMEM-resident.

Removes the embed loop's detector-half batch cliff: the XLA batched
detector materializes (B, 1024, T) conv/norm intermediates in HBM between
stages, so per-clip throughput *decreases* past B~32 (BENCH_SWEEP.json,
docs/PERF_NOTES.md "Batch choice").  Here the whole forward for ONE clip —
in-band magnitude -> mel -> instance norm -> global standardize -> avg
pool -> 4x (1x1 conv -> instance norm -> leaky relu) -> BRH readout
(reference graph: multibit_detector_net.py:109-140, BRH.py:16-27) — runs
inside one kernel whose intermediates never leave VMEM; `vmap` turns the
batch into the kernel grid, so the working set per program is one clip's
(~6 MB) regardless of B.

Layout is time-major, (time, channels): every channel count in the
default architecture (128/512/1024/1024, 40 padded to 128; band 225
padded to 256) is a native lane multiple, and the time axis lives on
sublanes where any length is legal — which is also why this kernel has no
frame-count bound (VMEM capacity gates it instead, see
``fused_detector_supported``).

The backward kernel exploits that the detector is FROZEN KEY MATERIAL
(reference: multibit_embedder.py:76-77 — weights never train in the
embed loop): only the input cotangent flows, no weight gradients, so the
VJP is four transposed matmuls plus closed-form norm backwards

    instance-norm:      dh = r * (u - mean_t u - yhat * mean_t(u yhat))
    global-standardize: da = gr*(u - mean u) - b * sum(u*b)/(s*(N-1))

computed from bf16 residuals (normalized pre-activations) written by the
forward.  Matmul operands are bf16 with f32 accumulation — the same
single-pass-MXU profile as the fused round-trip kernels
(ops/pallas/roundtrip.py); equivalence to the XLA detector is asserted at
fp tolerance and at solve-outcome level (tests/test_pallas_detector.py).

Magnitude is fused: the kernel input is the analysis kernel's in-band
Re/Im (T, 2P) tensor and the forward computes |.| with torch's sgn(0)=0
gradient convention (ops/stft.py safe_magnitude), so between the
round-trip and detector kernels only that one tensor touches HBM.
"""

from __future__ import annotations

import typing

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_IN_EPS = 1e-5   # nn.InstanceNorm1d eps (inside rsqrt)
_GS_EPS = 1e-8   # GlobalStandardize eps (added to the std)

# padded channel widths of the default architecture
P_BAND = 256     # in-band bins 225 -> lane multiple
CH = (128, 512, 1024, 1024, 128)  # mel, conv0..conv3 out (40 -> 128)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


class DetConsts(typing.NamedTuple):
    """Trace-time constants of the fused detector (key material + bases).

    Built once per (params, band, frame-count) by
    :func:`fused_detector_consts`; passed through the custom-VJP as
    ordinary operands with zero cotangents.
    """

    melb: jnp.ndarray   # (P_BAND, 128) bf16 — mel basis rows lo:hi, transposed
    pmt: jnp.ndarray    # (T2, T) bf16 — AvgPool1d(2,2) matrix, transposed
    pm: jnp.ndarray     # (T, T2) bf16 — pool matrix (backward)
    w0t: jnp.ndarray    # (128, 512) bf16   conv weights, transposed
    w1t: jnp.ndarray    # (512, 1024) bf16
    w2t: jnp.ndarray    # (1024, 1024) bf16
    w3t: jnp.ndarray    # (1024, 128) bf16 (out-channel 40 -> zero-padded)
    w0: jnp.ndarray     # (512, 128) bf16   untransposed (backward)
    w1: jnp.ndarray     # (1024, 512) bf16
    w2: jnp.ndarray     # (1024, 1024) bf16
    w3: jnp.ndarray     # (128, 1024) bf16
    biases: jnp.ndarray  # (4, 1024) f32, row i = conv_i bias zero-padded
    eo: jnp.ndarray     # (128, 128) f32 BRH even-odd readout matrix
    eot: jnp.ndarray    # (128, 128) f32 its transpose (backward)
    melbt: jnp.ndarray  # (128, P_BAND) bf16 (backward)


def fused_detector_consts(params, basis: np.ndarray, lo: int, hi: int,
                          t_frames: int) -> DetConsts:
    """Pack key weights + mel/pool/readout bases for the fused kernels.

    ``basis`` is the host-side (n_mels, n_fft//2+1) Slaney mel matrix
    (ops/mel.py); weights are the golden key pytree.  All heavy operands
    are bf16 (single-pass MXU); biases and the +-1 readout stay f32.
    """
    nb = hi - lo
    if nb > P_BAND:
        raise ValueError(f"band width {nb} exceeds padded width {P_BAND}")
    melb_np = np.zeros((P_BAND, 128), np.float32)
    melb_np[:nb] = basis[:, lo:hi].T
    t2 = t_frames // 2
    pm_np = np.zeros((t_frames, t2), np.float32)
    idx = np.arange(2 * t2)
    pm_np[idx, idx // 2] = 0.5
    eo_np = np.zeros((128, 128), np.float32)
    j = np.arange(20)
    eo_np[2 * j, j] = 1.0
    eo_np[2 * j + 1, j] = -1.0
    # params may be jit tracers (build_problem traces under jit), so the
    # weight operands are padded/transposed in-graph with jnp ops; XLA
    # hoists these one-time transforms out of the solver scan.
    biases = jnp.zeros((4, 1024), jnp.float32)
    ws = []
    for i in range(4):
        w = jnp.asarray(params[f"conv{i}_w"], jnp.float32)  # (C_out, C_in)
        b = jnp.asarray(params[f"conv{i}_b"], jnp.float32)
        c_out, c_in = w.shape
        wp = jnp.zeros((CH[i + 1], CH[i]), jnp.float32)
        wp = wp.at[:c_out, :c_in].set(w)
        ws.append(wp)
        biases = biases.at[i : i + 1, :c_out].set(b[None])
    return DetConsts(
        melb=jnp.asarray(melb_np, jnp.bfloat16),
        pmt=jnp.asarray(pm_np.T.copy(), jnp.bfloat16),
        pm=jnp.asarray(pm_np, jnp.bfloat16),
        w0t=ws[0].T.astype(jnp.bfloat16),
        w1t=ws[1].T.astype(jnp.bfloat16),
        w2t=ws[2].T.astype(jnp.bfloat16),
        w3t=ws[3].T.astype(jnp.bfloat16),
        w0=ws[0].astype(jnp.bfloat16),
        w1=ws[1].astype(jnp.bfloat16),
        w2=ws[2].astype(jnp.bfloat16),
        w3=ws[3].astype(jnp.bfloat16),
        biases=biases,
        eo=jnp.asarray(eo_np),
        eot=jnp.asarray(eo_np.T.copy()),
        melbt=jnp.asarray(melb_np.T.copy(), jnp.bfloat16),
    )


def fused_detector_supported(cfg, nb: int, t_frames: int,
                             n_fft: int | None = None) -> bool:
    """Whether the fused kernels implement this detector configuration.

    Anything else (exotic activations, non-instance norms, overlapping
    pools, channel counts off the lane grid, clips whose working set
    exceeds VMEM, or a detector net whose own n_fft disagrees with the
    solver's frame geometry — fused_detector_consts builds the mel bank
    from the solver's n_fft, so a mismatch would silently diverge from
    detector_apply_banded) falls back to the XLA banded forward.
    """
    ch_ok = all(c % 128 == 0 for c in cfg.channels[:-1])
    return (
        (n_fft is None or cfg.n_fft == n_fft)
        and cfg.norm_layer == "instance"
        and cfg.activation == "leaky_relu"
        and cfg.final_activation == "tanh"
        and cfg.initial_pool_size == 2
        and cfg.initial_pool_stride == 2
        and cfg.num_blocks == 3
        and tuple(cfg.channels) == (128, 512, 1024, 1024, 40)
        and ch_ok
        and nb <= P_BAND
        and t_frames <= 1024  # whole-clip VMEM residency
    )


def _leaky(x):
    return jnp.where(x >= 0, x, 0.2 * x)


# ----------------------------------------------------------------- fwd ---

def _det_fwd_values(cs, melb, pmt, w0t, w1t, w2t, w3t, biases, eo):
    """Value-level detector forward shared by the standalone kernel and the
    merged analysis+detector kernel (ops/pallas/analysis_detector.py).

    ``cs``: (T, 2P) f32 in-band Re/Im.  Returns the prediction plus every
    residual the closed-form backward needs:
    (pred, nph_re, nph_im, mel_bf16, [y0..y3], mu1, r1, [rin0..rin3],
    gmu, gr, s) — yhat/mel residuals already cast bf16.
    """
    t, p2 = cs.shape
    p = p2 // 2

    re, im = cs[:, :p], cs[:, p:]
    sq = re * re + im * im
    # The sgn(0)=0 gradient convention lives in the guarded rsqrt (the
    # unit phase is 0 at exactly-zero bins); the magnitude reuses it as
    # sq*rsqrt(sq) (= sqrt(sq) to 1 ulp, 0 exactly at 0), saving a
    # second transcendental — the VPU passes here sit on the whole-step
    # kernel's critical path.
    inv = jnp.where(sq == 0, 0.0, jax.lax.rsqrt(sq))
    m = sq * inv
    nph_re = (re * inv).astype(jnp.bfloat16)
    nph_im = (im * inv).astype(jnp.bfloat16)

    mel = jnp.dot(m.astype(jnp.bfloat16), melb,
                  preferred_element_type=jnp.float32)      # (T, 128)

    # InstanceNorm1d over time, biased variance (reference conv1d.py
    # norm).  Two-pass (subtract-then-square) variance on purpose: the
    # one-pass E[x^2]-mu^2 form was tried for the round-4 headroom item
    # and REVERTED — on the single serialized VPU core it saves no op
    # count (still 2 reductions + the same elementwise), only a
    # dependency edge, while its cancellation amplified kernel-vs-
    # replica accumulation noise ~10x (1e-4 -> 1.5e-3-scale VJP drift).
    mu1 = jnp.mean(mel, axis=0, keepdims=True)             # (1, 128)
    var1 = jnp.mean((mel - mu1) ** 2, axis=0, keepdims=True)
    r1 = jax.lax.rsqrt(var1 + _IN_EPS)
    a = (mel - mu1) * r1

    # GlobalStandardize: whole-tensor mean / unbiased std + eps
    # (reference globalStandardize.py:16-21)
    n_el = t * 128
    gmu = jnp.mean(a)
    gvar = jnp.sum((a - gmu) ** 2) / (n_el - 1)
    s = jnp.sqrt(gvar)
    gr = 1.0 / (s + _GS_EPS)
    b_full = (a - gmu) * gr

    # AvgPool1d(2, 2) as the (T2, T) pool matmul in f32 (torch floor-
    # division drop of a trailing odd frame = pmt's zero trailing
    # column).  The round-4 strided-sublane-add form (b_full[0::2] +
    # b_full[1::2]) was REVERTED: jax 0.9.0 Mosaic lowers strided
    # sublane slices to a gather it rejects ("Shape mismatch in input,
    # indices and output") — first seen on the round-5 chip run.  The
    # f32 matmul keeps the accuracy win over the old bf16 form: the
    # 0.5 entries are exponent-only scalings, so every product is
    # exact and the 2-term f32 accumulation matches the strided add.
    x = jnp.dot(pmt.astype(jnp.float32), b_full,
                preferred_element_type=jnp.float32)

    wts = (w0t, w1t, w2t, w3t)
    ys, rins = [], []
    for i in range(4):
        c_out = CH[i + 1]
        h = jnp.dot(x.astype(jnp.bfloat16), wts[i],
                    preferred_element_type=jnp.float32)
        h = h + biases[i:i + 1, :c_out]
        mu = jnp.mean(h, axis=0, keepdims=True)
        var = jnp.mean((h - mu) ** 2, axis=0, keepdims=True)
        r = jax.lax.rsqrt(var + _IN_EPS)
        yhat = (h - mu) * r
        ys.append(yhat.astype(jnp.bfloat16))
        rins.append(r)
        x = _leaky(yhat)

    # BRH: masked-free time mean (shapes are exact), even-odd readout,
    # tanh (reference BRH.py:16-27); the +-1 contraction stays f32
    pool4 = jnp.mean(x, axis=0, keepdims=True)             # (1, 128)
    outp = jnp.dot(pool4, eo, preferred_element_type=jnp.float32)
    pred = jnp.tanh(outp)
    return (pred, nph_re, nph_im, mel.astype(jnp.bfloat16), ys, mu1, r1,
            rins, gmu, gr, s)


def _fwd_kernel(cs_ref, melb_ref, pmt_ref, w0t_ref, w1t_ref, w2t_ref,
                w3t_ref, b_ref, eo_ref,
                pred_ref, nph_ref, mel_ref, y0_ref, y1_ref, y2_ref, y3_ref,
                mu1_ref, r1_ref, rin0_ref, rin1_ref, rin2_ref, rin3_ref,
                gmu_ref, gr_ref, s_ref):
    p = cs_ref.shape[1] // 2
    (pred, nph_re, nph_im, mel, ys, mu1, r1, rins, gmu, gr, s) = (
        _det_fwd_values(
            cs_ref[:], melb_ref[:], pmt_ref[:], w0t_ref[:], w1t_ref[:],
            w2t_ref[:], w3t_ref[:], b_ref[:], eo_ref[:],
        )
    )
    nph_ref[:, :p] = nph_re
    nph_ref[:, p:] = nph_im
    mel_ref[:] = mel
    for ref, y in zip((y0_ref, y1_ref, y2_ref, y3_ref), ys):
        ref[:] = y
    mu1_ref[:] = mu1
    r1_ref[:] = r1
    for ref, r in zip((rin0_ref, rin1_ref, rin2_ref, rin3_ref), rins):
        ref[:] = r
    gmu_ref[0, 0] = gmu
    gr_ref[0, 0] = gr
    s_ref[0, 0] = s
    pred_ref[:] = pred


def _fwd_impl(cs, c: DetConsts):
    t = cs.shape[0]
    t2 = c.pmt.shape[0]
    vs = pl.BlockSpec(memory_space=pltpu.VMEM)
    ss = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shapes = [
        jax.ShapeDtypeStruct((1, 128), jnp.float32),        # pred
        jax.ShapeDtypeStruct(cs.shape, jnp.bfloat16),       # nph
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
    out_specs = [vs] * 13 + [ss] * 3
    return pl.pallas_call(
        _fwd_kernel,
        in_specs=[vs] * 9,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_use_interpret(),
    )(cs, c.melb, c.pmt, c.w0t, c.w1t, c.w2t, c.w3t, c.biases, c.eo)


# ----------------------------------------------------------------- bwd ---

def _det_bwd_values(g, pred, nph, mel_bf, ys, mu1, r1, rins, gmu, gr, s,
                    pm, w0, w1, w2, w3, eot, melbt):
    """Value-level detector backward (input cotangent only — the net is
    frozen key material).  Shared by the standalone kernel and the merged
    analysis+detector kernel.  Returns the (T, 2P) dcs value."""
    t, p2 = nph.shape
    p = p2 // 2
    t2 = ys[0].shape[0]

    gt = g * (1.0 - pred * pred)                           # tanh'
    dpool4 = jnp.dot(gt, eot, preferred_element_type=jnp.float32)
    dx = jnp.broadcast_to(dpool4 / t2, (t2, 128))          # mean-pool bwd

    ws = (w0, w1, w2, w3)
    for i in range(3, -1, -1):
        yhat = ys[i].astype(jnp.float32)
        r = rins[i]
        du = dx * jnp.where(yhat >= 0, 1.0, 0.2)           # leaky bwd
        # instance-norm input cotangent (closed form, frozen affine-less)
        dh = r * (
            du
            - jnp.mean(du, axis=0, keepdims=True)
            - yhat * jnp.mean(du * yhat, axis=0, keepdims=True)
        )
        dx = jnp.dot(dh.astype(jnp.bfloat16), ws[i],
                     preferred_element_type=jnp.float32)   # (T2, C_in)

    # pool backward: scatter halves back to frame rows.  f32 operands —
    # the pm entries (0.5/0) are bf16-exact, and keeping dx unrounded
    # makes this the exact adjoint of the forward's f32 strided pool
    # (matches the replica's autodiff; the matmul is tiny)
    db = jnp.dot(pm.astype(jnp.float32), dx,
                 preferred_element_type=jnp.float32)       # (T, 128)

    # GlobalStandardize backward
    mel = mel_bf.astype(jnp.float32)
    a = (mel - mu1) * r1
    b_full = (a - gmu) * gr
    n_el = t * 128
    da = gr * (db - jnp.mean(db)) - b_full * (
        jnp.sum(db * b_full) / (s * (n_el - 1))
    )
    # InstanceNorm backward at the mel stage
    dmel = r1 * (
        da
        - jnp.mean(da, axis=0, keepdims=True)
        - a * jnp.mean(da * a, axis=0, keepdims=True)
    )
    dm = jnp.dot(dmel.astype(jnp.bfloat16), melbt,
                 preferred_element_type=jnp.float32)       # (T, P)
    # |.| backward through the stored unit phase (sgn(0)=0 convention)
    nphf = nph.astype(jnp.float32)
    return jnp.concatenate(
        [dm * nphf[:, :p], dm * nphf[:, p:]], axis=1
    )


def _bwd_kernel(g_ref, pred_ref, nph_ref, mel_ref, y0_ref, y1_ref, y2_ref,
                y3_ref, mu1_ref, r1_ref, rin0_ref, rin1_ref, rin2_ref,
                rin3_ref, gmu_ref, gr_ref, s_ref,
                pm_ref, w0_ref, w1_ref, w2_ref, w3_ref, eot_ref, melbt_ref,
                dcs_ref):
    dcs_ref[:] = _det_bwd_values(
        g_ref[:], pred_ref[:], nph_ref[:], mel_ref[:],
        [y0_ref[:], y1_ref[:], y2_ref[:], y3_ref[:]],
        mu1_ref[:], r1_ref[:],
        [rin0_ref[:], rin1_ref[:], rin2_ref[:], rin3_ref[:]],
        gmu_ref[0, 0], gr_ref[0, 0], s_ref[0, 0],
        pm_ref[:], w0_ref[:], w1_ref[:], w2_ref[:], w3_ref[:],
        eot_ref[:], melbt_ref[:],
    )


def _bwd_impl(g, res):
    (pred, nph, mel, y0, y1, y2, y3, mu1, r1,
     rin0, rin1, rin2, rin3, gmu, gr, s, c) = res
    t = nph.shape[0]
    vs = pl.BlockSpec(memory_space=pltpu.VMEM)
    ss = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [vs] * 14 + [ss] * 3 + [vs] * 7
    return pl.pallas_call(
        _bwd_kernel,
        in_specs=in_specs,
        out_specs=vs,
        out_shape=jax.ShapeDtypeStruct((t, nph.shape[1]), jnp.float32),
        interpret=_use_interpret(),
    )(g, pred, nph, mel, y0, y1, y2, y3, mu1, r1, rin0, rin1, rin2, rin3,
      gmu, gr, s, c.pm, c.w0, c.w1, c.w2, c.w3, c.eot, c.melbt)


# ------------------------------------------------------------- wrapper ---

@jax.custom_vjp
def _detector_fused_raw(cs, c: DetConsts):
    outs = _fwd_impl(cs, c)
    return outs[0]


def _fused_fwd(cs, c):
    outs = _fwd_impl(cs, c)
    return outs[0], (*outs, c)


def _fused_bwd(res, g):
    dcs = _bwd_impl(g, res)
    c = res[-1]
    return dcs, jax.tree_util.tree_map(jnp.zeros_like, c)


_detector_fused_raw.defvjp(_fused_fwd, _fused_bwd)


def detector_fused(cs, c: DetConsts) -> jnp.ndarray:
    """Fused detector forward for ONE clip.

    ``cs``: (T, 2*P_BAND) f32 in-band Re/Im (the analysis kernel's output
    plus edge corrections); returns the (20,) tanh bit values.  Batch with
    ``vmap`` (the Pallas batching rule turns B into the kernel grid).
    """
    pred = _detector_fused_raw(cs, c)
    return pred[0, :20]


# ----------------------------------------------------- pure-jax replica ---

def detector_fused_reference(cs, c: DetConsts) -> jnp.ndarray:
    """Pure-jax op-for-op replica of the fused forward (same bf16 casts).

    The interpret-mode equality test pins the kernel to this; the
    tolerance comparison against the f32 XLA detector
    (models.detector.detector_apply_banded) is a separate test.
    """
    p = cs.shape[1] // 2
    re, im = cs[:, :p], cs[:, p:]
    sq = re * re + im * im
    # guarded double-where form (same VALUES as the kernel's
    # sq*rsqrt(sq)): the replica is autodiffed by the equivalence tests,
    # so its |.| must keep the sgn(0)=0 gradient — the inner where stops
    # rsqrt's -inf derivative at zero bins from NaN-ing the cotangent
    zero = sq == 0
    inv = jnp.where(zero, 0.0, jax.lax.rsqrt(jnp.where(zero, 1.0, sq)))
    m = sq * inv
    mel = jnp.dot(m.astype(jnp.bfloat16), c.melb,
                  preferred_element_type=jnp.float32)
    mu1 = jnp.mean(mel, axis=0, keepdims=True)
    var1 = jnp.mean((mel - mu1) ** 2, axis=0, keepdims=True)
    a = (mel - mu1) * jax.lax.rsqrt(var1 + _IN_EPS)
    n_el = mel.size
    gmu = jnp.mean(a)
    gvar = jnp.sum((a - gmu) ** 2) / (n_el - 1)
    b_full = (a - gmu) * (1.0 / (jnp.sqrt(gvar) + _GS_EPS))
    x = jnp.dot(c.pmt.astype(jnp.float32), b_full,
                preferred_element_type=jnp.float32)
    wts = (c.w0t, c.w1t, c.w2t, c.w3t)
    for i in range(4):
        c_out = CH[i + 1]
        h = jnp.dot(x.astype(jnp.bfloat16), wts[i],
                    preferred_element_type=jnp.float32)
        h = h + c.biases[i:i + 1, :c_out]
        mu = jnp.mean(h, axis=0, keepdims=True)
        var = jnp.mean((h - mu) ** 2, axis=0, keepdims=True)
        yhat = (h - mu) * jax.lax.rsqrt(var + _IN_EPS)
        x = _leaky(yhat)
    pool4 = jnp.mean(x, axis=0, keepdims=True)
    outp = jnp.dot(pool4, c.eo, preferred_element_type=jnp.float32)
    return jnp.tanh(outp)[0, :20]
