"""Time-tiled Pallas kernels for the embed round trip on LONG clips.

The whole-clip kernels (ops/pallas/roundtrip.py) keep every frame in VMEM
and therefore stop at ~1024 frames (~16 s @ 16 kHz); past that the solver
fell back to the XLA slab path, so the fastest path never served
long-form embeds (round-2 VERDICT item 5).  These kernels remove the
bound by gridding over time tiles with a 3-frame halo:

  every direction of the slab round trip is the same access pattern —
      out[t] = sum_o  x[t + o] @ W_o ,  o in 0..r-1  (r = n_fft/hop = 4)
  — so one generic "shifted-slab matmul" kernel serves the synthesis
  transpose and both analysis directions, with the per-use slab weights
  pre-stacked (4, D, E) in the right o-order.  The synthesis forward is
  a specialized variant that also folds in the Re/Im construction from
  (coeffs, cos/sin phase), the OLA envelope division, the out-of-band
  constant, and a running |u| max carried across the sequential grid
  (TPU grids execute in order, so an output scalar doubles as an
  accumulator).

Inputs stay in HBM (``pltpu.ANY``) and each program DMAs its halo'd
row window; callers pad the time axis so every window is in-bounds
(zero halo rows contribute zero to the sums — exactness preserved).
The double peak-norm scale and its max-subgradient VJP run in XLA
(two elementwise streams — bandwidth-trivial next to the matmuls).

Batching: ``vmap`` of a pallas_call with ANY-space operands produces a
block spec Mosaic rejects ("supports in memory space ANY only blocks
having the same block shape as the array shape"), so the kernels here
are NATIVELY batched — batch is the outer grid dimension, each program
DMAs its (clip, tile) window — and the public ops intercept ``vmap``
with ``jax.custom_batching.custom_vmap`` to dispatch into the batched
grid instead of letting Pallas's generic batching rule fire.  One vmap
level is supported (the solver's ``embed_batch``); the custom_vjp
wrappers are only ever vmapped, never differentiated through, so
custom_vmap's autodiff limitation never applies.

Numerics match the whole-clip kernels: bf16 matmul operands, f32
accumulation, reflect-pad handled by the caller's XLA edge corrections
(ops/pallas/roundtrip.py edge_corrections — unchanged).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-8
R = 4          # n_fft // hop for the supported 1024/256 geometry
HALO = R - 1   # 3 extra rows per tile window
# DMA window rows per tile: the halo'd window is TILE+3, but Mosaic
# requires (sub)slices of a tiled memref to be 8-row aligned along the
# sublane dim ("Slice shape along dimension 1 must be aligned to tiling
# (8), but is 259" — the ANY-space operand can be placed in VMEM, where
# the constraint is enforced; first seen on the round-5 chip compile).
# Each program copies HALO_PAD rows and uses the first TILE+HALO.
HALO_PAD = 8
TILE = 256     # frames per grid step


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ------------------------------------------------ generic shifted matmul ---

def _shift_mm_kernel(x_any, w_ref, out_ref, xbuf, sem):
    b = pl.program_id(0)
    i = pl.program_id(1)
    tt = out_ref.shape[0]
    cp = pltpu.make_async_copy(
        x_any.at[b, pl.ds(i * tt, tt + HALO_PAD)], xbuf, sem
    )
    cp.start()
    cp.wait()
    xb = xbuf[:].astype(jnp.bfloat16)
    acc = jnp.dot(xb[0:tt], w_ref[0], preferred_element_type=jnp.float32)
    for o in range(1, R):
        acc = acc + jnp.dot(
            xb[o : o + tt], w_ref[o], preferred_element_type=jnp.float32
        )
    out_ref[:] = acc


def _shift_mm_core(xp3: jnp.ndarray, w: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """Batched core: xp3 (B, N, D) -> (B, n_out, E); grid = (B, tiles)."""
    bsz, n_rows, d = xp3.shape
    e = w.shape[2]
    n_pad = _cdiv(n_out, TILE) * TILE
    if n_rows < n_pad + HALO_PAD:
        xp3 = jnp.pad(xp3, ((0, 0), (0, n_pad + HALO_PAD - n_rows), (0, 0)))
    grid = n_pad // TILE
    out = pl.pallas_call(
        _shift_mm_kernel,
        grid=(bsz, grid),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, TILE, e), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, n_pad, e), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TILE + HALO_PAD, d), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_use_interpret(),
    )(xp3, w)
    return out[:, :n_out]


@functools.lru_cache(maxsize=None)
def _shift_mm_cv(n_out: int):


    @custom_vmap
    def f(xp, w):
        return _shift_mm_core(xp[None], w, n_out)[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, xp, w):
        xb, wb = in_batched
        if wb:  # never happens on the solver path; sequential fallback
            xpb = xp if xb else jnp.broadcast_to(
                xp[None], (axis_size,) + xp.shape
            )
            return jax.lax.map(lambda a: f(a[0], a[1]), (xpb, w)), True
        if not xb:
            xp = jnp.broadcast_to(xp[None], (axis_size,) + xp.shape)
        return _shift_mm_core(xp, w, n_out), True

    return f


def shift_mm(xp: jnp.ndarray, w: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """out[t] = sum_o xp[t+o] @ w[o] for t < n_out (tiled over time).

    xp: (>= n_out_padded + HALO, D) f32; w: (R, D, E) bf16.  The caller
    guarantees xp rows beyond its logical extent are zero.  vmappable
    (one level) via the batched grid — see module docstring.
    """
    return _shift_mm_cv(int(n_out))(xp, w)


# ------------------------------------------------- synthesis fwd (fused) ---

def _synth_tiled_kernel(ct_any, csin_any, yconst_ref, env_ref, w_ref,
                        u_ref, m1_ref, cbuf, sbuf, sem):
    b = pl.program_id(0)
    i = pl.program_id(1)
    tt = u_ref.shape[0]
    p = cbuf.shape[1]
    cp1 = pltpu.make_async_copy(
        ct_any.at[b, pl.ds(i * tt, tt + HALO_PAD)], cbuf, sem.at[0]
    )
    cp2 = pltpu.make_async_copy(
        csin_any.at[b, pl.ds(i * tt, tt + HALO_PAD)], sbuf, sem.at[1]
    )
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()
    c = cbuf[:]
    reim_cos = (c * sbuf[:, :p]).astype(jnp.bfloat16)
    reim_sin = (c * sbuf[:, p:]).astype(jnp.bfloat16)

    acc = jnp.zeros_like(u_ref)
    for o in range(R):
        xb = jnp.concatenate(
            [reim_cos[o : o + tt], reim_sin[o : o + tt]], axis=1
        )
        acc = acc + jnp.dot(
            xb, w_ref[o], preferred_element_type=jnp.float32
        )
    u = acc / env_ref[:] + yconst_ref[:]
    u_ref[:] = u
    tile_max = jnp.max(jnp.abs(u))

    @pl.when(i == 0)
    def _():
        m1_ref[0, 0] = tile_max

    @pl.when(i > 0)
    def _():
        m1_ref[0, 0] = jnp.maximum(m1_ref[0, 0], tile_max)


def _synth_core(ctp3, csinp3, yconst3, env3, w_fwd):
    """Batched core: (B, T+halo, P)+(B, T+halo, 2P)+(B, LR, hop)x2 ->
    u (B, LR, hop), m1 (B,); grid = (B, tiles), running-max per clip."""
    bsz, lr, hop = env3.shape
    p = ctp3.shape[2]
    n_pad = _cdiv(lr, TILE) * TILE
    pad = n_pad - lr
    if pad:
        yconst3 = jnp.pad(yconst3, ((0, 0), (0, pad), (0, 0)))
        env3 = jnp.pad(env3, ((0, 0), (0, pad), (0, 0)), constant_values=1.0)
    if ctp3.shape[1] < n_pad + HALO_PAD:
        grow = n_pad + HALO_PAD - ctp3.shape[1]
        ctp3 = jnp.pad(ctp3, ((0, 0), (0, grow), (0, 0)))
        csinp3 = jnp.pad(csinp3, ((0, 0), (0, grow), (0, 0)))
    grid = n_pad // TILE
    u, m1 = pl.pallas_call(
        _synth_tiled_kernel,
        grid=(bsz, grid),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((None, TILE, hop), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, TILE, hop), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, TILE, hop), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, 1), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n_pad, hop), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE + HALO_PAD, p), jnp.float32),
            pltpu.VMEM((TILE + HALO_PAD, 2 * p), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_use_interpret(),
    )(ctp3, csinp3, yconst3, env3, w_fwd)
    return u[:, :lr], m1[:, 0, 0]


def _bcast(x, axis_size, batched):
    return x if batched else jnp.broadcast_to(x[None], (axis_size,) + x.shape)


@custom_vmap
def _synth_tiled_impl(ctp, csinp, yconst2d, env2d, w_fwd):
    u, m1 = _synth_core(
        ctp[None], csinp[None], yconst2d[None], env2d[None], w_fwd
    )
    return u[0], m1[0]


@_synth_tiled_impl.def_vmap
def _synth_tiled_vmap(axis_size, in_batched, ctp, csinp, yconst2d, env2d,
                      w_fwd):
    cb, sb, yb, eb, wb = in_batched
    if wb:  # per-clip bases never happen on the solver path
        args = tuple(
            _bcast(a, axis_size, b)
            for a, b in zip((ctp, csinp, yconst2d, env2d, w_fwd), in_batched)
        )
        return jax.lax.map(lambda a: _synth_tiled_impl(*a), args), (True, True)
    ctp = _bcast(ctp, axis_size, cb)
    csinp = _bcast(csinp, axis_size, sb)
    yconst2d = _bcast(yconst2d, axis_size, yb)
    env2d = _bcast(env2d, axis_size, eb)  # a shared constant under vmap
    u, m1 = _synth_core(ctp, csinp, yconst2d, env2d, w_fwd)
    return (u, m1), (True, True)


# ----------------------------------------------------------- public ops ---

def build_tiled_bases(ab_np: np.ndarray, csw_np: np.ndarray):
    """Pre-stack the per-o slab weights for all four directions (host
    numpy -> bf16 jnp constants).

    ab_np: (2P, n_fft) f32 windowed synthesis basis; csw_np: (n_fft, 2P)
    f32 windowed analysis basis (the same padded layouts the whole-clip
    kernels use: Re rows/cols at [0, nb), Im at [P, P+nb)).
    """
    p2, n_fft = ab_np.shape
    hop = n_fft // R
    w_sf = np.stack(  # synth fwd: u[t] += reim[t+o] @ ab_cols(R-1-o)
        [np.ascontiguousarray(ab_np[:, (R - 1 - o) * hop : (R - o) * hop])
         for o in range(R)]
    )
    w_sb = np.stack(  # synth bwd: dreim[m] += g_up[m+o] @ ab_cols(o)^T
        [ab_np[:, o * hop : (o + 1) * hop].T.copy() for o in range(R)]
    )
    w_af = np.stack(  # analysis fwd: cs2[t] += yp[t+o] @ csw_rows(o)
        [np.ascontiguousarray(csw_np[o * hop : (o + 1) * hop, :])
         for o in range(R)]
    )
    w_ab = np.stack(  # analysis bwd: dyp[i] += gp[i+o] @ csw_rows(R-1-o)^T
        [csw_np[(R - 1 - o) * hop : (R - o) * hop, :].T.copy()
         for o in range(R)]
    )
    return {
        "w_sf": jnp.asarray(w_sf, jnp.bfloat16),
        "w_sb": jnp.asarray(w_sb, jnp.bfloat16),
        "w_af": jnp.asarray(w_af, jnp.bfloat16),
        "w_ab": jnp.asarray(w_ab, jnp.bfloat16),
    }


def make_csinp(cos_in: jnp.ndarray, sin_in: jnp.ndarray, p: int) -> jnp.ndarray:
    """(T+HALO, 2P) padded [cos | sin] constant aligned with the padded
    coefficient rows (row m+1 holds phase column m).  Built with jnp —
    the phase is a traced value inside the jitted build."""
    nb, t = cos_in.shape
    csinp = jnp.zeros((t + HALO, 2 * p), jnp.float32)
    csinp = csinp.at[1 : t + 1, :nb].set(cos_in.T)
    csinp = csinp.at[1 : t + 1, p : p + nb].set(sin_in.T)
    return csinp


@jax.custom_vjp
def synth_norm_tiled(ct, csinp, yconst2d, env2d, w_sf, w_sb):
    """Tiled synthesis half: padded time-major coefficients (T, P) ->
    doubly-peak-normalized signal rows (T-1, hop).  Same contract as
    roundtrip.synth_norm, without the whole-clip VMEM residency."""
    y2, _ = _synth_fwd_parts(ct, csinp, yconst2d, env2d, w_sf)
    return y2


def _synth_fwd_parts(ct, csinp, yconst2d, env2d, w_sf):
    t, p = ct.shape
    ctp = jnp.pad(ct, ((1, HALO - 1), (0, 0)))  # u[j] reads rows j-1..j+2
    u, m1 = _synth_tiled_impl(ctp, csinp, yconst2d, env2d, w_sf)
    cden = m1 * (1.0 + _EPS) + _EPS * _EPS
    y2 = u / cden
    return y2, (y2, m1)


def _synth_tiled_fwd(ct, csinp, yconst2d, env2d, w_sf, w_sb):
    y2, (y2_r, m1) = _synth_fwd_parts(ct, csinp, yconst2d, env2d, w_sf)
    return y2, (y2_r, m1, csinp, env2d, w_sb)


def _synth_tiled_bwd(res, g):
    y2, m1, csinp, env2d, w_sb = res
    lr, hop = y2.shape
    t = lr + 1
    p = csinp.shape[1] // 2
    cden = m1 * (1.0 + _EPS) + _EPS * _EPS
    # double-norm backward (same equal-tie-split max subgradient as the
    # whole-clip kernel; derivation in ops/pallas/ola_norm.py)
    q = jnp.sum(g * y2)
    m2b = jnp.max(jnp.abs(y2))
    mask = (jnp.abs(y2) == m2b).astype(g.dtype)
    ties = jnp.sum(mask)
    g_u = g / cden - (q * (1.0 + _EPS) / cden) * jnp.sign(y2) * mask / ties
    g_crop = g_u / env2d[:lr]
    # dreim[m] = sum_k g_yd[m + k] @ AB_k^T with g_yd = g_crop at the crop
    # offset pad_rows = HALO-1, i.e. dreim[m] = sum_o g_up[m + o] @ w_sb[o]
    # after padding g_crop with HALO-1 leading zero rows
    g_up = jnp.pad(g_crop, ((HALO - 1, 0), (0, 0)))
    dreim = shift_mm(g_up, w_sb, t)  # (T, 2P), row m = d reim[m]
    # csinp row m+1 holds the phase of coefficient column m
    dct = (
        dreim[:, :p] * csinp[1 : t + 1, :p]
        + dreim[:, p:] * csinp[1 : t + 1, p:]
    )
    return (dct, jnp.zeros_like(csinp), jnp.zeros_like(env2d),
            jnp.zeros_like(env2d), jnp.zeros_like(w_sb).transpose(0, 2, 1),
            jnp.zeros_like(w_sb))


synth_norm_tiled.defvjp(_synth_tiled_fwd, _synth_tiled_bwd)


@jax.custom_vjp
def band_analysis_tiled(y2, w_af, w_ab):
    """Tiled analysis half: signal rows (T-1, hop) -> zero-padded framed
    in-band Re/Im (T, 2P).  Same contract as roundtrip.band_analysis
    (reflect-pad boundary added by the caller's XLA edge corrections)."""
    lr = y2.shape[0]
    t = lr + 1
    # cs2[t_row] = sum_o yp[t_row + o] @ W_af[o], yp = y2 at pad offset 2
    yp = jnp.pad(y2, ((HALO - 1, 0), (0, 0)))
    return shift_mm(yp, w_af, t)


def _analysis_tiled_fwd(y2, w_af, w_ab):
    return band_analysis_tiled(y2, w_af, w_ab), (y2.shape, w_af, w_ab)


def _analysis_tiled_bwd(res, g):
    (lr, hop), w_af, w_ab = res
    # dyp[i] = sum_k g[i - k] @ W_af[k]^T = sum_o gp[i + o] @ w_ab[o] with
    # gp = g padded by HALO leading zero rows; y2 row j = yp row j + HALO-1
    gp = jnp.pad(g, ((HALO, 0), (0, 0)))
    dyp = shift_mm(gp, w_ab, lr + HALO)
    gy2 = dyp[HALO - 1 : HALO - 1 + lr]
    return gy2, jnp.zeros_like(w_af), jnp.zeros_like(w_ab)


band_analysis_tiled.defvjp(_analysis_tiled_fwd, _analysis_tiled_bwd)
