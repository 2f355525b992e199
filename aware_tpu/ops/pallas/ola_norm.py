"""Fused Pallas kernel: overlap-add -> crop -> envelope -> double peak-norm.

The bandwidth-bound middle of the embed hot loop
(reference dataflow: multibit_embedder.py:49-67 — ISTFT overlap-add,
center crop, envelope division, then the post-pipeline peak-normalize
followed by the pre-pipeline peak-normalize).  In XLA this chain makes ~6
HBM round trips over the per-clip signal; one v5e core's VMEM holds the
whole 10 s clip (640 KB) plus its frames (2.5 MB), so the fused kernel does
one read of the windowed ISTFT frames and one write of the normalized
signal.

A custom VJP keeps the backward pass fused too.  Derivation for the
composed double peak-norm y2 = pn(pn(y)), pn(x) = x/(max|x|+e):

    M = max|y|, N = M/(M+e), C = (M+e)(N+e)      => y2 = y / C
    Q = sum(g . y2), P = (N+e) Q, K = P (e + C) / C^2
    dL/dy = g / C  -  K . sign(y) . mask / t

with ``mask`` the |y|==M tie set and ``t`` its size — exactly the equal-
tie-splitting semantics of jax's ``max`` VJP, so toggling the kernel on or
off does not change trajectories (validated in tests/test_pallas.py against
the autodiff of the unfused chain).

Layout: signals are kept as (rows, hop) 2-D tiles throughout — hop=256 is
two native 128-lane tiles, and the overlap-add becomes r = n_fft/hop
statically-shifted row adds.

Measured on v5e: compiles and matches the XLA chain, but runs ~10% slower
inside the embed scan — XLA already fuses this chain competitively, and the
kernel's serialized in-VMEM row adds lose to the VPU-parallel XLA schedule.
It therefore ships as an opt-in (``AwareConfig.use_pallas_ola``); kept as
the validated VMEM-resident pattern for future batch-tiled variants (e.g.
fusing the DFT matmuls in, where the MXU/VPU overlap story changes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-8


def _use_interpret() -> bool:
    # Mosaic kernels only exist for TPU; every other backend (cpu, gpu)
    # runs the interpreter so the code path stays portable
    return jax.default_backend() != "tpu"


def _fwd_kernel(wf_ref, env_ref, y2_ref, m1_ref, acc):
    """One clip: wframes (1, T, n_fft) -> y2 rows (1, Lr, hop), m1 (1, 1)."""
    t, n_fft = wf_ref.shape[1], wf_ref.shape[2]
    lr, hop = y2_ref.shape[1], y2_ref.shape[2]
    r = n_fft // hop
    pad_rows = (n_fft // 2) // hop

    acc[:] = jnp.zeros_like(acc)
    wf = wf_ref[0]
    for k in range(r):
        acc[k : k + t, :] += wf[:, k * hop : (k + 1) * hop]

    y_env = acc[pad_rows : pad_rows + lr, :] / env_ref[:]
    m1 = jnp.max(jnp.abs(y_env))
    c1 = m1 + _EPS
    m2 = m1 / c1
    c = c1 * (m2 + _EPS)
    y2_ref[0] = y_env / c
    m1_ref[0, 0] = m1


def _bwd_kernel(g_ref, y2_ref, env_ref, m1_ref, dwf_ref, grows):
    """VJP: g rows (1, Lr, hop) -> dwframes (1, T, n_fft)."""
    t, n_fft = dwf_ref.shape[1], dwf_ref.shape[2]
    lr, hop = g_ref.shape[1], g_ref.shape[2]
    r = n_fft // hop
    pad_rows = (n_fft // 2) // hop

    g = g_ref[0]
    y2 = y2_ref[0]
    m1 = m1_ref[0, 0]
    c1 = m1 + _EPS
    n_ = m1 / c1
    c = c1 * (n_ + _EPS)
    y_env = y2 * c

    q = jnp.sum(g * y2)
    p = (n_ + _EPS) * q
    k_coef = p * (_EPS + c) / (c * c)
    # the tie mask must come from y2 itself: reconstructing y_env = y2*c
    # rounds in f32 and |y_env| == m1 can then match nothing (ties=0 -> NaN);
    # scaling by a positive scalar preserves the argmax set
    m2b = jnp.max(jnp.abs(y2))
    mask = (jnp.abs(y2) == m2b).astype(g.dtype)
    ties = jnp.sum(mask)
    g_env = g / c - k_coef * jnp.sign(y2) * mask / ties
    g_crop = g_env / env_ref[:]

    grows[:] = jnp.zeros_like(grows)
    grows[pad_rows : pad_rows + lr, :] = g_crop
    for k in range(r):
        dwf_ref[0, :, k * hop : (k + 1) * hop] = grows[k : k + t, :]


def _env_rows(window: tuple, n_fft: int, hop: int, t: int) -> np.ndarray:
    from aware_tpu.ops.stft import _ola_envelope

    env = _ola_envelope(window, n_fft, hop, t)
    return env.reshape(-1, hop).astype(np.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def ola_normalize(
    wframes: jnp.ndarray, n_fft: int, hop: int, window: tuple
) -> jnp.ndarray:
    """Fused OLA + crop + envelope + double peak-norm.

    wframes: (B, T, n_fft) windowed ISTFT time frames.
    Returns the doubly-peak-normalized signal (B, (T-1)*hop).
    Requires hop | n_fft and hop | n_fft//2 (true for the 1024/256 card).
    """
    y2, _ = _ola_fwd_impl(wframes, n_fft, hop, window)
    return y2


def _ola_fwd_impl(wframes, n_fft, hop, window):
    b, t, _ = wframes.shape
    lr = (t - 1) * hop // hop  # rows of output
    env = jnp.asarray(_env_rows(window, n_fft, hop, t))
    y2_rows, m1 = pl.pallas_call(
        _fwd_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, n_fft), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lr, hop), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, lr, hop), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, lr, hop), wframes.dtype),
            jax.ShapeDtypeStruct((b, 1), wframes.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((t + n_fft // hop - 1, hop), jnp.float32)],
        interpret=_use_interpret(),
    )(wframes, env)
    return y2_rows.reshape(b, lr * hop), (y2_rows, m1)


def _ola_vjp_fwd(wframes, n_fft, hop, window):
    y2, res = _ola_fwd_impl(wframes, n_fft, hop, window)
    return y2, res


def _ola_vjp_bwd(n_fft, hop, window, res, g):
    y2_rows, m1 = res
    b, lr, hp = y2_rows.shape
    t = lr + 1
    env = jnp.asarray(_env_rows(window, n_fft, hop, t))
    g_rows = g.reshape(b, lr, hp)
    dwf = pl.pallas_call(
        _bwd_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, lr, hp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lr, hp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lr, hp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t, n_fft), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, n_fft), g.dtype),
        scratch_shapes=[
            pltpu.VMEM((t + n_fft // hop - 1, hp), jnp.float32)
        ],
        interpret=_use_interpret(),
    )(g_rows, y2_rows, env, m1)
    return (dwf,)


ola_normalize.defvjp(_ola_vjp_fwd, _ola_vjp_bwd)
