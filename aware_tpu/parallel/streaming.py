"""Sequence-parallel (context-parallel) long-form detection.

The detector is time-translation covariant until its global pools (SURVEY
§5): the only cross-sequence couplings are the instance-norm / global-
standardize statistics and the BRH time-average
(reference: multibit_detector_net.py:109-140, BRH.py:18).  That makes
hours-long audio shardable across a TPU slice on the STFT frame axis:

* each device holds a contiguous audio segment plus a halo of
  ``n_fft - hop`` samples ppermuted from its right neighbor, so framed STFT
  windows at shard edges are exact;
* all normalization statistics and the BRH pool become masked partial sums
  merged with ``psum`` over the ``seq`` axis;
* the result is bit-equivalent (fp tolerance) to single-device
  ``detect_values`` on the concatenated audio — asserted in
  tests/test_parallel.py on a fake 8-device CPU mesh.

Frame-count bookkeeping: with T = L//hop + 1 global frames, each device
processes Tloc = ceil(T / n_dev) frames (rounded up to even so the initial
AvgPool(2,2) never pairs across a shard boundary) and masks the overhang.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from aware_tpu.config import AwareConfig, in_band_bins
from aware_tpu.models.detector import (
    DetectorParams,
    _block_activation,
    _final_activation,
    _precision,
)
from aware_tpu.ops.mel import mel_filter_bank
from aware_tpu.ops.windows import get_window


def _psum(x, axis):
    return jax.lax.psum(x, axis_name=axis)


def _masked_instance_norm(x, mask, axis, eps=1e-5):
    """Per-channel normalization over globally-valid frames. x: (C, Tloc)."""
    n = _psum(jnp.sum(mask), axis)
    mean = _psum(jnp.sum(x * mask, axis=-1), axis) / n
    centered = (x - mean[:, None]) * mask
    var = _psum(jnp.sum(centered**2, axis=-1), axis) / n
    return (x - mean[:, None]) * jax.lax.rsqrt(var + eps)[:, None] * mask


def _masked_global_standardize(x, mask, axis, eps=1e-8):
    """Whole-tensor standardization (unbiased std) over valid frames."""
    n_frames = _psum(jnp.sum(mask), axis)
    n = x.shape[0] * n_frames
    mean = _psum(jnp.sum(x * mask), axis) / n
    centered = (x - mean) * mask
    var = _psum(jnp.sum(centered**2), axis) / (n - 1.0)
    return (x - mean) / (jnp.sqrt(var) + eps) * mask


def _sp_forward(params, mag, mask, cfg, prec, axis):
    """Distributed detector forward on local band-limited magnitude
    (F, Tloc) with validity mask (Tloc,).  Mirrors detector_apply."""
    basis = jnp.asarray(
        mel_filter_bank(cfg.sample_rate, cfg.n_fft, cfg.n_mels), dtype=mag.dtype
    )
    x = jnp.matmul(basis, mag, precision=prec) * mask
    x = _masked_instance_norm(x, mask, axis)
    x = _masked_global_standardize(x, mask, axis)

    # AvgPool(2,2): Tloc is even by construction, pairs never cross shards
    t2 = x.shape[-1] // 2
    x = jnp.mean(x.reshape(x.shape[0], t2, 2), axis=-1)
    maskp = mask.reshape(t2, 2).prod(axis=-1)

    act = _block_activation(cfg.activation)
    for i in range(cfg.num_blocks + 1):
        w, b = params[f"conv{i}_w"], params[f"conv{i}_b"]
        x = jnp.matmul(w, x, precision=prec) + b[:, None]
        if cfg.norm_layer == "instance":
            x = _masked_instance_norm(x, maskp, axis)
        x = act(x) * maskp

    n = _psum(jnp.sum(maskp), axis)
    pooled = _psum(jnp.sum(x * maskp, axis=-1), axis) / n
    out = pooled[0::2] - pooled[1::2]
    return _final_activation(cfg.final_activation)(out)


def streaming_detect_values(
    params: DetectorParams,
    audio: jnp.ndarray,
    cfg: AwareConfig,
    mesh: Mesh,
    axis: str = "seq",
) -> jnp.ndarray:
    """Long-form detection sharded over ``axis``; returns (output_length,).

    Equivalent to ``detect_values`` on the whole clip, but the clip never
    needs to fit one device: per-chip memory is O(L / n_dev).
    """
    net = cfg.detection_net
    n_fft, hop = cfg.frame_length, cfg.hop_length
    n_dev = mesh.shape[axis]
    window = jnp.asarray(get_window(cfg.window, cfg.win_length))
    lo, hi = in_band_bins(net.sample_rate, n_fft, cfg.embedding_bands)
    prec = _precision(cfg.matmul_precision)
    halo_len = n_fft - hop

    x = jnp.asarray(audio, jnp.float32)
    L = x.shape[-1]
    T = L // hop + 1
    t_loc = -(-T // n_dev)
    t_loc += t_loc % 2  # even, so AvgPool pairs stay shard-local
    seg = t_loc * hop

    # peak-normalize (service preprocessing), then center-pad and extend
    x = x / (jnp.max(jnp.abs(x)) + 1e-8)
    xp = jnp.pad(x, (n_fft // 2, n_fft // 2), mode="reflect")
    need = n_dev * seg + halo_len
    xp = jnp.pad(xp, (0, need - xp.shape[-1]))
    main, tail = xp[: n_dev * seg], xp[n_dev * seg :]

    frame_idx = np.arange(t_loc)[:, None] * hop + np.arange(n_fft)[None, :]

    def shard_fn(p, seg_x, tail_x):
        d = jax.lax.axis_index(axis)
        # halo: first halo_len samples of the right neighbor's segment;
        # the last device takes the replicated global tail instead
        halo = jax.lax.ppermute(
            seg_x[:halo_len], axis, [(i, i - 1) for i in range(1, n_dev)]
        )
        halo = jnp.where(d == n_dev - 1, tail_x, halo)
        ext = jnp.concatenate([seg_x, halo])
        frames = ext[frame_idx] * window
        mag = jnp.abs(jnp.fft.rfft(frames, axis=-1)).T  # (F, Tloc)
        # zero out-of-band bins (detection preprocessing)
        t = mag.shape[-1]
        mag = jnp.concatenate(
            [
                jnp.zeros((lo, t), mag.dtype),
                mag[lo:hi],
                jnp.zeros((mag.shape[0] - hi, t), mag.dtype),
            ]
        )
        g = d * t_loc + jnp.arange(t_loc)
        mask = (g < T).astype(mag.dtype)
        return _sp_forward(p, mag, mask, net, prec, axis)

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=P(),
        check_rep=False,
    )
    return jax.jit(fn)(params, main, tail)
