"""Data-parallel scale-out of the embed/detect batch paths.

The per-clip adversarial solver is embarrassingly parallel, so data
parallelism is pure sharding annotation: params replicate, the clip batch
shards over the ``data`` mesh axis, and XLA compiles the vmapped solver
with zero inter-chip communication in the hot loop.  Collectives only
appear if a reduction over the batch is requested (e.g. mean loss).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aware_tpu.config import AwareConfig
from aware_tpu.embed.solver import EmbedResult, embed_batch
from aware_tpu.models.detector import DetectorParams, detect_values


def sharded_embed_batch(
    params: DetectorParams,
    audios: jnp.ndarray,
    watermarks: jnp.ndarray,
    cfg: AwareConfig,
    mesh: Mesh,
    axis: str = "data",
) -> EmbedResult:
    """Batched embed with the batch axis sharded over ``axis``.

    ``audios``: (B, L); B must divide by the axis size.  Params replicate.
    """
    if audios.shape[0] % mesh.shape[axis]:
        raise ValueError(
            f"batch {audios.shape[0]} not divisible by mesh axis "
            f"'{axis}' size {mesh.shape[axis]}"
        )
    data_sharding = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())
    params = jax.device_put(params, replicated)
    audios = jax.device_put(jnp.asarray(audios, jnp.float32), data_sharding)
    watermarks = jax.device_put(
        jnp.asarray(watermarks, jnp.float32), data_sharding
    )
    fn = jax.jit(
        embed_batch,
        static_argnames=("cfg",),
        out_shardings=EmbedResult(
            audio=data_sharding,
            best_loss=data_sharding,
            final_loss=data_sharding,
            coeffs=data_sharding,
        ),
    )
    return fn(params, audios, watermarks, cfg)


def sharded_detect_batch(
    params: DetectorParams,
    audios: jnp.ndarray,
    cfg: AwareConfig,
    mesh: Mesh,
    axis: str = "data",
) -> jnp.ndarray:
    """Batched detection values (B, n_bits), batch sharded over ``axis``."""
    data_sharding = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())
    params = jax.device_put(params, replicated)
    audios = jax.device_put(jnp.asarray(audios, jnp.float32), data_sharding)

    def run(p, a):
        return jax.vmap(
            lambda clip: detect_values(
                p,
                clip,
                cfg.detection_net,
                hop_length=cfg.hop_length,
                window=cfg.window,
                win_length=cfg.win_length,
                embedding_bands=cfg.embedding_bands,
                matmul_precision=cfg.matmul_precision,
            )
        )(a)

    return jax.jit(run, out_shardings=data_sharding)(params, audios)
