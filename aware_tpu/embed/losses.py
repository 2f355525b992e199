"""Embedding objective functions.

Pure ``(predicted, target) -> scalar`` functions mirroring the reference
registry (reference: src/AWARE/embedding/losses.py:6-118).  The default is
``push_extremes`` (reference: cards/config.yaml:27).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

LossFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def hinge(predicted: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """mean(max(0, 1 - p*t)) (reference: losses.py:6-14)."""
    return jnp.mean(jnp.maximum(1.0 - predicted * target, 0.0))


def mse(predicted: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((predicted - target) ** 2)


def push_extremes(predicted: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """MSE minus a reward for confident (large-|p|) outputs — the default
    objective (reference: losses.py:28-42)."""
    return mse(predicted, target) - 0.1 * jnp.mean(jnp.abs(predicted))


def push_sigmoid(predicted: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Push-from-0.5 variant for sigmoid readouts (reference: losses.py:45-59)."""
    return mse(predicted, target) - 0.1 * jnp.mean(jnp.abs(predicted - 0.5))


def sign_loss(predicted: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """mean(max(0, -p*t)) — sign agreement only (reference: losses.py:62-70)."""
    return jnp.mean(jnp.maximum(-predicted * target, 0.0))


def bce(predicted: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Binary cross-entropy on probabilities, with torch's log clamp at -100
    (reference: losses.py:73-81 -> F.binary_cross_entropy)."""
    logp = jnp.maximum(jnp.log(predicted), -100.0)
    log1mp = jnp.maximum(jnp.log(1.0 - predicted), -100.0)
    return -jnp.mean(target * logp + (1.0 - target) * log1mp)


def ber_loss(predicted: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Hard sign-mismatch rate — non-differentiable, eval use only
    (reference: losses.py:84-92)."""
    return jnp.mean(
        (jnp.sign(predicted) != jnp.sign(target)).astype(predicted.dtype)
    )


LOSS_REGISTRY: dict[str, LossFn] = {
    "hinge": hinge,
    "mse": mse,
    "push_extremes": push_extremes,
    "push_sigmoid": push_sigmoid,
    "sign": sign_loss,
    "bce": bce,
    "ber": ber_loss,
}


def get_loss_fn(loss_type: str) -> LossFn:
    if loss_type not in LOSS_REGISTRY:
        raise ValueError(
            f"Unknown loss type: {loss_type}. Available: {list(LOSS_REGISTRY)}"
        )
    return LOSS_REGISTRY[loss_type]
