"""Scan-friendly optimizers with torch-exact update rules.

The embed solver runs its optimizer inside ``lax.scan`` with a scheduler-
controlled learning rate, so each optimizer is a pair of pure functions::

    init(params)                          -> state
    update(grad, state, params, lr)       -> (new_params, new_state)

Update formulas follow torch.optim defaults step-for-step (verified against
torch in tests/test_optim.py) because the reference's embed trajectory — and
therefore its output audio — depends on them
(reference: src/AWARE/embedding/optimizers.py:3-20; the default is NAdam
with lr=0.1 per cards/config.yaml:19-21).

``sparse_adam`` aliases dense adam (JAX has no sparse gradients here; the
update rule is identical on dense grads).  ``lbfgs`` resolves to a marker:
its history-based update does not map to a fixed-shape scan, so the solver
dispatches it to a host-driven loop (aware_tpu.embed.lbfgs +
solver.embed_lbfgs) — torch-exact, and strictly more capable than the
reference, whose own lbfgs selection crashes (LBFGS.step requires a
closure; multibit_embedder.py:112 passes none).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax.numpy as jnp


class Optimizer(NamedTuple):
    init: Callable[[jnp.ndarray], Any]
    update: Callable[[jnp.ndarray, Any, jnp.ndarray, jnp.ndarray], tuple]


def _f32(x):
    return jnp.asarray(x, dtype=jnp.float32)


# ---------------------------------------------------------------- NAdam ---

def nadam(
    betas: tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    momentum_decay: float = 4e-3,
) -> Optimizer:
    """torch.optim.NAdam (Dozat's Nesterov Adam with the mu-product
    momentum schedule)."""
    b1, b2 = betas
    psi = momentum_decay

    def init(p):
        return {
            "step": jnp.zeros((), jnp.float32),
            "m": jnp.zeros_like(p),
            "v": jnp.zeros_like(p),
            "mu_prod": jnp.ones((), jnp.float32),
        }

    def update(g, s, p, lr):
        t = s["step"] + 1.0
        if weight_decay:
            g = g + weight_decay * p
        mu_t = b1 * (1.0 - 0.5 * 0.96 ** (t * psi))
        mu_next = b1 * (1.0 - 0.5 * 0.96 ** ((t + 1.0) * psi))
        mu_prod = s["mu_prod"] * mu_t
        mu_prod_next = mu_prod * mu_next
        # lerp-form updates match torch's in-place op ordering ULP-for-ULP
        m = s["m"] + (1.0 - b1) * (g - s["m"])
        v = b2 * s["v"] + (1.0 - b2) * (g * g)
        denom = jnp.sqrt(v / (1.0 - b2**t)) + eps
        p = p - lr * (1.0 - mu_t) / (1.0 - mu_prod) * g / denom
        p = p - lr * mu_next / (1.0 - mu_prod_next) * m / denom
        return p, {"step": t, "m": m, "v": v, "mu_prod": mu_prod}

    return Optimizer(init, update)


# ----------------------------------------------------------------- Adam ---

def adam(
    betas: tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> Optimizer:
    b1, b2 = betas

    def init(p):
        return {
            "step": jnp.zeros((), jnp.float32),
            "m": jnp.zeros_like(p),
            "v": jnp.zeros_like(p),
        }

    def update(g, s, p, lr):
        t = s["step"] + 1.0
        if weight_decay:
            g = g + weight_decay * p
        m = s["m"] + (1.0 - b1) * (g - s["m"])
        v = b2 * s["v"] + (1.0 - b2) * (g * g)
        denom = jnp.sqrt(v) / jnp.sqrt(1.0 - b2**t) + eps
        p = p - (lr / (1.0 - b1**t)) * m / denom
        return p, {"step": t, "m": m, "v": v}

    return Optimizer(init, update)


def adamw(
    betas: tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
) -> Optimizer:
    b1, b2 = betas
    base = adam(betas, eps, 0.0)

    def update(g, s, p, lr):
        p = p * (1.0 - lr * weight_decay)  # decoupled decay
        return base.update(g, s, p, lr)

    return Optimizer(base.init, update)


# ------------------------------------------------------------------ SGD ---

def sgd(
    momentum: float = 0.0,
    dampening: float = 0.0,
    weight_decay: float = 0.0,
    nesterov: bool = False,
) -> Optimizer:
    def init(p):
        return {"buf": jnp.zeros_like(p), "step": jnp.zeros((), jnp.float32)}

    def update(g, s, p, lr):
        t = s["step"] + 1.0
        if weight_decay:
            g = g + weight_decay * p
        if momentum != 0.0:
            # torch seeds the buffer with the raw gradient on step 1.
            buf = jnp.where(
                t == 1.0, g, momentum * s["buf"] + (1.0 - dampening) * g
            )
            d = g + momentum * buf if nesterov else buf
        else:
            buf = s["buf"]
            d = g
        return p - lr * d, {"buf": buf, "step": t}

    return Optimizer(init, update)


# -------------------------------------------------------------- RMSprop ---

def rmsprop(
    alpha: float = 0.99,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    momentum: float = 0.0,
    centered: bool = False,
) -> Optimizer:
    def init(p):
        return {
            "sq": jnp.zeros_like(p),
            "gavg": jnp.zeros_like(p),
            "buf": jnp.zeros_like(p),
        }

    def update(g, s, p, lr):
        if weight_decay:
            g = g + weight_decay * p
        sq = alpha * s["sq"] + (1.0 - alpha) * g * g
        gavg = s["gavg"]
        if centered:
            gavg = alpha * gavg + (1.0 - alpha) * g
            avg = jnp.sqrt(sq - gavg * gavg) + eps
        else:
            avg = jnp.sqrt(sq) + eps
        if momentum > 0.0:
            buf = momentum * s["buf"] + g / avg
            p = p - lr * buf
        else:
            buf = s["buf"]
            p = p - lr * g / avg
        return p, {"sq": sq, "gavg": gavg, "buf": buf}

    return Optimizer(init, update)


# -------------------------------------------------------------- Adagrad ---

def adagrad(
    lr_decay: float = 0.0,
    weight_decay: float = 0.0,
    initial_accumulator_value: float = 0.0,
    eps: float = 1e-10,
) -> Optimizer:
    def init(p):
        return {
            "sum": jnp.full_like(p, initial_accumulator_value),
            "step": jnp.zeros((), jnp.float32),
        }

    def update(g, s, p, lr):
        t = s["step"] + 1.0
        if weight_decay:
            g = g + weight_decay * p
        clr = lr / (1.0 + (t - 1.0) * lr_decay)
        acc = s["sum"] + g * g
        return p - clr * g / (jnp.sqrt(acc) + eps), {"sum": acc, "step": t}

    return Optimizer(init, update)


# ------------------------------------------------------------- Adadelta ---

def adadelta(
    rho: float = 0.9, eps: float = 1e-6, weight_decay: float = 0.0
) -> Optimizer:
    def init(p):
        return {"sq": jnp.zeros_like(p), "acc": jnp.zeros_like(p)}

    def update(g, s, p, lr):
        if weight_decay:
            g = g + weight_decay * p
        sq = rho * s["sq"] + (1.0 - rho) * g * g
        dx = jnp.sqrt(s["acc"] + eps) / jnp.sqrt(sq + eps) * g
        acc = rho * s["acc"] + (1.0 - rho) * dx * dx
        return p - lr * dx, {"sq": sq, "acc": acc}

    return Optimizer(init, update)


# --------------------------------------------------------------- Adamax ---

def adamax(
    betas: tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> Optimizer:
    b1, b2 = betas

    def init(p):
        return {
            "step": jnp.zeros((), jnp.float32),
            "m": jnp.zeros_like(p),
            "u": jnp.zeros_like(p),
        }

    def update(g, s, p, lr):
        t = s["step"] + 1.0
        if weight_decay:
            g = g + weight_decay * p
        m = b1 * s["m"] + (1.0 - b1) * g
        u = jnp.maximum(b2 * s["u"], jnp.abs(g) + eps)
        p = p - (lr / (1.0 - b1**t)) * m / u
        return p, {"step": t, "m": m, "u": u}

    return Optimizer(init, update)


# -------------------------------------------------------------- Registry ---

class LBFGSMarker(NamedTuple):
    """Resolved for name 'lbfgs'; the actual update rule is host-driven
    (aware_tpu/embed/lbfgs.py) because L-BFGS's growing curvature history
    and data-dependent exits don't fit a fixed-shape ``lax.scan``.  The
    solver (embed.solver.embed_lbfgs) and service API dispatch on the
    optimizer *name*, not this object."""

    history_size: int = 100


def lbfgs(history_size: int = 100, **_ignored) -> LBFGSMarker:
    return LBFGSMarker(history_size=history_size)


OPTIMIZER_REGISTRY: dict[str, Callable[..., Optimizer]] = {
    "adam": adam,
    "nadam": nadam,
    "sgd": sgd,
    "rmsprop": rmsprop,
    "adagrad": adagrad,
    "adadelta": adadelta,
    "adamax": adamax,
    "adamw": adamw,
    "sparse_adam": adam,  # dense equivalent; no sparse grads in this stack
    "lbfgs": lbfgs,       # host-loop marker; see LBFGSMarker
}


def get_optimizer(name: str, **kwargs) -> Optimizer:
    """(reference: embedding/optimizers.py:16-20; lr is passed per-step by
    the solver, not baked into the optimizer)."""
    if name not in OPTIMIZER_REGISTRY:
        raise ValueError(f"Optimizer {name} not found")
    kwargs = dict(kwargs)
    kwargs.pop("lr", None)  # lr flows through update(), scheduler-controlled
    return OPTIMIZER_REGISTRY[name](**kwargs)
