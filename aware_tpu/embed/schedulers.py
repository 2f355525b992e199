"""Learning-rate schedulers as scan-carried pure state machines.

Mirrors the reference registry (reference: src/AWARE/embedding/schedulers.py:3-16).
Each scheduler is::

    init(base_lr)                -> state     (state["lr"] is read pre-step)
    step(state, loss)            -> state     (called after each iteration,
                                               matching the reference's
                                               ``scheduler.step(loss)`` at
                                               multibit_embedder.py:113)

The default card uses reduce_lr_on_plateau(factor=0.9, patience=500) over
400 iterations — patience exceeds the horizon so the LR never decays
(a reference quirk we preserve by faithfully implementing the real state
machine rather than special-casing it).
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple

import jax.numpy as jnp


class Scheduler(NamedTuple):
    init: Callable[[float], dict]
    step: Callable[[dict, jnp.ndarray], dict]


def reduce_lr_on_plateau(
    factor: float = 0.1,
    patience: int = 10,
    threshold: float = 1e-4,
    threshold_mode: str = "rel",
    cooldown: int = 0,
    min_lr: float = 0.0,
    eps: float = 1e-8,
    mode: str = "min",
) -> Scheduler:
    """torch.optim.lr_scheduler.ReduceLROnPlateau (mode='min')."""
    if mode != "min":
        raise ValueError("only mode='min' is used by this framework")

    def init(base_lr: float) -> dict:
        return {
            "lr": jnp.float32(base_lr),
            "best": jnp.float32(jnp.inf),
            "num_bad": jnp.float32(0.0),
            "cooldown": jnp.float32(0.0),
        }

    def step(s: dict, loss: jnp.ndarray) -> dict:
        if threshold_mode == "rel":
            is_better = loss < s["best"] * (1.0 - threshold)
        else:
            is_better = loss < s["best"] - threshold
        best = jnp.where(is_better, loss, s["best"])
        num_bad = jnp.where(is_better, 0.0, s["num_bad"] + 1.0)
        in_cooldown = s["cooldown"] > 0.0
        cd = jnp.where(in_cooldown, s["cooldown"] - 1.0, 0.0)
        num_bad = jnp.where(in_cooldown, 0.0, num_bad)
        reduce = num_bad > patience
        new_lr = jnp.maximum(s["lr"] * factor, min_lr)
        new_lr = jnp.where(s["lr"] - new_lr > eps, new_lr, s["lr"])
        lr = jnp.where(reduce, new_lr, s["lr"])
        cd = jnp.where(reduce, float(cooldown), cd)
        num_bad = jnp.where(reduce, 0.0, num_bad)
        return {"lr": lr, "best": best, "num_bad": num_bad, "cooldown": cd}

    return Scheduler(init, step)


def _lr_lambda_scheduler(fn: Callable[[jnp.ndarray, float], jnp.ndarray]) -> Scheduler:
    """Stateless lr(t) schedules; ``t`` counts completed ``step()`` calls,
    matching torch's last_epoch semantics (lr for epoch t is set by the t-th
    step)."""

    def init(base_lr: float) -> dict:
        return {
            "lr": jnp.float32(base_lr),
            "t": jnp.float32(0.0),
            "base": jnp.float32(base_lr),
        }

    def step(s: dict, loss: jnp.ndarray) -> dict:
        t = s["t"] + 1.0
        return {"lr": fn(t, s["base"]), "t": t, "base": s["base"]}

    return Scheduler(init, step)


def step_lr(step_size: int, gamma: float = 0.1) -> Scheduler:
    return _lr_lambda_scheduler(
        lambda t, base: base * gamma ** jnp.floor(t / step_size)
    )


def multi_step_lr(milestones: list[int], gamma: float = 0.1) -> Scheduler:
    ms = jnp.asarray(sorted(milestones), dtype=jnp.float32)
    return _lr_lambda_scheduler(
        lambda t, base: base * gamma ** jnp.sum(t >= ms)
    )


def exponential_lr(gamma: float) -> Scheduler:
    return _lr_lambda_scheduler(lambda t, base: base * gamma**t)


def cosine_annealing_lr(T_max: int, eta_min: float = 0.0) -> Scheduler:
    return _lr_lambda_scheduler(
        lambda t, base: eta_min
        + (base - eta_min) * (1.0 + jnp.cos(jnp.pi * t / T_max)) / 2.0
    )


def cosine_annealing_warm_restarts(
    T_0: int, T_mult: int = 1, eta_min: float = 0.0
) -> Scheduler:
    if T_mult == 1:
        def fn(t, base):
            t_cur = jnp.mod(t, T_0)
            return eta_min + (base - eta_min) * (1.0 + jnp.cos(jnp.pi * t_cur / T_0)) / 2.0
    else:
        # closed form for the geometric restart schedule
        log_tm = math.log(T_mult)

        def fn(t, base):
            n = jnp.floor(jnp.log(t / T_0 * (T_mult - 1.0) + 1.0) / log_tm)
            t_start = T_0 * (T_mult**n - 1.0) / (T_mult - 1.0)
            t_i = T_0 * T_mult**n
            t_cur = t - t_start
            return eta_min + (base - eta_min) * (1.0 + jnp.cos(jnp.pi * t_cur / t_i)) / 2.0

    return _lr_lambda_scheduler(fn)


def cyclic_lr(
    base_lr: float,
    max_lr: float,
    step_size_up: int = 2000,
    step_size_down: int | None = None,
    mode: str = "triangular",
    gamma: float = 1.0,
) -> Scheduler:
    up = float(step_size_up)
    down = float(step_size_down if step_size_down is not None else step_size_up)
    total = up + down

    def fn(t, _base):
        cycle = jnp.floor(1.0 + t / total)
        x = t - (cycle - 1.0) * total
        frac = jnp.where(x <= up, x / up, 1.0 - (x - up) / down)
        scale = {
            "triangular": 1.0,
            "triangular2": 2.0 ** (1.0 - cycle),
            "exp_range": gamma**t,
        }[mode]
        return base_lr + (max_lr - base_lr) * frac * scale

    return _lr_lambda_scheduler(fn)


SCHEDULER_REGISTRY: dict[str, Callable[..., Scheduler]] = {
    "reduce_lr_on_plateau": reduce_lr_on_plateau,
    "cosine_annealing": cosine_annealing_lr,
    "cosine_annealing_warm_restarts": cosine_annealing_warm_restarts,
    "step": step_lr,
    "multi_step": multi_step_lr,
    "exponential": exponential_lr,
    "cyclic": cyclic_lr,
}


def get_scheduler(name: str, **kwargs: Any) -> Scheduler:
    """(reference: embedding/schedulers.py:14-16)."""
    if name not in SCHEDULER_REGISTRY:
        raise ValueError(f"Scheduler {name} not found")
    return SCHEDULER_REGISTRY[name](**kwargs)
