"""Scheduler state machines vs torch.optim.lr_scheduler."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from aware_tpu.embed.schedulers import get_scheduler


def _run_torch_plateau(losses, **kw):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1.0)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, **kw)
    lrs = []
    for l in losses:
        lrs.append(opt.param_groups[0]["lr"])  # lr used this step
        sched.step(l)
    return lrs


def _run_ours(name, losses, base_lr=1.0, **kw):
    sched = get_scheduler(name, **kw)
    s = sched.init(base_lr)
    lrs = []
    for l in losses:
        lrs.append(float(s["lr"]))
        s = sched.step(s, jnp.float32(l))
    return lrs


def test_plateau_matches_torch(rng):
    losses = list(np.abs(rng.standard_normal(200)).astype(np.float32))
    kw = dict(factor=0.5, patience=5)
    np.testing.assert_allclose(
        _run_ours("reduce_lr_on_plateau", losses, **kw),
        _run_torch_plateau(losses, **kw),
        rtol=1e-6,
    )


def test_plateau_default_card_never_decays(rng):
    """patience=500 > 400 iterations: reference quirk — LR constant."""
    losses = list(np.linspace(1.0, 0.9, 400))
    lrs = _run_ours(
        "reduce_lr_on_plateau", losses, base_lr=0.1, factor=0.9, patience=500
    )
    assert all(abs(l - np.float32(0.1)) < 1e-9 for l in lrs)


@pytest.mark.parametrize(
    "name,kw,torch_ctor",
    [
        ("step", dict(step_size=7, gamma=0.5), lambda o: torch.optim.lr_scheduler.StepLR(o, step_size=7, gamma=0.5)),
        ("multi_step", dict(milestones=[5, 12, 30], gamma=0.3), lambda o: torch.optim.lr_scheduler.MultiStepLR(o, milestones=[5, 12, 30], gamma=0.3)),
        ("exponential", dict(gamma=0.95), lambda o: torch.optim.lr_scheduler.ExponentialLR(o, gamma=0.95)),
        ("cosine_annealing", dict(T_max=40), lambda o: torch.optim.lr_scheduler.CosineAnnealingLR(o, T_max=40)),
    ],
)
def test_function_schedules_match_torch(name, kw, torch_ctor):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.1)
    sched = torch_ctor(opt)
    torch_lrs = []
    for _ in range(50):
        torch_lrs.append(opt.param_groups[0]["lr"])
        sched.step()
    ours = _run_ours(name, [0.0] * 50, base_lr=0.1, **kw)
    np.testing.assert_allclose(ours, torch_lrs, rtol=1e-5, atol=1e-8)


def test_warm_restarts_matches_torch():
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1.0)
    ts = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(opt, T_0=10)
    torch_lrs = []
    for _ in range(25):
        torch_lrs.append(opt.param_groups[0]["lr"])
        ts.step()
    ours = _run_ours(
        "cosine_annealing_warm_restarts", [0.0] * 25, base_lr=1.0, T_0=10
    )
    np.testing.assert_allclose(ours, torch_lrs, rtol=1e-5, atol=1e-7)


def test_unknown_scheduler_raises():
    with pytest.raises(ValueError):
        get_scheduler("nope")
