"""Optimizer update rules vs torch.optim trajectories.

The embed outcome depends on the exact optimizer trajectory, so each
optimizer is checked step-for-step against its torch counterpart on a
rosenbrock-ish problem with a decaying lr, for 30 steps.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from aware_tpu.embed.optim import get_optimizer

TORCH_CTOR = {
    "adam": torch.optim.Adam,
    "nadam": torch.optim.NAdam,
    "sgd": torch.optim.SGD,
    "rmsprop": torch.optim.RMSprop,
    "adagrad": torch.optim.Adagrad,
    "adadelta": torch.optim.Adadelta,
    "adamax": torch.optim.Adamax,
    "adamw": torch.optim.AdamW,
}

EXTRA_KW = {
    "sgd": {"momentum": 0.9},
}


def _loss_np(p):
    return (p[0] - 1.3) ** 2 + 3.0 * (p[1] - p[0] ** 2) ** 2 + 0.1 * p[2] ** 2


@pytest.mark.parametrize("name", sorted(TORCH_CTOR))
def test_trajectory_matches_torch(name):
    p0 = np.array([0.3, -0.5, 0.8], np.float32)
    lr = 0.05
    kw = EXTRA_KW.get(name, {})

    # torch trajectory
    tp = torch.tensor(p0, requires_grad=True)
    topt = TORCH_CTOR[name]([tp], lr=lr, **kw)
    torch_traj = []
    for _ in range(30):
        topt.zero_grad()
        loss = (tp[0] - 1.3) ** 2 + 3.0 * (tp[1] - tp[0] ** 2) ** 2 + 0.1 * tp[2] ** 2
        loss.backward()
        topt.step()
        torch_traj.append(tp.detach().numpy().copy())

    # ours
    def jloss(p):
        return (p[0] - 1.3) ** 2 + 3.0 * (p[1] - p[0] ** 2) ** 2 + 0.1 * p[2] ** 2

    opt = get_optimizer(name, **kw)
    p = jnp.asarray(p0)
    s = opt.init(p)
    for t in range(30):
        g = jax.grad(jloss)(p)
        p, s = opt.update(g, s, p, jnp.float32(lr))
        np.testing.assert_allclose(
            # fp32 trajectories accumulate ULP-level divergence (torch keeps
            # some scalar state in f64 host floats); a wrong update formula
            # diverges by >1e-3 within a couple of steps.
            np.asarray(p), torch_traj[t], atol=5e-5, rtol=2e-4,
            err_msg=f"{name} diverged at step {t}",
        )


def test_nadam_default_lr_point_one():
    """The framework default: NAdam at lr=0.1 (reference card)."""
    p0 = np.array([2.0, -1.0], np.float32)
    tp = torch.tensor(p0, requires_grad=True)
    topt = torch.optim.NAdam([tp], lr=0.1)
    opt = get_optimizer("nadam")
    p = jnp.asarray(p0)
    s = opt.init(p)
    for t in range(50):
        topt.zero_grad()
        tl = (tp**2).sum()
        tl.backward()
        topt.step()
        g = jax.grad(lambda q: (q**2).sum())(p)
        p, s = opt.update(g, s, p, jnp.float32(0.1))
    np.testing.assert_allclose(np.asarray(p), tp.detach().numpy(), atol=1e-6)


def test_lbfgs_raises():
    with pytest.raises(NotImplementedError):
        get_optimizer("lbfgs")


def test_unknown_raises():
    with pytest.raises(ValueError):
        get_optimizer("adamzzz")
