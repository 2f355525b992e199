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


def test_lbfgs_resolves_to_host_marker():
    from aware_tpu.embed.optim import LBFGSMarker

    assert isinstance(get_optimizer("lbfgs"), LBFGSMarker)


def test_lbfgs_trajectory_matches_torch():
    """Our host L-BFGS vs torch.optim.LBFGS(max_iter=1) driven by a closure
    once per step — the exact program our solver iteration emulates (the
    reference's own loop would crash here: LBFGS.step requires a closure)."""
    from aware_tpu.embed.lbfgs import LBFGSMemory, lbfgs_update

    p0 = np.array([0.3, -0.5, 0.8], np.float32)
    lr = 0.5

    tp = torch.tensor(p0, requires_grad=True)
    topt = torch.optim.LBFGS([tp], lr=lr, max_iter=1, history_size=10)

    def closure():
        topt.zero_grad()
        loss = (tp[0] - 1.3) ** 2 + 3.0 * (tp[1] - tp[0] ** 2) ** 2 + 0.1 * tp[2] ** 2
        loss.backward()
        return loss

    torch_traj = []
    for _ in range(30):
        topt.step(closure)
        torch_traj.append(tp.detach().numpy().copy())

    def jloss(p):
        return (p[0] - 1.3) ** 2 + 3.0 * (p[1] - p[0] ** 2) ** 2 + 0.1 * p[2] ** 2

    mem = LBFGSMemory(history_size=10)
    p = p0.copy()
    for t in range(30):
        g = np.asarray(jax.grad(jloss)(jnp.asarray(p)), np.float32)
        p = lbfgs_update(mem, p, g, lr)
        np.testing.assert_allclose(
            p, torch_traj[t], atol=1e-4, rtol=1e-3,
            err_msg=f"lbfgs diverged at step {t}",
        )


def test_lbfgs_embed_smoke():
    """End-to-end: an lbfgs-card embed converges and round-trips 0 BER."""
    from aware_tpu.config import AwareConfig
    from aware_tpu.models.detector import detect_values, init_params
    from aware_tpu.embed.solver import embed_lbfgs

    cfg = AwareConfig().replace(
        num_iterations=60, optimizer_name="lbfgs", optimizer_params={"lr": 1.0}
    )
    params = init_params(cfg.detection_net)
    rng = np.random.default_rng(7)
    audio = rng.standard_normal(16000 * 2).astype(np.float32)
    wm = np.where(rng.standard_normal(20) > 0, 1.0, -1.0).astype(np.float32)
    res = embed_lbfgs(
        params, jnp.asarray(audio), jnp.asarray(wm), cfg
    )
    assert float(res.best_loss) < float(
        jnp.inf
    ) and np.isfinite(float(res.final_loss))
    values = np.asarray(
        detect_values(
            params,
            res.audio,
            cfg.detection_net,
            hop_length=cfg.hop_length,
            window=cfg.window,
            win_length=cfg.win_length,
            embedding_bands=cfg.embedding_bands,
            matmul_precision=cfg.matmul_precision,
        )
    )
    ber = float(np.mean((values > 0) != (wm > 0)))
    assert ber == 0.0


def test_unknown_raises():
    with pytest.raises(ValueError):
        get_optimizer("adamzzz")
