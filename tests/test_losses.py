"""Loss functions vs torch formulas (reference: embedding/losses.py)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from aware_tpu.embed.losses import get_loss_fn


@pytest.fixture()
def pt(rng):
    pred = rng.standard_normal(20).astype(np.float32) * 0.8
    target = (rng.integers(0, 2, 20) * 2 - 1).astype(np.float32)
    return pred, target


def _t(x):
    return torch.from_numpy(np.asarray(x))


def test_hinge(pt):
    p, t = pt
    ref = torch.mean(torch.clamp(1 - _t(p) * _t(t), min=0)).item()
    assert abs(float(get_loss_fn("hinge")(jnp.asarray(p), jnp.asarray(t))) - ref) < 1e-6


def test_mse(pt):
    p, t = pt
    ref = F.mse_loss(_t(p), _t(t)).item()
    assert abs(float(get_loss_fn("mse")(jnp.asarray(p), jnp.asarray(t))) - ref) < 1e-6


def test_push_extremes(pt):
    p, t = pt
    ref = (F.mse_loss(_t(p), _t(t)) - 0.1 * torch.mean(torch.abs(_t(p)))).item()
    got = float(get_loss_fn("push_extremes")(jnp.asarray(p), jnp.asarray(t)))
    assert abs(got - ref) < 1e-6


def test_push_sigmoid(pt):
    p, t = pt
    p = 1 / (1 + np.exp(-p))
    tt = (t > 0).astype(np.float32)
    ref = (F.mse_loss(_t(p), _t(tt)) - 0.1 * torch.mean(torch.abs(_t(p) - 0.5))).item()
    got = float(get_loss_fn("push_sigmoid")(jnp.asarray(p), jnp.asarray(tt)))
    assert abs(got - ref) < 1e-6


def test_sign(pt):
    p, t = pt
    ref = torch.mean(torch.clamp(-_t(p) * _t(t), min=0)).item()
    assert abs(float(get_loss_fn("sign")(jnp.asarray(p), jnp.asarray(t))) - ref) < 1e-6


def test_bce(pt):
    p, t = pt
    probs = 1 / (1 + np.exp(-p))
    tt = (t > 0).astype(np.float32)
    ref = F.binary_cross_entropy(_t(probs), _t(tt)).item()
    got = float(get_loss_fn("bce")(jnp.asarray(probs), jnp.asarray(tt)))
    assert abs(got - ref) < 1e-5


def test_ber(pt):
    p, t = pt
    ref = torch.mean((torch.sign(_t(p)) != torch.sign(_t(t))).float()).item()
    assert abs(float(get_loss_fn("ber")(jnp.asarray(p), jnp.asarray(t))) - ref) < 1e-7


def test_losses_differentiable(pt):
    p, t = pt
    for name in ("hinge", "mse", "push_extremes", "sign"):
        g = jax.grad(lambda x: get_loss_fn(name)(x, jnp.asarray(t)))(jnp.asarray(p))
        assert np.all(np.isfinite(np.asarray(g)))


def test_unknown_raises():
    with pytest.raises(ValueError):
        get_loss_fn("nope")
