"""EOT (expectation-over-transforms) robust-embedding tests.

The solver can add differentiable vocoder time-stretch views to its
objective (``AwareConfig.eot_stretch_rates``) so the optimized mark
survives desync edits by construction — a capability the reference solver
lacks (it only ever sees the clean view).  These tests cover the config
plumbing, gradient safety at exactly-zero spectral bins (silence), and a
small end-to-end improvement check.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aware_tpu.config import AwareConfig
from aware_tpu.embed.solver import build_problem, embed_core
from aware_tpu.models import init_params
from aware_tpu.ops.stft import safe_angle

BITS = np.array([1, 0, 1, 1, 0, 0, 1, 0, 1, 1, 0, 1, 0, 0, 1, 1, 1, 0, 0, 1])
WM = (2 * BITS - 1).astype(np.float32)


def test_safe_angle_matches_jnp_angle():
    rng = np.random.default_rng(0)
    re = rng.standard_normal(64).astype(np.float32)
    im = rng.standard_normal(64).astype(np.float32)
    re[::7] = 0.0
    im[::7] = 0.0  # some exact zeros (both parts)
    got = np.asarray(safe_angle(jnp.asarray(re), jnp.asarray(im)))
    want = np.angle(re + 1j * im)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_safe_angle_zero_gradient_at_origin():
    def f(re, im):
        return jnp.sum(safe_angle(re, im))

    g_re, g_im = jax.grad(f, argnums=(0, 1))(
        jnp.zeros(4), jnp.zeros(4)
    )
    assert np.all(np.isfinite(np.asarray(g_re)))
    assert np.all(np.isfinite(np.asarray(g_im)))
    np.testing.assert_allclose(np.asarray(g_re), 0.0)
    np.testing.assert_allclose(np.asarray(g_im), 0.0)


def test_card_parses_eot_fields(tmp_path):
    card = tmp_path / "card.yaml"
    card.write_text(
        "eot_stretch_rates: [0.9, 1.1]\neot_weight: 0.5\n"
    )
    cfg = AwareConfig.from_card(card)
    assert cfg.eot_stretch_rates == (0.9, 1.1)
    assert cfg.eot_weight == 0.5
    hash(cfg)  # must stay usable as a jit static argument


@pytest.mark.parametrize("fast_path", [True, False])
def test_eot_objective_gradient_finite_on_pause_clip(fast_path):
    """A clip with an exact-zero silence region must not NaN-poison the
    EOT objective's gradient (the stretch views differentiate through the
    vocoder's phase, whose naive derivative blows up at zero bins)."""
    cfg = AwareConfig(
        eot_stretch_rates=(1.1,),
        use_matmul_dft=fast_path,
        num_iterations=2,
    )
    params = init_params(cfg.detection_net)
    sr = 16000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 880 * t).astype(np.float32)
    x[: sr // 4] = 0.0  # hard pause
    pb = build_problem(params, jnp.asarray(x), jnp.asarray(WM), cfg)
    loss, g = jax.value_and_grad(pb.objective)(pb.coeffs0)
    assert np.isfinite(float(loss))
    assert np.all(np.isfinite(np.asarray(g)))


def test_eot_cycle_mode_objective(speechlike):
    """"cycle" rotates ONE stretch view per iteration via lax.switch: the
    objective value at iteration i equals base loss + weight * the i-th
    rate's view loss (vs "all" averaging every view)."""
    rates = (0.9, 1.1)
    base = AwareConfig(num_iterations=4)
    cyc = base.replace(eot_stretch_rates=rates, eot_mode="cycle")
    al = base.replace(eot_stretch_rates=rates, eot_mode="all")
    params = init_params(base.detection_net)
    x = jnp.asarray(speechlike)
    wm = jnp.asarray(WM)
    pb_b = build_problem(params, x, wm, base)
    pb_c = build_problem(params, x, wm, cyc)
    pb_a = build_problem(params, x, wm, al)
    c = pb_b.coeffs0
    l_b = float(pb_b.objective(c))
    l0 = float(pb_c.objective(c, jnp.int32(0)))
    l1 = float(pb_c.objective(c, jnp.int32(1)))
    l2 = float(pb_c.objective(c, jnp.int32(2)))
    l_all = float(pb_a.objective(c))
    assert abs(l0 - l2) < 1e-6          # cycle wraps: it=2 -> rate 0
    assert abs(l0 - l1) > 1e-5          # distinct rates, distinct losses
    # "all" is the mean of the per-rate views (after removing base loss)
    np.testing.assert_allclose(
        l_all - l_b, np.mean([l0 - l_b, l1 - l_b]), rtol=1e-4
    )


def test_eot_cycle_embed_runs(speechlike):
    """The scan solver threads the iteration index through lax.switch and
    still solves (clean read exact at a small budget)."""
    from aware_tpu.models import detect_values

    cfg = AwareConfig(
        num_iterations=30,
        eot_stretch_rates=(0.9, 1.0, 1.1),
        eot_mode="cycle",
    )
    params = init_params(cfg.detection_net)
    res = embed_core(params, jnp.asarray(speechlike), jnp.asarray(WM), cfg)
    v = np.asarray(detect_values(params, res.audio))
    assert float(np.mean((v > 0).astype(int) != BITS)) == 0.0


@pytest.mark.slow
def test_eot_embed_improves_stretch_ber(speechlike):
    """EOT-embedded marks read through a vocoder stretch markedly better
    than base embeds at an equal (reduced, CPU-affordable) iteration
    budget; the clean read stays exact."""
    from aware_tpu.attacks.vocoder import time_stretch
    from aware_tpu.models import detect_values

    iters = 60
    base_cfg = AwareConfig(num_iterations=iters)
    eot_cfg = base_cfg.replace(eot_stretch_rates=(0.9, 1.1))
    params = init_params(base_cfg.detection_net)
    x = jnp.asarray(speechlike)
    wm = jnp.asarray(WM)

    def ber_after(audio, rate):
        att = time_stretch(jnp.asarray(audio), rate)
        v = np.asarray(detect_values(params, att))
        return float(np.mean((v > 0).astype(int) != BITS)) * 100

    base = embed_core(params, x, wm, base_cfg)
    eot = embed_core(params, x, wm, eot_cfg)

    v_clean = np.asarray(detect_values(params, eot.audio))
    assert float(np.mean((v_clean > 0).astype(int) != BITS)) == 0.0

    base_ts = np.mean([ber_after(base.audio, r) for r in (0.9, 1.1)])
    eot_ts = np.mean([ber_after(eot.audio, r) for r in (0.9, 1.1)])
    assert eot_ts < base_ts, (eot_ts, base_ts)
    assert eot_ts <= 10.0, eot_ts


def test_card_parses_mp3_eot_and_validates():
    cfg = AwareConfig.from_dict({"eot_mp3_qualities": [9, 11]})
    assert cfg.eot_mp3_qualities == (9, 11)
    hash(cfg)
    with pytest.raises(ValueError, match="eot_mp3_qualities"):
        AwareConfig(eot_mp3_qualities=(12,))


def test_mp3_eot_objective_gradient_finite(speechlike):
    """The lossy-compression view's straight-through quantizer must keep
    the objective's gradient finite (the |c|^0.75 companding has an
    infinite derivative at 0, clamped in mp3_approx)."""
    cfg = AwareConfig(eot_mp3_qualities=(11,), num_iterations=2)
    params = init_params(cfg.detection_net)
    pb = build_problem(
        params, jnp.asarray(speechlike), jnp.asarray(WM), cfg
    )
    loss, g = jax.value_and_grad(pb.objective)(pb.coeffs0)
    assert np.isfinite(float(loss))
    assert np.all(np.isfinite(np.asarray(g)))


def test_mp3_eot_cycle_embed_runs(speechlike):
    """Cycle mode rotating compression views still solves the clean read
    exactly at a small budget."""
    from aware_tpu.models import detect_values

    cfg = AwareConfig(
        num_iterations=30,
        eot_mp3_qualities=(10, 11),
        eot_mode="cycle",
    )
    params = init_params(cfg.detection_net)
    res = embed_core(params, jnp.asarray(speechlike), jnp.asarray(WM), cfg)
    v = np.asarray(detect_values(params, res.audio))
    assert float(np.mean((v > 0).astype(int) != BITS)) == 0.0
