"""Adversarial training loop tests (amortized embedder, BASELINE config 4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aware_tpu.config import AwareConfig
from aware_tpu.eval import synthesize_speech_clip
from aware_tpu.models import detect_values, init_params
from aware_tpu.train import (
    AmortizedEmbedderConfig,
    TrainConfig,
    amortized_embed,
    init_train_state,
    restore_checkpoint,
    save_checkpoint,
    train_amortized_embedder,
)
from aware_tpu.train.adversarial import make_train_step


@pytest.fixture(scope="module")
def cfg():
    return AwareConfig()


@pytest.fixture(scope="module")
def d_params(cfg):
    return init_params(cfg.detection_net)


def _sampler(batch, length=16000):
    clips = np.stack(
        [synthesize_speech_clip(s, seconds=length / 16000) for s in range(batch)]
    )

    def sample(step):
        return np.roll(clips, step * 17, axis=1)

    return sample


def test_train_step_runs_and_updates(cfg, d_params):
    tcfg = TrainConfig(batch_size=2, embedder=AmortizedEmbedderConfig(hidden=(64,)))
    state = init_train_state(cfg, tcfg, d_params)
    step = jax.jit(make_train_step(cfg, tcfg))
    audios = jnp.asarray(_sampler(2)(0))
    patterns = jnp.asarray((np.random.default_rng(0).integers(0, 2, (2, 20)) * 2 - 1), jnp.float32)
    w_before = np.asarray(state.e_params["w0"]).copy()
    state2, metrics = step(state, audios, patterns, jax.random.PRNGKey(0))
    assert np.isfinite(metrics["loss"])
    assert int(state2.step) == 1
    assert not np.array_equal(np.asarray(state2.e_params["w0"]), w_before)
    # frozen detector untouched by default
    np.testing.assert_array_equal(
        np.asarray(state2.d_params["conv0_w"]), np.asarray(d_params["conv0_w"])
    )


@pytest.mark.slow
def test_unet_train_step_runs_and_updates(cfg, d_params):
    """The U-Net amortized embedder (arch="unet") trains through the same
    adversarial step; odd clip lengths survive the down/upsample ladder."""
    tcfg = TrainConfig(
        batch_size=2,
        embedder=AmortizedEmbedderConfig(
            arch="unet", unet_channels=(32, 64)
        ),
    )
    state = init_train_state(cfg, tcfg, d_params)
    assert "u_stem_w" in state.e_params
    step = jax.jit(make_train_step(cfg, tcfg))
    audios = jnp.asarray(_sampler(2, length=16000 + 256)(0))  # odd T=64
    patterns = jnp.asarray(
        (np.random.default_rng(0).integers(0, 2, (2, 20)) * 2 - 1),
        jnp.float32,
    )
    w_before = np.asarray(state.e_params["u_stem_w"]).copy()
    state2, metrics = step(state, audios, patterns, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert not np.array_equal(
        np.asarray(state2.e_params["u_stem_w"]), w_before
    )


def test_unet_apply_respects_box(cfg, d_params):
    """U-Net one-shot output stays inside the solver's tolerance box and
    nonnegative (same contract as the mlp; fast.py depends on it)."""
    from aware_tpu.config import in_band_bins
    from aware_tpu.train.adversarial import (
        embedder_apply,
        init_embedder_params,
    )

    lo, hi = in_band_bins(16000, 1024, cfg.embedding_bands)
    ecfg = AmortizedEmbedderConfig(arch="unet", unet_channels=(32, 64))
    e = init_embedder_params(ecfg, hi - lo, 20)
    rng = np.random.default_rng(0)
    band = jnp.asarray(np.abs(rng.standard_normal((hi - lo, 101))), jnp.float32)
    pat = jnp.asarray((rng.integers(0, 2, 20) * 2 - 1), jnp.float32)
    out = np.asarray(embedder_apply(e, band, pat, cfg.tolerance_db))
    assert out.shape == band.shape
    delta = band * (10 ** (-cfg.tolerance_db / 20))
    assert np.all(out >= 0)
    assert np.all(out <= np.asarray(band + delta) + 1e-6)
    assert np.all(out >= np.maximum(np.asarray(band - delta), 0.0) - 1e-6)


def test_training_reduces_loss(cfg, d_params):
    tcfg = TrainConfig(
        batch_size=4, steps=40, learning_rate=1e-3,
        embedder=AmortizedEmbedderConfig(hidden=(64,)),
        lambda_percept=0.1,
    )
    state, history = train_amortized_embedder(
        cfg, tcfg, d_params, _sampler(4), seed=0
    )
    first = np.mean([h["soft_ber"] for h in history[:5]])
    last = np.mean([h["soft_ber"] for h in history[-5:]])
    assert last < first, (first, last)


def test_margin_loss_trains_and_targets_weak_bits(cfg, d_params):
    """det_loss="margin" (round-4 recipe for the weak-mark U-Net failure):
    the step runs, the loss is a squared hinge (zero once every agreement
    clears margin_target), and training reduces soft BER."""
    tcfg = TrainConfig(
        batch_size=4, steps=40, learning_rate=1e-3,
        embedder=AmortizedEmbedderConfig(hidden=(64,)),
        lambda_percept=0.1, det_loss="margin", margin_target=0.5,
    )
    state, history = train_amortized_embedder(
        cfg, tcfg, d_params, _sampler(4), seed=0
    )
    assert all(np.isfinite(h["loss"]) for h in history)
    first = np.mean([h["soft_ber"] for h in history[:5]])
    last = np.mean([h["soft_ber"] for h in history[-5:]])
    assert last < first, (first, last)


def test_margin_objective_shape():
    """The margin objective itself: zero beyond the margin, quadratic
    below, gradient nonzero on weak-but-correct bits (unlike
    push_extremes, whose |pred| bonus is sign-agnostic)."""
    from aware_tpu.train.adversarial import _clip_loss  # noqa: F401

    margin = 0.5
    pattern = jnp.asarray([1.0, -1.0, 1.0, -1.0])

    def obj(pred):
        a = pred * pattern
        return jnp.mean(jnp.square(jax.nn.relu(margin - a)))

    strong = pattern * 0.9          # all agreements 0.9 > margin
    assert float(obj(strong)) == 0.0
    weak = pattern * 0.1            # correct but weak: agreement 0.1
    assert float(obj(weak)) > 0.0
    g = jax.grad(obj)(weak)
    # gradient pushes each weak bit toward its target sign
    assert np.all(np.sign(np.asarray(g)) == -np.asarray(pattern))


def test_amortized_embed_contract(cfg, d_params):
    tcfg = TrainConfig(batch_size=2, embedder=AmortizedEmbedderConfig(hidden=(32,)))
    state = init_train_state(cfg, tcfg, d_params)
    clip = synthesize_speech_clip(0)
    pattern = (np.arange(20) % 2 * 2 - 1).astype(np.float32)
    out = amortized_embed(state, d_params, clip, pattern, cfg)
    assert out.shape == ((len(clip) // 256) * 256,)
    assert np.max(np.abs(out)) <= 1.0 + 1e-5
    # box constraint: in-band magnitudes moved at most ~tolerance_db
    from aware_tpu.ops.stft import magphase, peak_normalize, stft

    m0, _ = magphase(stft(peak_normalize(jnp.asarray(clip)), 1024, 256))
    m1, _ = magphase(stft(peak_normalize(jnp.asarray(out)), 1024, 256))
    # (loose check — the ISTFT/STFT round trip redistributes energy)
    assert float(jnp.mean(jnp.abs(m1[32:257] - m0[32:257, : m1.shape[1]]))) < 0.5


def test_phase_conditioned_train_step(cfg, d_params):
    """Phase-conditioned net trains through the adversarial step, and
    embedder_apply auto-detects conditioning from the bundle shape."""
    from aware_tpu.train.adversarial import embedder_apply

    tcfg = TrainConfig(
        batch_size=2,
        embedder=AmortizedEmbedderConfig(hidden=(64,), phase_conditioned=True),
    )
    state = init_train_state(cfg, tcfg, d_params)
    nb = 225
    assert state.e_params["w0"].shape[1] == 3 * nb + 20
    audios = jnp.asarray(_sampler(2)(0))
    patterns = jnp.asarray(
        (np.random.default_rng(0).integers(0, 2, (2, 20)) * 2 - 1), jnp.float32
    )
    step = jax.jit(make_train_step(cfg, tcfg))
    state2, metrics = step(state, audios, patterns, jax.random.PRNGKey(0))
    assert np.isfinite(metrics["loss"])

    band = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (nb, 30)))
    phase = jax.random.uniform(jax.random.PRNGKey(2), (nb, 30), minval=-3, maxval=3)
    pat = jnp.asarray(patterns[0])
    out = embedder_apply(state.e_params, band, pat, cfg.tolerance_db, band_phase=phase)
    delta = band * (10.0 ** (-cfg.tolerance_db / 20.0))
    assert np.all(np.asarray(out) >= 0)
    assert np.all(np.asarray(jnp.abs(out - band)) <= np.asarray(delta) + 1e-6)
    # and a phase-conditioned bundle without phase input must raise
    with pytest.raises(ValueError):
        embedder_apply(state.e_params, band, pat, cfg.tolerance_db)
    # the output actually depends on phase (not a dead input)
    out2 = embedder_apply(
        state2.e_params, band, pat, cfg.tolerance_db, band_phase=phase
    )
    out3 = embedder_apply(
        state2.e_params, band, pat, cfg.tolerance_db, band_phase=phase + 1.0
    )
    assert not np.allclose(np.asarray(out2), np.asarray(out3))


def test_distill_step_visible(cfg, d_params):
    """Post-roundtrip distillation step: runs, finite, updates params."""
    from aware_tpu.train.distill import (
        distill_optimizer,
        make_distill_step_visible,
    )

    tcfg = TrainConfig(
        batch_size=2,
        embedder=AmortizedEmbedderConfig(hidden=(64,), phase_conditioned=True),
    )
    state = init_train_state(cfg, tcfg, d_params)
    state = state._replace(opt_state=distill_optimizer(tcfg).init(state.e_params))
    step = jax.jit(make_distill_step_visible(cfg, tcfg))
    clips = jnp.asarray(_sampler(2)(0))
    patterns = jnp.asarray(
        (np.random.default_rng(0).integers(0, 2, (2, 20)) * 2 - 1), jnp.float32
    )
    # fake solver targets: the clean band magnitudes (regression fixed point)
    from aware_tpu.config import in_band_bins
    from aware_tpu.ops.stft import magphase, peak_normalize, stft

    lo, hi = in_band_bins(16000, cfg.frame_length, cfg.embedding_bands)
    mags, _ = jax.vmap(
        lambda a: magphase(stft(peak_normalize(a), cfg.frame_length, cfg.hop_length))
    )(clips)
    targets = mags[:, lo:hi]
    w_before = np.asarray(state.e_params["w0"]).copy()
    state2, metrics = step(state, clips, patterns, targets)
    assert np.isfinite(metrics["loss"]) and np.isfinite(metrics["reg"])
    assert not np.array_equal(np.asarray(state2.e_params["w0"]), w_before)


def test_checkpoint_roundtrip(cfg, d_params, tmp_path):
    tcfg = TrainConfig(batch_size=2, embedder=AmortizedEmbedderConfig(hidden=(32,)))
    state = init_train_state(cfg, tcfg, d_params)
    save_checkpoint(tmp_path, state)
    restored = restore_checkpoint(tmp_path)
    assert int(restored.step) == 0
    np.testing.assert_allclose(
        np.asarray(restored.e_params["w0"]), np.asarray(state.e_params["w0"])
    )


@pytest.mark.multichip
def test_train_step_sharded(cfg, d_params):
    from aware_tpu.parallel import get_mesh

    mesh = get_mesh(("data",))
    tcfg = TrainConfig(batch_size=8, steps=2, embedder=AmortizedEmbedderConfig(hidden=(32,)))
    state, history = train_amortized_embedder(
        cfg, tcfg, d_params, _sampler(8, 8000), seed=0, mesh=mesh
    )
    assert len(history) == 2
    assert np.isfinite(history[-1]["loss"])
