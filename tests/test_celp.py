"""Tests for the differentiable CELP-flavored compression view
(aware_tpu/attacks/celp.py) and its solver EOT wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aware_tpu.attacks.celp import MODES, celp_approx, celp_envelope

SR = 16000


@pytest.fixture(scope="module")
def clip(speechlike):
    return jnp.asarray(speechlike)


def test_length_preserving_and_finite(clip):
    for mode in MODES:
        y = celp_approx(clip, SR, mode)
        assert y.shape == clip.shape
        assert bool(jnp.all(jnp.isfinite(y)))


def test_jit_and_grad_finite(clip):
    f = jax.jit(lambda z: celp_approx(z, SR, "nb8k"))
    y = f(clip)
    assert bool(jnp.all(jnp.isfinite(y)))
    g = jax.jit(jax.grad(lambda z: jnp.mean(celp_approx(z, SR, "nb8k") ** 2)))(
        clip
    )
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.linalg.norm(g)) > 0.0


def test_envelope_tracks_ar2_resonance():
    """The LPC-10 envelope of an AR(2) process peaks at its resonance."""
    from aware_tpu.ops.stft import magphase, stft
    from aware_tpu.ops.windows import get_window

    rng = np.random.default_rng(0)
    e = rng.standard_normal(16000).astype(np.float32)
    ar = np.zeros(16000, np.float32)
    r, th = 0.97, 2 * np.pi * 800 / SR
    a1, a2 = 2 * r * np.cos(th), -r * r
    for n in range(2, 16000):
        ar[n] = e[n] + a1 * ar[n - 1] + a2 * ar[n - 2]
    w = get_window("hann", 512)
    mag, _ = magphase(stft(jnp.asarray(ar / np.abs(ar).max()), 512, 256, w))
    env = celp_envelope(mag, 512)
    f_peak = float(jnp.argmax(jnp.mean(env, axis=1))) * SR / 512
    assert abs(f_peak - 800.0) < 100.0


def test_codec_scale_damage(clip):
    """The nb8k view inflicts low-bitrate-codec-scale damage: single-digit
    dB SNR band, destructive but not annihilating."""
    y = np.asarray(celp_approx(clip, SR, "nb8k"))
    x = np.asarray(clip)
    snr = 10 * np.log10(np.mean(x**2) / np.mean((y - x) ** 2))
    assert 3.0 < snr < 25.0, snr


def test_band_limit_kills_high_band(clip):
    y = np.asarray(celp_approx(clip, SR, "nb8k"))
    spec = np.abs(np.fft.rfft(y))
    f = np.fft.rfftfreq(len(y), 1 / SR)
    hi = np.mean(spec[f > 5500])
    mid = np.mean(spec[(f > 800) & (f < 3000)])
    assert hi < 0.05 * mid


def test_solver_accepts_celp_and_ste_cards():
    """Config validation + view wiring: a celp-mode card builds a solver
    problem; bad mode names are rejected."""
    from aware_tpu.config import AwareConfig

    cfg = AwareConfig().replace(
        eot_celp_modes=("nb8k",), eot_mode="cycle", num_iterations=2,
        use_pallas_roundtrip=False, use_pallas_detector=False,
        use_pallas_iteration=False,
    )
    assert cfg.eot_celp_modes == ("nb8k",)
    with pytest.raises(ValueError):
        AwareConfig().replace(eot_celp_modes=("bogus",))
    with pytest.raises(ValueError):
        AwareConfig().replace(eot_ste_codecs=("mp3_0",))


@pytest.mark.slow
def test_celp_eot_embed_runs(speechlike):
    """2-iteration celp-EOT embed end-to-end (compile + numerics)."""
    from aware_tpu.config import AwareConfig
    from aware_tpu.embed import embed_one
    from aware_tpu.models import init_params

    cfg = AwareConfig().replace(
        eot_celp_modes=("nb8k",), eot_mode="cycle", num_iterations=2,
        use_pallas_roundtrip=False, use_pallas_detector=False,
        use_pallas_iteration=False,
    )
    d = {k: jnp.asarray(v) for k, v in init_params(cfg.detection_net).items()}
    pattern = jnp.asarray(np.sign(np.random.default_rng(0).standard_normal(20)),
                          jnp.float32)
    res = embed_one(d, jnp.asarray(speechlike), pattern, cfg)
    assert bool(jnp.all(jnp.isfinite(res.audio)))


@pytest.mark.slow
def test_ste_codec_eot_embed_runs(speechlike):
    """2-iteration straight-through REAL-codec embed (host callback in the
    solver loop; CPU backend)."""
    from aware_tpu.attacks.voice_codecs import gsm_available
    from aware_tpu.config import AwareConfig
    from aware_tpu.embed import embed_one
    from aware_tpu.models import init_params

    if not gsm_available():
        pytest.skip("libgsm missing")
    cfg = AwareConfig().replace(
        eot_ste_codecs=("gsm_fr",), eot_mode="cycle", num_iterations=2,
        use_pallas_roundtrip=False, use_pallas_detector=False,
        use_pallas_iteration=False,
    )
    d = {k: jnp.asarray(v) for k, v in init_params(cfg.detection_net).items()}
    pattern = jnp.asarray(np.sign(np.random.default_rng(0).standard_normal(20)),
                          jnp.float32)
    res = embed_one(d, jnp.asarray(speechlike), pattern, cfg)
    assert bool(jnp.all(jnp.isfinite(res.audio)))
