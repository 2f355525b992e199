"""End-to-end embed -> detect tests — the minimum viable slice.

Embeds a 20-bit pattern into the speech-like fixture with the full default
card (400 NAdam iterations) and checks the detector recovers every bit, plus
imperceptibility (box constraint respected, SNR sane) and an outcome-level
comparison with the torch oracle embedder.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from aware_tpu.config import AwareConfig
from aware_tpu.embed import embed_batch, embed_one
from aware_tpu.models import detect_values, init_params
from aware_tpu.ops import istft_length


@pytest.fixture(scope="module")
def params():
    return init_params(AwareConfig().detection_net)


@pytest.fixture(scope="module")
def cfg():
    return AwareConfig()


BITS = np.array([1, 0, 1, 1, 0, 0, 1, 0, 1, 1, 0, 1, 0, 0, 1, 1, 1, 0, 0, 1])


def test_embed_detect_roundtrip_zero_ber(params, cfg, speechlike):
    wm = (2 * BITS - 1).astype(np.float32)
    res = embed_one(params, jnp.asarray(speechlike), jnp.asarray(wm), cfg)
    out = np.asarray(res.audio)
    t = len(speechlike) // cfg.hop_length + 1
    assert out.shape == (istft_length(t, cfg.hop_length),)
    assert np.all(np.isfinite(out))
    assert float(res.best_loss) < float(res.final_loss) + 1e-6

    values = np.asarray(detect_values(params, jnp.asarray(out)))
    detected = (values > 0).astype(np.int64)
    ber = np.mean(detected != BITS)
    assert ber == 0.0, f"BER {ber}, values {values}"


def test_embedded_audio_close_to_original(params, cfg, speechlike):
    wm = (2 * BITS - 1).astype(np.float32)
    res = embed_one(params, jnp.asarray(speechlike), jnp.asarray(wm), cfg)
    out = np.asarray(res.audio)
    ref = speechlike[: len(out)]
    # Both are peak-normalized; the watermark perturbs only +/-6 dB per
    # in-band STFT coefficient, so the waveform stays close.
    snr = 10 * np.log10(np.mean(ref**2) / np.mean((out - ref) ** 2))
    assert snr > 15.0, f"SNR {snr:.2f} dB"


def test_embed_batch_matches_single(params, speechlike):
    """vmapped and single-clip embeds are the same program modulo fp32
    reduction order; the chaotic adversarial loop amplifies that to small
    waveform differences, so equivalence is asserted at the outcome level
    (loss and waveform proximity), not bit-exactness."""
    cfg = AwareConfig().replace(num_iterations=8)
    wm = np.stack([(2 * BITS - 1), -(2 * BITS - 1)]).astype(np.float32)
    audios = np.stack([speechlike, np.roll(speechlike, 1000)])
    batch = embed_batch(params, jnp.asarray(audios), jnp.asarray(wm), cfg)
    single0 = embed_one(params, jnp.asarray(audios[0]), jnp.asarray(wm[0]), cfg)
    assert abs(float(batch.best_loss[0]) - float(single0.best_loss)) < 5e-3
    np.testing.assert_allclose(
        np.asarray(batch.audio[0]), np.asarray(single0.audio), atol=5e-2
    )


def test_slab_objective_matches_frames_path(params, speechlike):
    """The slab-decomposed round trip (use_slab_dft, no (T, n_fft) frames
    tensor) is the same objective as the frames formulation to fp
    tolerance — value and gradient."""
    import jax

    from aware_tpu.embed.solver import build_problem

    wm = jnp.asarray((2 * BITS - 1).astype(np.float32))
    clip = jnp.asarray(speechlike)
    base = AwareConfig().replace(matmul_precision="highest")
    outs = {}
    for name, c in (("slab", base), ("frames", base.replace(use_slab_dft=False))):
        assert (c.use_slab_dft, name) in ((True, "slab"), (False, "frames"))
        pb = build_problem(params, clip, wm, c)
        v, g = jax.value_and_grad(pb.objective)(pb.coeffs0)
        outs[name] = (float(v), np.asarray(g))
    assert abs(outs["slab"][0] - outs["frames"][0]) < 1e-5
    scale = np.max(np.abs(outs["frames"][1])) + 1e-30
    assert np.max(np.abs(outs["slab"][1] - outs["frames"][1])) / scale < 1e-3


def test_detect_unwatermarked_is_chance(params, speechlike):
    values = np.asarray(detect_values(params, jnp.asarray(speechlike)))
    detected = (values > 0).astype(np.int64)
    ber = np.mean(detected != BITS)
    assert 0.05 < ber < 0.95  # no spurious perfect detection


@pytest.mark.slow
def test_outcome_parity_with_torch_oracle(params, cfg, speechlike):
    """Outcome-level parity: our embed and the torch-oracle embed both yield
    0 BER under each other's detectors, and the two watermarked signals are
    close (trajectory-level divergence is bounded by the +/-6dB box)."""
    from tests.oracles.torch_ref import OracleDetectorNet, oracle_detect_values, oracle_embed

    net = OracleDetectorNet().eval()
    wm = (2 * BITS - 1).astype(np.float32)
    ours = np.asarray(
        embed_one(params, jnp.asarray(speechlike), jnp.asarray(wm), cfg).audio
    )
    theirs = oracle_embed(net, speechlike, wm.astype(np.float32))
    assert ours.shape == theirs.shape

    # cross-detection
    ref_on_ours = oracle_detect_values(net, ours)
    jax_on_theirs = np.asarray(detect_values(params, jnp.asarray(theirs)))
    assert np.mean(((ref_on_ours > 0).astype(int)) != BITS) == 0.0
    assert np.mean(((jax_on_theirs > 0).astype(int)) != BITS) == 0.0

    # waveform proximity (same box constraint, same objective)
    snr = 10 * np.log10(np.mean(theirs**2) / (np.mean((ours - theirs) ** 2) + 1e-12))
    assert snr > 10.0, f"embed outputs diverged: {snr:.1f} dB"


def test_warm_start_init_coeffs(params, speechlike):
    """Warm-starting the solver from given coefficients clips them into the
    tolerance box and converges at least as well as the cold start."""
    import jax.numpy as jnp
    from aware_tpu.config import in_band_bins
    from aware_tpu.embed.solver import embed_core
    from aware_tpu.ops.stft import magphase, peak_normalize, stft

    cfg = AwareConfig().replace(num_iterations=20)
    wm = jnp.asarray((2 * BITS - 1).astype(np.float32))
    x = jnp.asarray(speechlike)
    mag, _ = magphase(stft(peak_normalize(x), 1024, 256))
    lo, hi = in_band_bins(16000, 1024, (500.0, 4000.0))
    # deliberately out-of-box init: doubled magnitudes
    init = mag[lo:hi] * 2.0
    res = embed_core(params, x, wm, cfg, init_coeffs=init)
    assert np.isfinite(float(res.best_loss))
    cold = embed_core(params, x, wm, cfg)
    # warm start from a clipped far point shouldn't diverge
    assert float(res.best_loss) < float(cold.best_loss) + 0.5


def test_embed_deterministic(params, speechlike):
    """Same inputs -> bit-identical embed output (JAX purity substitutes for
    the reference's absent race/determinism story, SURVEY §5)."""
    cfg = AwareConfig().replace(num_iterations=10)
    wm = jnp.asarray((2 * BITS - 1).astype(np.float32))
    a = embed_one(params, jnp.asarray(speechlike), wm, cfg)
    b = embed_one(params, jnp.asarray(speechlike.copy()), wm, cfg)
    np.testing.assert_array_equal(np.asarray(a.audio), np.asarray(b.audio))
