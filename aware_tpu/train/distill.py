"""Solver-distilled training of the amortized embedder.

Pure adversarial training of the amortized net plateaus (~8% one-shot BER)
and generalizes poorly off its training clip distribution.  Distillation
fixes both: the 400-iteration solver is cheap on TPU (~27 clips/s), so its
optimized in-band coefficients become regression targets over a *diverse*
clip corpus, and a short adversarial fine-tune sharpens bit margins.

Pipeline:
  1. ``generate_targets`` — batched solver embeds over mixed clip families,
     returning (band_mag, pattern, target_coeffs) tuples;
  2. ``distill_step`` — MSE in units of the tolerance box
     ((pred - target) / delta_max) plus a small detection term;
  3. the existing adversarial ``train_step`` for fine-tuning.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aware_tpu.config import AwareConfig, in_band_bins
from aware_tpu.embed.solver import embed_batch
from aware_tpu.models.detector import DetectorParams, detector_apply
from aware_tpu.ops.stft import istft, magphase, peak_normalize, polar, stft
from aware_tpu.ops.windows import get_window
from aware_tpu.train.adversarial import TrainConfig, TrainState, embedder_apply


# ----------------------------------------------------- clip distribution ---

def diverse_clip(seed: int, seconds: float = 2.0, sr: int = 16000) -> np.ndarray:
    """Mixed-family speech-like generator (harmonic voices, different
    envelope statistics, formant-shaped pulse trains, voiced+noise mixes) —
    broader than any single synthesizer so the amortized net can't overfit
    one spectral shape."""
    rng = np.random.default_rng(seed)
    n = int(seconds * sr)
    t = np.arange(n) / sr
    family = seed % 4

    f0 = (80.0 + 160.0 * rng.random()) * (
        1.0 + 0.15 * np.sin(2 * np.pi * (0.5 + 3.0 * rng.random()) * t)
    )
    phase = np.cumsum(2 * np.pi * f0 / sr)
    x = np.zeros(n)

    if family == 0:  # 1/k harmonic comb (bright voice)
        for k in range(1, 25):
            x += np.cos(k * phase + rng.random() * 6.28) / k
    elif family == 1:  # formant-weighted harmonics (vowel-like)
        formants = 300.0 + 3000.0 * rng.random(3)
        for k in range(1, 40):
            fk = k * np.mean(f0)
            w = sum(np.exp(-0.5 * ((fk - fm) / 200.0) ** 2) for fm in formants)
            x += (w + 0.05) * np.cos(k * phase + rng.random() * 6.28)
    elif family == 2:  # pulse train through a decaying spectrum (buzzy)
        for k in range(1, 60):
            x += np.cos(k * phase) / np.sqrt(k)
    else:  # voiced + strong aspiration noise
        for k in range(1, 15):
            x += np.cos(k * phase + rng.random() * 6.28) / k
        x += 0.5 * rng.standard_normal(n) * np.abs(np.sin(phase / 8.0))

    env_rate = 1.5 + 4.0 * rng.random()
    env = 0.3 + 0.7 * np.clip(np.sin(2 * np.pi * env_rate * t + rng.random() * 6), 0, None)
    x = x * env + 0.02 * rng.standard_normal(n)
    return (x / (np.max(np.abs(x)) + 1e-9)).astype(np.float32)


# --------------------------------------------------------- target dataset ---

def generate_targets(
    d_params: DetectorParams,
    cfg: AwareConfig,
    n_clips: int,
    batch: int = 32,
    seed: int = 0,
    clip_fn: Callable[[int], np.ndarray] = diverse_clip,
    solver_iterations: int = 400,
):
    """Run the solver over a diverse corpus; returns numpy arrays
    (clips (N, L), band_mags (N, nb, T), patterns (N, bits),
    targets (N, nb, T)).  The raw clips are kept so the post-roundtrip
    distillation loss can rebuild mag/phase inside its own jit."""
    rng = np.random.default_rng(seed)
    scfg = cfg.replace(num_iterations=solver_iterations)
    window = get_window(cfg.window, cfg.win_length)
    lo, hi = in_band_bins(
        cfg.detection_net.sample_rate, cfg.frame_length, cfg.embedding_bands
    )
    all_clips, bands, patterns, targets = [], [], [], []
    n_bits = cfg.detection_net.output_length
    for start in range(0, n_clips, batch):
        b = min(batch, n_clips - start)
        clips = np.stack([clip_fn(seed * 131071 + start + i) for i in range(b)])
        pats = (rng.integers(0, 2, (b, n_bits)) * 2 - 1).astype(np.float32)
        res = embed_batch(
            d_params, jnp.asarray(clips), jnp.asarray(pats), scfg
        )
        mags, _ = jax.vmap(
            lambda a: magphase(
                stft(peak_normalize(a), cfg.frame_length, cfg.hop_length, window)
            )
        )(jnp.asarray(clips))
        all_clips.append(clips)
        bands.append(np.asarray(mags[:, lo:hi]))
        patterns.append(pats)
        targets.append(np.asarray(res.coeffs))
    return (
        np.concatenate(all_clips),
        np.concatenate(bands),
        np.concatenate(patterns),
        np.concatenate(targets),
    )


# ------------------------------------------------------------ distillation ---

def distill_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    """The optimizer both distill step builders use.  Callers must init
    ``opt_state`` with THIS (not ``init_train_state``'s adversarial
    optimizer — different pytree structure)."""
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(tcfg.learning_rate, weight_decay=1e-5),
    )


def make_distill_step(cfg: AwareConfig, tcfg: TrainConfig, lambda_det: float = 0.1):
    """jit-able ``step(state, band, pattern, target, key) -> (state, metrics)``.

    Loss: box-normalized regression onto solver coefficients + a small
    direct detection term on the (no-roundtrip) banded magnitude — keeps
    bit margins from collapsing where regression alone is indifferent.
    """
    opt = distill_optimizer(tcfg)
    lo, hi = in_band_bins(
        cfg.detection_net.sample_rate, cfg.frame_length, cfg.embedding_bands
    )
    n_freq = cfg.frame_length // 2 + 1

    def loss_fn(e_params, d_params, band, pattern, target):
        def one(bm, p, tg):
            pred = embedder_apply(e_params, bm, p, cfg.tolerance_db)
            delta = bm * (10.0 ** (-cfg.tolerance_db / 20.0)) + 1e-6
            reg = jnp.mean(((pred - tg) / delta) ** 2)
            t = bm.shape[-1]
            m2 = jnp.concatenate(
                [
                    jnp.zeros((lo, t)),
                    pred,
                    jnp.zeros((n_freq - hi, t)),
                ]
            )
            out = detector_apply(d_params, m2, cfg.detection_net,
                                 cfg.matmul_precision)
            det = jnp.mean((out - p) ** 2) - 0.1 * jnp.mean(jnp.abs(out))
            soft_ber = jnp.mean(jax.nn.sigmoid(-4.0 * out * p))
            return reg, det, soft_ber

        reg, det, soft_ber = jax.vmap(one)(band, pattern, target)
        loss = jnp.mean(reg) + lambda_det * jnp.mean(det)
        return loss, {
            "loss": loss,
            "reg": jnp.mean(reg),
            "det_loss": jnp.mean(det),
            "soft_ber": jnp.mean(soft_ber),
        }

    def step(state: TrainState, band, pattern, target, key=None):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.e_params, state.d_params, band, pattern, target
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.e_params)
        e_params = optax.apply_updates(state.e_params, updates)
        return (
            TrainState(e_params, state.d_params, opt_state, state.step + 1),
            metrics,
        )

    return step


def make_distill_step_visible(
    cfg: AwareConfig, tcfg: TrainConfig, lambda_det: float = 0.3
):
    """jit-able ``step(state, clips, patterns, targets) -> (state, metrics)``
    — the round-2 distillation objective.

    Fixes both failure modes of the raw-coefficient regression
    (docs/NEXT_ROUND_NOTES.md negative result):

    * the net sees the **phase** (embedder_apply with ``band_phase``), so
      the solver's phase-dependent mapping is representable;
    * the regression target is the **detector-visible** magnitude — both
      the prediction and the solver target are pushed through the
      ISTFT(mag, phase) -> STFT round trip before comparison, so the loss
      lives exactly where detection happens, and components of the raw
      coefficients that the round trip annihilates (phase-inconsistent
      residues) stop polluting the objective.

    Loss: box-normalized MSE of the round-tripped band magnitudes + a
    ``lambda_det``-weighted detection loss on the round-tripped prediction.
    """
    opt = distill_optimizer(tcfg)
    lo, hi = in_band_bins(
        cfg.detection_net.sample_rate, cfg.frame_length, cfg.embedding_bands
    )
    n_fft, hop = cfg.frame_length, cfg.hop_length
    n_freq = n_fft // 2 + 1
    from aware_tpu.ops.windows import get_window

    window = get_window(cfg.window, cfg.win_length)

    def loss_fn(e_params, d_params, clips, patterns, targets):
        def one(clip, p, tg):
            mag, phase = magphase(
                stft(peak_normalize(clip), n_fft, hop, window)
            )
            band = mag[lo:hi]

            def visible(band_coeffs):
                wmag = jnp.concatenate(
                    [mag[:lo], band_coeffs, mag[hi:]], axis=0
                )
                y = peak_normalize(istft(polar(wmag, phase), n_fft, hop, window))
                m2, _ = magphase(stft(peak_normalize(y), n_fft, hop, window))
                return m2[lo:hi]

            pred = embedder_apply(
                e_params, band, p, cfg.tolerance_db, band_phase=phase[lo:hi]
            )
            vp = visible(pred)
            vt = visible(tg)
            v0 = visible(band)
            # fraction of the solver-injected *visible* signal the net has
            # not reproduced (1.0 at init, 0.0 at perfect mimicry).  A
            # per-bin delta normalization is ill-conditioned here: in quiet
            # bins the round trip's spectral leakage dwarfs the tolerance
            # box, so box units amplify detection-irrelevant residue ~8x
            # over the watermark itself (observed: reg plateaus ~11 with
            # the detector still at chance).
            reg = jnp.sum((vp - vt) ** 2) / (jnp.sum((vt - v0) ** 2) + 1e-12)
            t2 = vp.shape[-1]
            m2 = jnp.concatenate(
                [jnp.zeros((lo, t2)), vp, jnp.zeros((n_freq - hi, t2))]
            )
            out = detector_apply(
                d_params, m2, cfg.detection_net, cfg.matmul_precision
            )
            det = jnp.mean((out - p) ** 2) - 0.1 * jnp.mean(jnp.abs(out))
            soft_ber = jnp.mean(jax.nn.sigmoid(-4.0 * out * p))
            hard_ber = jnp.mean((out * p <= 0).astype(jnp.float32))
            return reg, det, soft_ber, hard_ber

        reg, det, soft_ber, hard_ber = jax.vmap(one)(clips, patterns, targets)
        loss = jnp.mean(reg) + lambda_det * jnp.mean(det)
        return loss, {
            "loss": loss,
            "reg": jnp.mean(reg),
            "det_loss": jnp.mean(det),
            "soft_ber": jnp.mean(soft_ber),
            "hard_ber": jnp.mean(hard_ber),
        }

    def step(state: TrainState, clips, patterns, targets):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.e_params, state.d_params, clips, patterns, targets
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.e_params)
        e_params = optax.apply_updates(state.e_params, updates)
        return (
            TrainState(e_params, state.d_params, opt_state, state.step + 1),
            metrics,
        )

    return step
