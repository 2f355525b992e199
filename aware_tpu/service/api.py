"""Public service API: load / embed_watermark / detect_watermark.

Mirrors the reference's import surface and runtime contract
(reference: src/AWARE/service/embed.py:7-80, service/detect.py:7-55,
utils/models/load_model.py:6-76) with numpy in / numpy out.

Differences from the reference, by design:

* ``load()`` raises on error instead of returning ``None`` (the reference
  logs and returns None, and callers then crash on unpack —
  load_model.py:15-17).
* Sample rates other than the model's 16 kHz are accepted: input is
  polyphase-resampled to the model rate and the result is resampled back
  (the reference hard-rejects; its own eval harness resamples externally at
  scripts/test.py:60-65).
* ``(L, 1)``-shaped mono input is squeezed instead of crashing inside the
  STFT.

Reference quirks preserved: the per-channel rescale uses the **signed max**
of the pre-embed channel, not the absolute max (embed.py:41-42,55-56,69-73);
stereo detection merges per-bit by larger absolute value (detect.py:30-35);
both-silent stereo / silent mono clips are rejected by the VAD gate.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
import numpy as np

from aware_tpu.config import AwareConfig
from aware_tpu.embed.solver import embed_batch, embed_lbfgs, embed_one
from aware_tpu.models.detector import (
    DetectorParams,
    detect_values,
    init_params,
    model_info,
)
from aware_tpu.ops.resample import resample
from aware_tpu.ops.vad import is_silent
from aware_tpu.service.codec import decode_pattern, encode_pattern
from aware_tpu.utils.logger import logger

MODEL_SAMPLE_RATE = 16000


@dataclasses.dataclass(frozen=True)
class AWAREEmbedder:
    """Embedder handle: frozen detector params + config.

    (reference: embedding/multibit_embedder.py:17-41; the optimization loop
    itself lives in aware_tpu.embed.solver)
    """

    params: DetectorParams
    cfg: AwareConfig

    @property
    def pattern_mode(self) -> str:
        return self.cfg.pattern_mode

    @property
    def output_length(self) -> int:
        return self.cfg.detection_net.output_length

    def embed(
        self, audio: np.ndarray, sample_rate: int, watermark: np.ndarray
    ) -> np.ndarray:
        """Embed a bipolar pattern into one mono clip; returns the
        peak-normalized watermarked waveform (reference: :141-197)."""
        if sample_rate != self.cfg.detection_net.sample_rate:
            raise ValueError(
                f"Embedder operates at {self.cfg.detection_net.sample_rate} Hz"
            )
        # lbfgs is history-based and host-driven; every other optimizer runs
        # the jitted scan solver (see embed.solver / embed.lbfgs).
        solve = embed_lbfgs if self.cfg.optimizer_name == "lbfgs" else embed_one
        res = solve(
            self.params,
            jnp.asarray(audio, jnp.float32),
            jnp.asarray(watermark, jnp.float32),
            self.cfg,
        )
        if self.cfg.verbose:
            logger.info(
                "embed: best_loss=%.6f final_loss=%.6f",
                float(res.best_loss),
                float(res.final_loss),
            )
        return np.asarray(res.audio)


@dataclasses.dataclass(frozen=True)
class AWAREDetector:
    """Detector handle sharing the embedder's keyed params
    (reference: detection/multibit_detector.py:9-43; the shared-net design
    fact is load_model.py:55-56)."""

    params: DetectorParams
    cfg: AwareConfig

    @property
    def threshold(self) -> float:
        return self.cfg.threshold

    @property
    def pattern_mode(self) -> str:
        return self.cfg.pattern_mode

    def detect(self, audio: np.ndarray, sample_rate: int) -> np.ndarray:
        """One mono clip -> raw detector values (reference: :28-42)."""
        if sample_rate != self.cfg.detection_net.sample_rate:
            raise ValueError(
                f"Detector operates at {self.cfg.detection_net.sample_rate} Hz"
            )
        from aware_tpu.models.detector import detect_values_jit

        return np.asarray(
            detect_values_jit(
                self.params,
                jnp.asarray(audio, jnp.float32),
                self.cfg.detection_net,
                hop_length=self.cfg.hop_length,
                window=self.cfg.window,
                win_length=self.cfg.win_length,
                embedding_bands=self.cfg.embedding_bands,
                matmul_precision=self.cfg.matmul_precision,
            )
        )

    def get_model_info(self) -> dict[str, Any]:
        return model_info(self.params, self.cfg.detection_net)


def load(
    card: str | None = None,
    compile_cache: bool | str = True,
    **overrides: Any,
) -> tuple[AWAREEmbedder, AWAREDetector]:
    """Build the (embedder, detector) pair from a config card.

    The two handles share one params pytree — the keyed net is the shared
    secret (reference: load_model.py:6-76).

    On TPU, cards that do not pin ``matmul_precision: highest`` get the
    fused single-pass-bf16 round-trip kernels (`use_pallas_roundtrip`) —
    the fastest validated embed path.  Note this applies even to a card
    that pins ``high`` (bf16x3): the round trip runs at bf16 while the
    detector matmuls honor the declared precision.  Outcome-level evals
    (loss/BER under the attack suite) back the bf16 round trip; pin
    ``use_pallas_roundtrip: false`` in the card to opt out entirely.

    ``compile_cache`` controls the persistent XLA/Mosaic compilation cache
    set up for the expensive fused-kernel program (minutes of cold Mosaic
    compile per clip length): ``True`` uses ``~/.cache/aware_tpu/jax``, a
    string overrides the directory, ``False`` leaves the process-global
    JAX cache configuration untouched.
    """
    card_keys: set = set()
    if card:
        import pathlib

        import yaml

        # a bare name ("robust", "compression") resolves against the
        # packaged cards; an explicit path is honored as-is
        path = pathlib.Path(card)
        if not path.exists():
            pkg = (pathlib.Path(__file__).parent.parent / "cards"
                   / f"{card}.yaml")
            if pkg.exists():
                path = pkg
        card_dict = yaml.safe_load(path.read_text()) or {}
        card_keys = set(card_dict)
        cfg = AwareConfig.from_dict(card_dict)
    else:
        cfg = AwareConfig()
    if (
        "use_pallas_roundtrip" not in overrides
        and "use_pallas_roundtrip" not in card_keys
        and cfg.use_slab_dft
    ):
        # On TPU the fused round-trip kernels are the fastest validated
        # embed path (~50 vs ~39 clips/s on v5e); elsewhere pallas runs in
        # interpret mode, so the XLA slab path stays the default.  A card
        # or kwarg that pins the flag is honored as-is.
        import jax

        # mirror of the solver's own gating (solver.py pallas_ok): the
        # kernels are bf16, so a card pinning 'highest' precision keeps
        # the XLA slab path — don't set a flag that would be dead there
        on_tpu = (
            jax.default_backend() == "tpu"
            and cfg.matmul_precision != "highest"
        )
        cfg = cfg.replace(use_pallas_roundtrip=on_tpu)
        if (
            on_tpu
            and compile_cache
            and jax.config.jax_compilation_cache_dir is None
        ):
            # the fused-kernel program costs minutes of Mosaic compile per
            # clip length — persist it so only the first embed ever pays
            import os

            cache_dir = (
                compile_cache
                if isinstance(compile_cache, str)
                else os.path.expanduser("~/.cache/aware_tpu/jax")
            )
            logger.info(
                "enabling persistent JAX compilation cache at %s "
                "(process-global; pass compile_cache=False to load() to "
                "leave JAX cache config untouched)", cache_dir,
            )
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 5
            )
    if overrides:
        cfg = cfg.replace(**overrides)
    params = init_params(cfg.detection_net)
    embedder = AWAREEmbedder(params=params, cfg=cfg)
    detector = AWAREDetector(params=params, cfg=cfg)
    logger.info("aware_tpu model loaded: %s", detector.get_model_info())
    return embedder, detector


# ---------------------------------------------------------------------------
# Service functions
# ---------------------------------------------------------------------------

def _gate_silent(audio: np.ndarray, sample_rate: int, cfg: AwareConfig) -> bool:
    """Service silence gate, selected by ``cfg.vad``.

    "spectral" is the JAX gate (default); "webrtc_gmm" is the C++
    reference-faithful WebRTC-architecture classifier
    (reference gate: src/AWARE/utils/audio/waveform.py:22-46).
    """
    if cfg.vad == "webrtc_gmm":
        from aware_tpu.native import vad_gmm_is_silent

        return vad_gmm_is_silent(np.asarray(audio, np.float32), sample_rate)
    return bool(is_silent(audio, sample_rate))


def _as_float_mono(audio: np.ndarray) -> np.ndarray:
    audio = np.asarray(audio, dtype=np.float32)
    if audio.ndim == 2 and audio.shape[1] == 1:
        audio = audio[:, 0]
    return audio


def _validate_pattern(watermark: np.ndarray, model: AWAREEmbedder) -> np.ndarray:
    if len(watermark) != model.output_length:
        raise ValueError(
            f"Invalid watermark length. Expected {model.output_length}, "
            f"got {len(watermark)}."
        )
    return np.asarray(watermark, dtype=np.float32)


def embed_watermark(
    audio: np.ndarray,
    sample_rate: int,
    watermark_bits: bytes | np.ndarray,
    model: AWAREEmbedder,
) -> np.ndarray:
    """Embed ``watermark_bits`` into ``audio``; returns watermarked audio.

    (reference: service/embed.py:7-80)
    """
    pattern = _validate_pattern(
        encode_pattern(watermark_bits, model.pattern_mode), model
    )
    audio = np.asarray(audio, dtype=np.float32)

    model_sr = model.cfg.detection_net.sample_rate
    if sample_rate != model_sr:
        work = _resample_nd(audio, sample_rate, model_sr)
        out = embed_watermark(work, model_sr, watermark_bits, model)
        return _resample_nd(out, model_sr, sample_rate)

    if audio.ndim == 2 and audio.shape[1] == 2:  # stereo
        left, right = audio[:, 0], audio[:, 1]
        left_mx, right_mx = np.max(left), np.max(right)  # signed-max quirk
        silent_l = _gate_silent(left, sample_rate, model.cfg)
        silent_r = _gate_silent(right, sample_rate, model.cfg)
        if silent_l and silent_r:
            raise ValueError(
                "Signal you provided doesn't contain any speech. "
                "Please provide signal that contains speech."
            )
        left_wm = model.embed(left, sample_rate, pattern) * left_mx
        right_wm = model.embed(right, sample_rate, pattern) * right_mx
        return np.column_stack((left_wm, right_wm))

    if audio.ndim == 1 or (audio.ndim == 2 and audio.shape[1] == 1):  # mono
        mono = _as_float_mono(audio)
        if _gate_silent(mono, sample_rate, model.cfg):
            raise ValueError(
                "Signal you provided doesn't contain any speech. "
                "Please provide signal that contains speech."
            )
        audio_mx = np.max(mono)  # signed-max quirk (reference embed.py:69)
        return model.embed(mono, sample_rate, pattern) * audio_mx

    raise ValueError("Invalid audio shape. Expected 1D or 2D numpy array.")


def detect_watermark(
    audio: np.ndarray, sample_rate: int, detector: AWAREDetector
):
    """Detect and decode the embedded pattern (reference: service/detect.py:7-55)."""
    audio = np.asarray(audio, dtype=np.float32)
    model_sr = detector.cfg.detection_net.sample_rate
    if sample_rate != model_sr:
        audio = _resample_nd(audio, sample_rate, model_sr)
        sample_rate = model_sr

    if audio.ndim == 2 and audio.shape[1] == 2:  # stereo
        left = detector.detect(audio[:, 0], sample_rate)
        right = detector.detect(audio[:, 1], sample_rate)
        values = np.where(np.abs(left) > np.abs(right), left, right)
    elif audio.ndim == 1 or (audio.ndim == 2 and audio.shape[1] == 1):
        values = detector.detect(_as_float_mono(audio), sample_rate)
    else:
        raise ValueError("Invalid audio shape. Expected 1D or 2D numpy array.")

    return decode_pattern(values, detector.pattern_mode, detector.threshold)


def _resample_nd(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Resample mono (L,) or stereo (L, C) host arrays."""
    if audio.ndim == 1:
        return np.asarray(resample(jnp.asarray(audio), orig_sr, target_sr))
    cols = [
        np.asarray(resample(jnp.asarray(audio[:, c]), orig_sr, target_sr))
        for c in range(audio.shape[1])
    ]
    return np.column_stack(cols)


# ---------------------------------------------------------------------------
# Batched service (TPU-rebuild capability; no reference equivalent)
# ---------------------------------------------------------------------------

def embed_watermark_batch(
    audios: np.ndarray,
    sample_rate: int,
    watermark_bits: np.ndarray,
    model: AWAREEmbedder,
    check_silence: bool = True,
    on_silent: str = "raise",
) -> np.ndarray | tuple[np.ndarray, np.ndarray]:
    """Embed B patterns into B equal-length mono clips in one compiled
    program (vmapped solver).  audios: (B, L); watermark_bits: (B, n_bits).

    Returns (B, (T-1)*hop) watermarked clips, rescaled per the service
    contract.  Silence handling (per-clip failure isolation for batch jobs):

    * ``on_silent="raise"``: any silent clip raises (all-or-nothing,
      matching per-clip service semantics);
    * ``on_silent="mask"``: silent lanes pass through unwatermarked and the
      call returns ``(out, embedded_mask)`` — one bad clip never poisons a
      batch.
    """
    audios = np.asarray(audios, dtype=np.float32)
    if audios.ndim != 2:
        raise ValueError("embed_watermark_batch expects (B, L) mono clips")
    if on_silent not in ("raise", "mask"):
        raise ValueError("on_silent must be 'raise' or 'mask'")
    patterns = np.stack(
        [
            _validate_pattern(encode_pattern(w, model.pattern_mode), model)
            for w in np.asarray(watermark_bits)
        ]
    )
    model_sr = model.cfg.detection_net.sample_rate
    if sample_rate != model_sr:
        audios = np.stack(
            [_resample_nd(a, sample_rate, model_sr) for a in audios]
        )
    silent = np.zeros(audios.shape[0], bool)
    if check_silence:
        if model.cfg.vad == "webrtc_gmm":
            silent = np.asarray(
                [_gate_silent(a, model_sr, model.cfg) for a in audios]
            )
        else:
            silent = np.asarray(is_silent(audios, model_sr))
        if silent.any() and on_silent == "raise":
            raise ValueError(
                f"Clips {np.where(silent)[0].tolist()} contain no speech."
            )
    mx = np.max(audios, axis=1)  # signed-max quirk, per clip
    res = embed_batch(
        model.params, jnp.asarray(audios), jnp.asarray(patterns), model.cfg
    )
    out = np.asarray(res.audio) * mx[:, None]
    if silent.any():
        out[silent] = audios[silent, : out.shape[1]]
    if sample_rate != model_sr:
        out = np.stack([_resample_nd(o, model_sr, sample_rate) for o in out])
    if on_silent == "mask":
        return out, ~silent
    return out


def detect_watermark_batch(
    audios: np.ndarray, sample_rate: int, detector: AWAREDetector
) -> np.ndarray:
    """Detect over (B, L) mono clips; returns (B, n_bits) decoded bits."""
    import jax

    audios = np.asarray(audios, dtype=np.float32)
    model_sr = detector.cfg.detection_net.sample_rate
    if sample_rate != model_sr:
        audios = np.stack([_resample_nd(a, sample_rate, model_sr) for a in audios])
    cfg = detector.cfg
    from aware_tpu.models.detector import detect_values_batch_jit

    values = np.asarray(
        detect_values_batch_jit(
            detector.params,
            jnp.asarray(audios),
            cfg.detection_net,
            hop_length=cfg.hop_length,
            window=cfg.window,
            win_length=cfg.win_length,
            embedding_bands=cfg.embedding_bands,
            matmul_precision=cfg.matmul_precision,
        )
    )
    return np.stack(
        [decode_pattern(v, detector.pattern_mode, detector.threshold) for v in values]
    )
