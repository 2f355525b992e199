"""Typed configuration for aware_tpu.

One frozen dataclass replaces the reference's YAML-card + ``config.get``
fallback chain (reference: src/AWARE/cards/config.yaml:1-46,
src/AWARE/utils/models/load_model.py:22-64).  Defaults mirror the reference
card exactly; a YAML card with the same keys can override any field.
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import Any, Mapping, Sequence

import yaml

_CARD_PATH = pathlib.Path(__file__).parent / "cards" / "config.yaml"


@dataclasses.dataclass(frozen=True)
class DetectorNetConfig:
    """Architecture of the keyed detector CNN.

    Mirrors ``detection_net_cfg`` (reference: cards/config.yaml:33-43,
    multibit_detector_net.py:14-28).
    """

    sample_rate: int = 16000
    n_fft: int = 1024
    n_mels: int = 128
    num_blocks: int = 3
    initial_pool_size: int = 2
    initial_pool_stride: int = 2
    n_filters: tuple[int, ...] = (512, 1024, 1024)
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    norm_layer: str = "instance"
    activation: str = "leaky_relu"
    output_length: int = 20
    final_activation: str = "tanh"
    # RNG seed pinning the key material (reference: multibit_detector_net.py:78).
    seed: int = 328656719
    # Alternate key bundle: npz filename under models/_key (or an absolute
    # path).  Empty -> the golden seeded-torch key for the default
    # architecture, fresh JAX xavier otherwise.  Used by re-keyed cards
    # (e.g. the desync-robust bundle).
    key_file: str = ""

    def __post_init__(self) -> None:
        if len(self.n_filters) != self.num_blocks:
            raise ValueError("Number of filters must match number of blocks")

    @property
    def channels(self) -> tuple[int, ...]:
        """Channel sizes of the num_blocks+1 conv blocks, input first.

        (reference: multibit_detector_net.py:58)
        """
        return (self.n_mels, *self.n_filters, 2 * self.output_length)


@dataclasses.dataclass(frozen=True)
class AwareConfig:
    """Full framework configuration (reference: cards/config.yaml:1-46)."""

    # STFT (reference: cards/config.yaml:3-6)
    frame_length: int = 1024
    hop_length: int = 256
    window: str = "hann"
    win_length: int = 1024

    # Pattern codec (reference: cards/config.yaml:9-10)
    pattern_mode: str = "bits2bipolar"
    watermark_length: int = 20

    # Embedding (reference: cards/config.yaml:13-14)
    embedding_bands: tuple[float, float] = (500.0, 4000.0)
    tolerance_db: float = 6.0

    # Optimization (reference: cards/config.yaml:17-27)
    num_iterations: int = 400
    optimizer_name: str = "nadam"
    # stored as a sorted (key, value) tuple so the whole config is hashable
    # (it is a jit static argument); use .opt_params / .sched_params.
    optimizer_params: Any = (("lr", 0.1),)
    scheduler_name: str = "reduce_lr_on_plateau"
    scheduler_params: Any = (("factor", 0.9), ("patience", 500))
    loss: str = "push_extremes"

    verbose: bool = False

    # Silence gate implementation for the service layer (reference gate:
    # src/AWARE/utils/audio/waveform.py:22-46, webrtcvad aggressiveness 3):
    #   "spectral"    — vmappable JAX energy/band/ZCR gate (ops/vad.py);
    #                   rejects loud stationary noise and pure tones that
    #                   webrtcvad famously passes (documented improvement).
    #   "webrtc_gmm"  — the reference-faithful WebRTC-architecture GMM
    #                   classifier from the C++ runtime (_native); pick
    #                   this when edge-clip gating must match the
    #                   reference's webrtcvad decisions (VAD_DIVERGENCE
    #                   quantifies where the two disagree).
    vad: str = "spectral"

    detection_net: DetectorNetConfig = dataclasses.field(
        default_factory=DetectorNetConfig
    )

    # Detection threshold (reference: cards/config.yaml:46)
    threshold: float = 0.0

    # --- TPU-rebuild-only knobs (no reference equivalent) ---
    # 'high' (bf16x3, ~f32-accurate) is the speed/parity sweet spot on the
    # MXU; 'highest' forces full f32 passes, 'default' single-pass bf16.
    matmul_precision: str = "high"
    # Compute dtype for the embed/detect graphs.
    dtype: str = "float32"
    # Unroll factor of the optimizer scan (XLA scheduling/overlap knob).
    scan_unroll: int = 1
    # Fast embed path: framed FFTs of the round trip as banded DFT matmuls
    # on the MXU (exploits that only in-band spectrogram rows change).
    # False falls back to the rfft/irfft reference-shaped graph.
    use_matmul_dft: bool = True
    # Fuse the OLA/crop/envelope/double-peak-norm chain into one Pallas
    # kernel (custom VJP); requires use_matmul_dft.
    use_pallas_ola: bool = False
    # Run the slab round trip as fused Pallas kernels (custom VJP; VMEM-
    # resident; requires use_slab_dft and the 1024/256 frame geometry).
    use_pallas_roundtrip: bool = False
    # With the kernel round trip active, also run the solver's detector
    # forward/backward as fused Pallas kernels (VMEM-resident per clip,
    # batch -> kernel grid) — removes the XLA detector half's HBM
    # intermediates, whose VMEM pressure made batches >=32 SLOWER per clip
    # (the round-2 batch cliff, docs/PERF_NOTES.md).  Only takes effect on
    # the default detector architecture; no effect unless
    # use_pallas_roundtrip is active.
    use_pallas_detector: bool = True
    # With the merged kernel path active (use_pallas_roundtrip +
    # use_pallas_detector) and no EOT views, fuse the whole iteration:
    # the megakernel objective (one kernel per direction), and — when
    # loss/optimizer match the default card (push_extremes + NAdam) —
    # the whole-step kernel (forward, loss gradient, backward, NAdam,
    # clamp, best tracking in ONE program per iteration; the round-3
    # headline path, docs/PERF_NOTES.md).  False keeps the two-kernel
    # composition — the debugging / stage-isolation fallback
    # (tools/kernel_stage_probe.py).
    use_pallas_iteration: bool = True
    # Slab decomposition of the round trip (requires use_matmul_dft and
    # hop | n_fft): both DFT matmuls split into n_fft/hop hop-wide slabs
    # with shifted row-adds, so no (T, n_fft) frames tensor is ever
    # materialized — the solver loop's HBM working set drops from the
    # frame tensors (2.5 MB/clip each, the measured bandwidth bottleneck,
    # PERF_STAGE_PROBE.json) to (T, hop) slices.  Numerically equivalent
    # up to fp summation order.
    use_slab_dft: bool = True
    # EOT (expectation-over-transforms) robust embedding: when non-empty,
    # the solver objective adds differentiable vocoder time-stretch views
    # of the candidate waveform at these rates, so the optimized mark
    # survives desync edits by construction (new capability — the
    # reference solver sees only the clean view).
    eot_stretch_rates: Any = ()
    # Pitch-shift EOT views, in cents/100-semitone units matching the
    # eval suite's ps_5 attack (vocoder pitch_shift at cents/100
    # semitones); empty disables.
    eot_pitch_cents: Any = ()
    # Lossy-compression EOT views: quality levels of the differentiable
    # MDCT codec approximation (attacks/codec.py mp3_approx; 0=best ..
    # 9=lame's worst, 10/11 = extreme-compression pressure beyond lame's
    # range, for hardening against very-low-bitrate codecs like opus@8k
    # and GSM-FR whose damage is coarse in-band quantization); empty
    # disables.
    eot_mp3_qualities: Any = ()
    # CELP-family compression EOT views (attacks/celp.py): LPC-envelope
    # requantization + excitation flattening + band limit — the channel
    # model of 8-16 kb/s speech codecs (opus@8k voip, GSM-FR), which the
    # MDCT view demonstrably does not cover (COMPRESSION_EOT_AB.json).
    # Entries are mode names from attacks/celp.py MODES ("nb8k", "mb16k").
    eot_celp_modes: Any = ()
    # Straight-through REAL-codec EOT views: the forward pass runs the
    # actual in-process codec on host (jax.pure_callback), the backward
    # pass is identity — ground-truth channel pressure with no modeling
    # gap.  Host-assisted: practical on the CPU backend (training /
    # tunnel-outage embedding); on TPU every solver iteration would
    # round-trip the tunnel.  Entries: "opus_8k", "opus_16k", "gsm_fr".
    eot_ste_codecs: Any = ()
    eot_weight: float = 1.0
    # How the EOT views enter the objective: "all" sums every view each
    # iteration (cost ~ 1 + n_views per iteration); "cycle" rotates one
    # view per iteration via lax.switch (cost ~ 2x base regardless of the
    # rate count), so a much DENSER rate set covers the desync range for
    # the price the 4-view "all" card paid — each rate still gets
    # num_iterations/n_views gradient visits.
    eot_mode: str = "all"

    def __post_init__(self) -> None:
        if self.window not in ("hann", "hamming"):
            raise ValueError(f"Invalid window type: {self.window}")
        if self.vad not in ("spectral", "webrtc_gmm"):
            raise ValueError(f"Invalid vad gate: {self.vad}")
        if self.eot_mode not in ("all", "cycle"):
            raise ValueError(f"Invalid eot_mode: {self.eot_mode}")
        for field in ("optimizer_params", "scheduler_params",
                      "embedding_bands", "eot_stretch_rates",
                      "eot_pitch_cents", "eot_mp3_qualities",
                      "eot_celp_modes", "eot_ste_codecs"):
            value = getattr(self, field)
            if isinstance(value, Mapping):
                value = tuple(sorted(value.items()))
            elif isinstance(value, list):
                value = tuple(value)
            object.__setattr__(self, field, value)
        bad_q = [q for q in (self.eot_mp3_qualities or ())
                 if int(q) not in range(12)]
        if bad_q:
            raise ValueError(f"Invalid eot_mp3_qualities (0-11): {bad_q}")
        bad_m = [m for m in (self.eot_celp_modes or ())
                 if m not in ("nb8k", "mb16k")]
        if bad_m:
            raise ValueError(f"Invalid eot_celp_modes: {bad_m}")
        bad_s = [s for s in (self.eot_ste_codecs or ())
                 if s not in ("opus_8k", "opus_16k", "gsm_fr")]
        if bad_s:
            raise ValueError(f"Invalid eot_ste_codecs: {bad_s}")

    @property
    def opt_params(self) -> dict[str, Any]:
        return dict(self.optimizer_params)

    @property
    def sched_params(self) -> dict[str, Any]:
        return dict(self.scheduler_params)

    @classmethod
    def from_card(cls, path: str | pathlib.Path | None = None) -> "AwareConfig":
        """Load config from a YAML card (reference-compatible key names)."""
        card = yaml.safe_load(pathlib.Path(path or _CARD_PATH).read_text()) or {}
        return cls.from_dict(card)

    @classmethod
    def from_dict(cls, card: Mapping[str, Any]) -> "AwareConfig":
        kwargs: dict[str, Any] = {}
        simple = {
            "frame_length", "hop_length", "window", "win_length",
            "pattern_mode", "watermark_length", "tolerance_db",
            "num_iterations", "loss", "verbose", "threshold",
            "matmul_precision", "dtype", "scan_unroll",
            "use_matmul_dft", "use_pallas_ola", "use_slab_dft",
            "use_pallas_roundtrip", "use_pallas_detector",
            "use_pallas_iteration", "eot_weight",
            "eot_mode", "vad",
        }
        for key in simple & set(card):
            kwargs[key] = card[key]
        if "embedding_bands" in card:
            kwargs["embedding_bands"] = tuple(card["embedding_bands"])
        if "eot_stretch_rates" in card:
            kwargs["eot_stretch_rates"] = tuple(card["eot_stretch_rates"])
        if "eot_pitch_cents" in card:
            kwargs["eot_pitch_cents"] = tuple(card["eot_pitch_cents"])
        if "eot_mp3_qualities" in card:
            kwargs["eot_mp3_qualities"] = tuple(card["eot_mp3_qualities"])
        if "eot_celp_modes" in card:
            kwargs["eot_celp_modes"] = tuple(card["eot_celp_modes"])
        if "eot_ste_codecs" in card:
            kwargs["eot_ste_codecs"] = tuple(card["eot_ste_codecs"])
        if "optimizer_cfg" in card:
            kwargs["optimizer_name"] = card["optimizer_cfg"].get("name", "nadam")
            kwargs["optimizer_params"] = dict(
                card["optimizer_cfg"].get("params", {"lr": 0.1})
            )
        if "scheduler_cfg" in card:
            kwargs["scheduler_name"] = card["scheduler_cfg"].get(
                "name", "reduce_lr_on_plateau"
            )
            kwargs["scheduler_params"] = dict(
                card["scheduler_cfg"].get("params", {})
            )
        if "detection_net_cfg" in card:
            net = dict(card["detection_net_cfg"])
            if "n_filters" in net:
                net["n_filters"] = tuple(net["n_filters"])
            kwargs["detection_net"] = DetectorNetConfig(**net)
        return cls(**kwargs)

    def replace(self, **kwargs: Any) -> "AwareConfig":
        return dataclasses.replace(self, **kwargs)


def in_band_bins(
    sample_rate: int, n_fft: int, bands: Sequence[float]
) -> tuple[int, int]:
    """Half-open bin range [lo, hi) of FFT bins inside the embedding band.

    The reference masks bins by ``fft_frequencies`` membership
    (reference: multibit_embedder.py:43-47); because the frequency grid is a
    linspace the selected indices are always one contiguous run, which we
    exploit for cheap slice-based scatter on TPU.
    """
    import numpy as np

    freqs = np.linspace(0.0, sample_rate / 2.0, n_fft // 2 + 1)
    mask = (freqs >= bands[0]) & (freqs <= bands[1])
    idx = np.where(mask)[0]
    if len(idx) == 0:
        raise ValueError(f"No FFT bins inside embedding band {bands}")
    if not np.array_equal(idx, np.arange(idx[0], idx[-1] + 1)):
        raise AssertionError("embedding band bins are not contiguous")
    return int(idx[0]), int(idx[-1] + 1)
