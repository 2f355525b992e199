"""Streaming service surface: long-form ingest + watermark localization.

New capability beyond the reference (which takes one short clip at a
time): answer "is there a watermark *anywhere* in this hours-long file,
where, and what does it say" with bounded device memory.

Two complementary modes:

* **Sliding-window localization** — a detection window (the embed clip
  scale, default 2 s) slides over the file; windows are stacked and
  detected in batched dispatches (``batch_windows`` per jit call, so
  device memory is O(batch x window), never O(file)).  Each window
  yields the detector's raw values; a window is a *hit* when its
  confidence (mean |tanh readout|) clears the decision threshold, and
  adjacent hits merge into segments with majority-voted bits.
* **Mesh-global detection** — with a ``jax.sharding.Mesh``, one global
  detect over the whole file via the sequence-parallel path
  (parallel/streaming.py: ppermute halo + psum-merged masked stats),
  for when the file is one long watermarked stream rather than a
  haystack.

The decision threshold is calibrated against the null distribution:
``threshold="auto"`` synthesizes unwatermarked speech windows, measures
their confidences in one batched dispatch, and sets
``mean + 6 x std`` (false-positive-conservative).

Hit windows are grouped into segments with a bridge-and-confirm rule,
tuned on the hour-scale eval's measured window confidences:

* **bridging** — hit windows separated by up to ``merge_gap``
  sub-threshold windows merge into ONE segment (a genuine plant's
  windows fragment across the threshold when it lands between hops;
  measured fragments sit <= 2 windows apart), so one mark never
  reports as two detections;
* **confirmation** — a merged group with fewer than ``min_run`` hit
  windows is kept only when its peak confidence clears the stronger
  ``mean + strong_sigma x std`` bar (a genuine plant >= the window
  length always covers >= 2 hit windows at the default 2 s / 1 s
  geometry unless fragmented, while null audio grazing the 6-sigma
  threshold produces isolated single-window hits).  Unconfirmed hits
  are counted in ``StreamingResult.rejected_segments``.

In the hour-scale smoke eval this yields 24/24 plant recall with zero
duplicate or false segments (STREAMING_EVAL.json).

CLI: ``python -m aware_tpu detect --streaming file.wav``.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from aware_tpu.models.detector import detect_values
from aware_tpu.service.api import AWAREDetector
from aware_tpu.service.codec import decode_pattern


@dataclasses.dataclass(frozen=True)
class Segment:
    start_seconds: float
    end_seconds: float
    confidence: float
    bits: np.ndarray
    n_windows: int = 1
    # fraction of per-window bit signs that agree with the merged vote —
    # near 1.0 for genuine marks, ~0.5 + noise for spurious runs
    bit_agreement: float = 1.0


@dataclasses.dataclass(frozen=True)
class StreamingResult:
    window_starts: np.ndarray   # (N,) seconds
    confidences: np.ndarray     # (N,)
    values: np.ndarray          # (N, n_bits) raw detector outputs
    threshold: float
    segments: list[Segment]
    rejected_segments: int = 0  # hit runs dropped by confirmation

    @property
    def detected(self) -> bool:
        return len(self.segments) > 0

    @property
    def best_bits(self) -> np.ndarray | None:
        if not self.segments:
            return None
        best = max(self.segments, key=lambda s: s.confidence)
        return best.bits


class StreamingDetector:
    """Chunked sliding-window detector over a shared AWAREDetector handle."""

    def __init__(
        self,
        detector: AWAREDetector,
        window_seconds: float = 2.0,
        hop_seconds: float = 1.0,
        batch_windows: int = 64,
        threshold: float | str = "auto",
        mesh=None,
        min_run: int = 2,
        strong_sigma: float = 8.0,
        merge_gap: int = 2,
    ):
        self.detector = detector
        cfg = detector.cfg
        self.sr = cfg.detection_net.sample_rate
        self.window = int(window_seconds * self.sr)
        self.hop = int(hop_seconds * self.sr)
        self.batch_windows = batch_windows
        self.mesh = mesh
        self.min_run = min_run
        self.strong_sigma = strong_sigma
        self.merge_gap = merge_gap

        def batched(audio_windows):
            return jax.vmap(
                lambda a: detect_values(
                    detector.params,
                    a,
                    cfg.detection_net,
                    hop_length=cfg.hop_length,
                    window=cfg.window,
                    win_length=cfg.win_length,
                    embedding_bands=cfg.embedding_bands,
                    matmul_precision=cfg.matmul_precision,
                )
            )(audio_windows)

        self._batched = jax.jit(batched)
        if threshold == "auto":
            self.threshold = self._calibrate_null()
            self.strong_threshold = (
                self._null_mean + strong_sigma * self._null_std
            )
        else:
            # manual threshold: no null stats, so confirmation can only
            # use run length; a single-window run passes unconditionally
            self.threshold = float(threshold)
            self.strong_threshold = float(threshold)

    # ------------------------------------------------------------ intern ---

    def _calibrate_null(self, n: int = 16, seed: int = 1234) -> float:
        """Null-distribution confidence over synthesized unwatermarked
        speech windows; one batched dispatch."""
        from aware_tpu.eval.harness import synthesize_speech_clip

        wins = np.stack(
            [
                synthesize_speech_clip(seed + i, seconds=self.window / self.sr)[
                    : self.window
                ]
                for i in range(n)
            ]
        )
        vals = np.asarray(self._batched(jnp.asarray(wins)))
        conf = np.mean(np.abs(vals), axis=1)
        self._null_mean = float(np.mean(conf))
        self._null_std = float(np.std(conf))
        return self._null_mean + 6.0 * self._null_std

    def _values_for_windows(self, audio: np.ndarray, starts: np.ndarray):
        """Batched detection over all windows, bounded device memory.

        Dispatches are left ASYNC inside the loop (JAX returns futures)
        and forced only at the end, so batch i+1's host slicing and h2d
        transfer overlap batch i's device compute — measured 1.7x on the
        hour-scale chip eval (STREAMING_EVAL.json, 16.5 s -> 9.6 s; the
        per-batch np.asarray sync serialized transfer -> compute ->
        readback).
        Device memory stays bounded by the result arrays, (B, n_bits)
        each — the (B, window) input buffers are consumed batch by batch.
        """
        out = []
        for i in range(0, len(starts), self.batch_windows):
            chunk_starts = starts[i : i + self.batch_windows]
            wins = np.stack([audio[s : s + self.window] for s in chunk_starts])
            out.append(self._batched(jnp.asarray(wins)))
        return np.concatenate([np.asarray(o) for o in out], axis=0)

    # ------------------------------------------------------------ public ---

    def detect(self, audio: np.ndarray, sample_rate: int) -> StreamingResult:
        """Sliding-window localization over a mono array."""
        audio = np.asarray(audio, dtype=np.float32)
        if audio.ndim == 2:
            audio = audio.mean(axis=1)
        if sample_rate != self.sr:
            from aware_tpu.ops.resample import resample

            audio = np.asarray(resample(jnp.asarray(audio), sample_rate, self.sr))
        if len(audio) < self.window:
            audio = np.pad(audio, (0, self.window - len(audio)))
        starts = np.arange(0, len(audio) - self.window + 1, self.hop)
        values = self._values_for_windows(audio, starts)
        conf = np.mean(np.abs(values), axis=1)

        segments: list[Segment] = []
        rejected = 0
        det = self.detector
        # group hit windows, bridging gaps of <= merge_gap misses
        groups: list[list[int]] = []
        for idx in np.flatnonzero(conf > self.threshold):
            if groups and idx - groups[-1][-1] <= self.merge_gap + 1:
                groups[-1].append(int(idx))
            else:
                groups.append([int(idx)])
        for g in groups:
            run_conf = float(np.max(conf[g]))
            # confirmation: a short group must clear the strong bar
            if len(g) < self.min_run and run_conf < self.strong_threshold:
                rejected += 1
                continue
            seg_vals = values[g]  # hit windows only — bridged dips carry
            # no usable signal and would dilute the vote
            # majority-vote bits weighted by |value| across the group
            merged = np.sum(np.sign(seg_vals) * np.abs(seg_vals), axis=0)
            bits = decode_pattern(merged, det.pattern_mode, det.threshold)
            agreement = float(
                np.mean(np.sign(seg_vals) == np.sign(merged))
            )
            segments.append(
                Segment(
                    start_seconds=float(starts[g[0]]) / self.sr,
                    end_seconds=float(starts[g[-1]] + self.window) / self.sr,
                    confidence=run_conf,
                    bits=bits,
                    n_windows=len(g),
                    bit_agreement=agreement,
                )
            )
        return StreamingResult(
            window_starts=starts / self.sr,
            confidences=conf,
            values=values,
            threshold=self.threshold,
            segments=segments,
            rejected_segments=rejected,
        )

    def detect_file(self, path: str) -> StreamingResult:
        """Localization over a WAV file (native reader when available)."""
        from aware_tpu.native import read_wav

        audio, sr = read_wav(path)
        return self.detect(audio, sr)

    def detect_global(self, audio: np.ndarray, sample_rate: int) -> np.ndarray:
        """One mesh-sharded detection over the WHOLE file (requires a mesh;
        per-device memory O(L / n_devices)).  Returns decoded bits."""
        if self.mesh is None:
            raise ValueError("detect_global requires a mesh")
        from aware_tpu.parallel.streaming import streaming_detect_values

        audio = np.asarray(audio, dtype=np.float32)
        if audio.ndim == 2:
            audio = audio.mean(axis=1)
        if sample_rate != self.sr:
            from aware_tpu.ops.resample import resample

            audio = np.asarray(resample(jnp.asarray(audio), sample_rate, self.sr))
        values = np.asarray(
            streaming_detect_values(
                self.detector.params, jnp.asarray(audio), self.detector.cfg,
                self.mesh,
            )
        )
        return decode_pattern(
            values, self.detector.pattern_mode, self.detector.threshold
        )


def detect_watermark_streaming(
    audio: np.ndarray,
    sample_rate: int,
    detector: AWAREDetector,
    window_seconds: float = 2.0,
    hop_seconds: float = 1.0,
    threshold: float | str = "auto",
) -> StreamingResult:
    """One-call sliding-window localization (see StreamingDetector)."""
    return StreamingDetector(
        detector,
        window_seconds=window_seconds,
        hop_seconds=hop_seconds,
        threshold=threshold,
    ).detect(audio, sample_rate)
