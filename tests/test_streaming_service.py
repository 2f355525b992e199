"""Streaming service surface: sliding-window localization + mesh-global
detection + CLI (service/streaming.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aware_tpu import load
from aware_tpu.eval.harness import synthesize_speech_clip
from aware_tpu.models.detector import detect_values
from aware_tpu.service.streaming import StreamingDetector

BITS = np.array([1, 0, 1, 1, 0, 0, 1, 0, 1, 1, 0, 1, 0, 0, 1, 1, 1, 0, 0, 1])


@pytest.fixture(scope="module")
def marked_long_clip():
    """20 s carrier with a 2 s watermarked span starting at t=9 s."""
    embedder, detector = load(num_iterations=120)
    carrier = np.concatenate(
        [synthesize_speech_clip(50 + i) for i in range(10)]
    )  # 10 x 2 s unwatermarked speech
    seg = synthesize_speech_clip(99)
    wm = embedder.embed(seg, 16000, (2 * BITS - 1).astype(np.float32))
    start = 9 * 16000
    long_clip = carrier.copy()
    # match the marked span's level to its surroundings
    wm = wm * (np.max(np.abs(carrier[start : start + len(wm)])) + 1e-9)
    long_clip[start : start + len(wm)] = wm
    return long_clip, detector, start / 16000.0, len(wm) / 16000.0


def test_localizes_watermarked_span(marked_long_clip):
    long_clip, detector, t0, dur = marked_long_clip
    sd = StreamingDetector(detector, window_seconds=2.0, hop_seconds=0.5)
    res = sd.detect(long_clip, 16000)
    assert res.detected, f"no segment found (thr {res.threshold:.3f})"
    best = max(res.segments, key=lambda s: s.confidence)
    # the reported segment overlaps the true span
    assert best.start_seconds < t0 + dur and best.end_seconds > t0
    # the peak-confidence window decodes the embedded bits
    assert np.array_equal(np.asarray(best.bits).astype(int), BITS)


def test_null_clip_not_detected(marked_long_clip):
    _, detector, _, _ = marked_long_clip
    sd = StreamingDetector(detector, window_seconds=2.0, hop_seconds=1.0)
    null = np.concatenate([synthesize_speech_clip(200 + i) for i in range(5)])
    res = sd.detect(null, 16000)
    assert not res.detected


def test_mesh_global_matches_single_device(marked_long_clip):
    _, detector, _, _ = marked_long_clip
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("seq",))
    sd = StreamingDetector(detector, mesh=mesh, threshold=0.1)
    # a fully-watermarked long stream: global detect reads the bits
    embedder, _ = load(num_iterations=120)
    clip = synthesize_speech_clip(7, seconds=4.0)
    wm = embedder.embed(clip, 16000, (2 * BITS - 1).astype(np.float32))
    bits = sd.detect_global(wm, 16000)
    single = np.asarray(detect_values(detector.params, jnp.asarray(wm)))
    assert np.array_equal(
        np.asarray(bits).astype(int), (single > 0).astype(int)
    )
    assert np.array_equal(np.asarray(bits).astype(int), BITS)


def _patched_detector(detector, vals):
    """StreamingDetector with synthetic per-window detector outputs, so the
    run-confirmation logic is tested in isolation."""
    sd = StreamingDetector(detector, threshold=0.5, min_run=2)
    sd.strong_threshold = 0.9
    sd._values_for_windows = lambda audio, starts: vals[: len(starts)]
    audio = np.zeros(sd.window + (len(vals) - 1) * sd.hop, np.float32)
    return sd.detect(audio, sd.sr)


def test_confirmation_rejects_isolated_weak_hit(marked_long_clip):
    _, detector, _, _ = marked_long_clip
    vals = np.full((12, 20), 0.01, np.float32)
    vals[1] = 0.6    # isolated hit below the strong bar -> rejected
    vals[7:9] = 0.7  # 2-window run (beyond merge_gap of the hit) -> kept
    res = _patched_detector(detector, vals)
    assert res.rejected_segments == 1
    assert len(res.segments) == 1
    seg = res.segments[0]
    assert seg.n_windows == 2
    assert seg.bit_agreement == 1.0


def test_confirmation_keeps_strong_isolated_hit(marked_long_clip):
    _, detector, _, _ = marked_long_clip
    vals = np.full((10, 20), 0.01, np.float32)
    vals[3] = 0.95  # isolated but unambiguous -> kept
    res = _patched_detector(detector, vals)
    assert res.rejected_segments == 0
    assert len(res.segments) == 1
    assert res.segments[0].n_windows == 1


def test_fragmented_run_bridges_to_one_segment(marked_long_clip):
    """Hit windows <= merge_gap apart merge into ONE segment (a plant
    fragmenting across the threshold must not report as two marks)."""
    _, detector, _, _ = marked_long_clip
    vals = np.full((12, 20), 0.01, np.float32)
    vals[4] = 0.6           # fragment A
    vals[7:9] = 0.7         # fragment B, 2 sub-threshold windows away
    res = _patched_detector(detector, vals)
    assert res.rejected_segments == 0
    assert len(res.segments) == 1
    seg = res.segments[0]
    assert seg.n_windows == 3  # only the hit windows, not the dips
    # span covers fragment A's window through fragment B's last window
    sd_window, sd_hop = 2.0, 1.0
    assert seg.start_seconds == pytest.approx(4 * sd_hop)
    assert seg.end_seconds == pytest.approx(8 * sd_hop + sd_window)


def test_cli_streaming(tmp_path, marked_long_clip):
    long_clip, _, _, _ = marked_long_clip
    from aware_tpu.__main__ import main
    from aware_tpu.utils.io import write_wav

    p = tmp_path / "long.wav"
    write_wav(str(p), long_clip.astype(np.float32), 16000)
    main(["detect", str(p), "--streaming", "--win-hop", "0.5"])
