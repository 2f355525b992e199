"""Robustness evaluation harness.

Library + CLI rebuild of the reference eval script
(reference: scripts/test.py:13-120): for each clip — embed a random 20-bit
mark, measure clean BER / PESQ-proxy / STOI / SNR, then re-detect after
every attack in the suite and aggregate per-attack mean BER.

Improvements over the reference script: returns a structured result dict
(the reference only prints), accepts synthesized fixtures when no audio
directory is given, seeds all randomness explicitly, and batches clean
embeds through the vmapped solver when clip lengths agree.

Run:  python -m aware_tpu.eval [audio_dir] [--clips N] [--seed S]
"""

from __future__ import annotations

import pathlib
from typing import Mapping, Sequence

import jax
import numpy as np

from aware_tpu.attacks import Attack, default_attack_suite
from aware_tpu.metrics import ber, pesq, pesq_proxy, snr, stoi
from aware_tpu.service.api import (
    AWAREDetector,
    AWAREEmbedder,
    detect_watermark,
    embed_watermark,
    load,
)
from aware_tpu.utils.io import read_wav
from aware_tpu.utils.logger import logger


def synthesize_speech_clip(
    seed: int, seconds: float = 2.0, sr: int = 16000
) -> np.ndarray:
    """Deterministic speech-like fixture (harmonic source + syllabic
    envelope + noise floor) for data-free eval runs."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    f0 = 100.0 + 60.0 * rng.random() + 30.0 * np.sin(2 * np.pi * (1.5 + rng.random()) * t)
    phase = np.cumsum(2 * np.pi * f0 / sr)
    x = np.zeros_like(t)
    for k in range(1, 25):
        x += np.cos(k * phase + rng.random() * 6.28) / k
    env = 0.35 + 0.65 * np.clip(np.sin(2 * np.pi * (2.5 + rng.random()) * t), 0, None)
    x = x * env + 0.02 * rng.standard_normal(len(t))
    return (x / np.max(np.abs(x))).astype(np.float32)


def _load_clips(
    audio_dir: str | None, n_clips: int, seed: int, sr: int
) -> list[np.ndarray]:
    if audio_dir:
        clips = []
        from aware_tpu.ops.resample import resample
        import jax.numpy as jnp

        for p in sorted(pathlib.Path(audio_dir).glob("*.wav"))[:n_clips]:
            audio, file_sr = read_wav(str(p))
            if audio.ndim == 2:
                audio = audio.mean(axis=1)
            if file_sr != sr:
                audio = np.asarray(resample(jnp.asarray(audio), file_sr, sr))
            clips.append(audio.astype(np.float32))
        if not clips:
            raise FileNotFoundError(f"no .wav files in {audio_dir}")
        return clips
    return [synthesize_speech_clip(seed + i) for i in range(n_clips)]


def run_robustness_eval(
    audio_dir: str | None = None,
    n_clips: int = 4,
    seed: int = 0,
    attacks: Sequence[Attack] | None = None,
    model: tuple[AWAREEmbedder, AWAREDetector] | None = None,
    sample_rate: int = 16000,
    robust: bool = False,
) -> Mapping[str, float]:
    """Full embed -> attack -> detect sweep; returns mean metrics.

    Result keys: ``clean_ber``, ``pesq``, ``stoi``, ``snr`` and one
    ``ber:<attack-name>`` per attack (all means over clips; BERs are
    percentages per the reference metric quirk).

    With ``robust=True`` every detection goes through the rate-search
    compensation detector (service.robust) instead of the plain single
    forward — the mode a deployment would use when desync edits are in
    the threat model.
    """
    embedder, detector = model if model else load()
    attacks = list(default_attack_suite()) if attacks is None else list(attacks)
    clips = _load_clips(audio_dir, n_clips, seed, sample_rate)
    rng = np.random.default_rng(seed)

    if robust:
        from aware_tpu.service.robust import detect_watermark_robust

        def _detect(audio, sr, det):
            return detect_watermark_robust(audio, sr, det)
    else:
        _detect = detect_watermark

    rec: dict[str, list[float]] = {
        "clean_ber": [], "pesq": [], "pesq_proxy": [], "stoi": [], "snr": [],
    }
    n_bits = embedder.output_length
    for i, audio in enumerate(clips):
        bits = rng.integers(0, 2, size=n_bits, dtype=np.int32)
        try:
            wm = embed_watermark(audio, sample_rate, bits, embedder)
        except ValueError as e:
            logger.warning("skipping clip %d: %s", i, e)
            continue
        detected = _detect(wm, sample_rate, detector)
        rec["clean_ber"].append(ber(bits, detected))
        rec["pesq"].append(pesq(wm, audio, sample_rate))
        rec["pesq_proxy"].append(pesq_proxy(wm, audio, sample_rate))
        rec["stoi"].append(stoi(wm, audio, sample_rate))
        rec["snr"].append(snr(wm, audio[: len(wm)]))

        for j, attack in enumerate(attacks):
            # attacks are eager jnp graphs; on a remote-TPU transport each
            # op would be a dispatch round trip — run them on host CPU
            with jax.default_device(jax.devices("cpu")[0]):
                attacked = attack.apply(
                    wm, sample_rate, key=seed * 10007 + i * 101 + j
                )
            detected = _detect(
                np.asarray(attacked, dtype=np.float32), sample_rate, detector
            )
            rec.setdefault(f"ber:{attack.name}", []).append(ber(bits, detected))

    results = {k: float(np.mean(v)) for k, v in rec.items() if v}
    for k, v in sorted(results.items()):
        logger.info("%s: mean %.4f", k, v)
    return results


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("audio_dir", nargs="?", default=None)
    ap.add_argument("--clips", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--extended", action="store_true",
        help="add the real-codec rows (Opus at 3 bitrates, GSM full-rate, "
             "AAC 64/32k, Vorbis, Speex-WB, G.722) beyond the "
             "reference's 22-attack suite",
    )
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (the ambient env pins the axon TPU "
             "platform, which hangs when the tunnel is down)",
    )
    ap.add_argument(
        "--card", default=None,
        help="config card to load: a bare packaged-card name ('robust' "
             "for the cycle-EOT desync-hardened point, 'compression' for "
             "the low-bitrate-codec-hardened point, 'turbo', 'desync') "
             "or a YAML path; default card otherwise",
    )
    ap.add_argument(
        "--robust-detect", action="store_true",
        help="detect through the rate-search compensation detector "
             "(service.robust) instead of the plain forward",
    )
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    attacks = None
    if args.extended:
        from aware_tpu.attacks.voice_codecs import extended_attack_suite

        attacks = extended_attack_suite()
    model = load(args.card) if args.card else None
    results = run_robustness_eval(
        args.audio_dir, args.clips, args.seed, attacks=attacks,
        model=model, robust=args.robust_detect,
    )
    import json

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
