"""Decoder A/B at the opus_8k frontier: reliability-weighted ML decode.

The voice/compression cards leave opus_8k at ~19-25% raw slot BER — a
per-slot capacity limit at the embed side.  This probes the DECODE side:
detecting the first and second half of the clip separately gives two
noisy reads per slot; their disagreement estimates per-slot noise, which
an ML decoder can exploit (Gaussian ML with unequal variances weights
slots by 1/sigma_i^2).  Arms:

  A  plain ML on the full-clip values            (shipped decode_message)
  B  ML on the two half reads summed             (decode_message_windows)
  C  full-clip values weighted by 1/(eps+(v1-v2)^2)
  D  half-sum weighted the same way

Embeds once per clip (k=8 codewords), attacks each clip with several
independent opus_8k keys for sample size.  Writes ECC_DECODER_AB.json;
if a weighted arm wins by a clear margin it ships in service/ecc.py.

Run: python tools/ecc_decoder_ab.py --cpu --card compression --clips 8 --reps 4
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--clips", type=int, default=8)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--card", default="compression")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--attack", default="opus_8k",
                    choices=["opus_8k", "gsm_fr"])
    ap.add_argument("--out", default="ECC_DECODER_AB.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from aware_tpu.attacks.voice_codecs import GSMFullRate, OpusCompression
    from aware_tpu.eval.harness import _load_clips
    from aware_tpu.service.api import embed_watermark, load
    from aware_tpu.service.ecc import get_code

    attack = (OpusCompression(8000) if args.attack == "opus_8k"
              else GSMFullRate())
    embedder, detector = load(args.card)
    code = get_code(args.k, embedder.output_length)
    clips = _load_clips(None, args.clips, args.seed, 16000)
    rng = np.random.default_rng(args.seed)

    samples = []  # (msg, v_full, v1, v2) per (clip, rep)
    for i, audio in enumerate(clips):
        msg = rng.integers(0, 2, size=args.k, dtype=np.int32)
        slots = code.encode(msg)
        wm = embed_watermark(audio, 16000, slots, embedder)
        for rep in range(args.reps):
            with jax.default_device(jax.devices("cpu")[0]):
                att = np.asarray(attack.apply(
                    wm, 16000, key=args.seed * 7919 + i * 131 + rep
                ), dtype=np.float32)
            half = len(att) // 2
            samples.append({
                "msg": msg,
                "slots": slots,
                "v": detector.detect(att, 16000),
                "v1": detector.detect(att[:half], 16000),
                "v2": detector.detect(att[half:], 16000),
            })
        print(f"clip {i + 1}/{len(clips)} done", flush=True)

    def ml(values, weights=None):
        w = np.ones_like(values) if weights is None else weights
        scores = code.codebook @ (values * w)
        return ((int(np.argmax(scores)) >> np.arange(args.k)) & 1)

    def weights_from_halves(v1, v2):
        d2 = (v1 - v2) ** 2
        eps = max(float(np.median(d2)), 1e-6)
        w = 1.0 / (eps + d2)
        return w / w.mean()

    arms = {"A_full_ml": 0, "B_halfsum_ml": 0, "C_full_weighted": 0,
            "D_halfsum_weighted": 0}
    raw_ber = []
    for s in samples:
        v, v1, v2, msg = s["v"], s["v1"], s["v2"], s["msg"]
        raw_ber.append(float(np.mean((v > 0).astype(int) != s["slots"])))
        w = weights_from_halves(v1, v2)
        arms["A_full_ml"] += int((ml(v) == msg).all())
        arms["B_halfsum_ml"] += int((ml(v1 + v2) == msg).all())
        arms["C_full_weighted"] += int((ml(v, w) == msg).all())
        arms["D_halfsum_weighted"] += int((ml(v1 + v2, w) == msg).all())

    n = len(samples)
    out = {
        "card": args.card, "attack": args.attack, "k": args.k,
        "clips": args.clips, "reps": args.reps, "n_samples": n,
        "raw_slot_ber_pct": 100.0 * float(np.mean(raw_ber)),
        "msg_success_pct": {a: 100.0 * c / n for a, c in arms.items()},
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
