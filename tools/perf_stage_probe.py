"""Which half of the solver iteration degrades at large batch? (chip probe)

Builds three scan-wrapped value_and_grad objectives per batch size:

  roundtrip  — coeffs -> DFT matmul -> OLA/norm -> re-analysis matmul ->
               safe-magnitude (no detector)
  detector   — banded magnitude -> mel -> conv stack -> BRH loss
  full       — the real embed objective (both halves)

Each is iterated K times inside one jit (carry += tiny*grad so iterations
are data-dependent like the real solver), timed at two K values, and the
marginal per-iteration per-clip ms is reported.  Comparing B=16 vs B=128
per stage pins the scaling loss to one half.

Run: python tools/perf_stage_probe.py [--batches 16 128]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[16, 128])
    ap.add_argument("--iters", type=int, nargs=2, default=[50, 150])
    args = ap.parse_args()
    n1, n2 = args.iters

    import jax
    import jax.numpy as jnp

    from bench import make_clips
    from aware_tpu.config import AwareConfig, in_band_bins
    from aware_tpu.embed.solver import build_problem
    from aware_tpu.models import init_params
    from aware_tpu.models.detector import _precision, detector_apply_banded
    from aware_tpu.ops.resample import resample_poly
    from aware_tpu.ops.stft import (
        irfft_basis,
        istft_synthesis,
        magphase,
        peak_normalize,
        rfft_basis,
        safe_magnitude,
        stft,
        stft_frames,
    )
    from aware_tpu.ops.windows import get_window

    cfg = AwareConfig().replace(matmul_precision="default", scan_unroll=2)
    params = {k: jnp.asarray(v) for k, v in init_params(cfg.detection_net).items()}
    n_fft, hop = cfg.frame_length, cfg.hop_length
    window = get_window(cfg.window, cfg.win_length)
    lo, hi = in_band_bins(cfg.detection_net.sample_rate, n_fft, cfg.embedding_bands)
    nb = hi - lo
    prec = _precision(cfg.matmul_precision)
    net_cfg = cfg.detection_net

    A, Bm = irfft_basis(n_fft)
    C, S = rfft_basis(n_fft)
    wvec = window.astype(np.float32)
    Aw = jnp.asarray(A * wvec[None, :])
    Bw = jnp.asarray(Bm * wvec[None, :])
    CS_in = jnp.asarray(np.concatenate([C[:, lo:hi], S[:, lo:hi]], axis=1))
    AB_in = jnp.concatenate([Aw[lo:hi], Bw[lo:hi]], axis=0)

    def prep(audio16):
        x = peak_normalize(audio16)
        mag, phase = magphase(stft(x, n_fft, hop, window))
        cos_in, sin_in = jnp.cos(phase[lo:hi]), jnp.sin(phase[lo:hi])
        re_full, im_full = mag * jnp.cos(phase), mag * jnp.sin(phase)
        frames_const = (
            jnp.matmul(re_full[:lo].T, Aw[:lo], precision=prec)
            + jnp.matmul(re_full[hi:].T, Aw[hi:], precision=prec)
            + jnp.matmul(im_full[:lo].T, Bw[:lo], precision=prec)
            + jnp.matmul(im_full[hi:].T, Bw[hi:], precision=prec)
        )
        return mag[lo:hi], cos_in, sin_in, frames_const

    def roundtrip_m2(coeffs, cos_in, sin_in, frames_const):
        reim = jnp.concatenate([coeffs * cos_in, coeffs * sin_in], axis=0)
        frames = frames_const + jnp.matmul(reim.T, AB_in, precision=prec)
        y2 = peak_normalize(
            peak_normalize(istft_synthesis(frames, n_fft, hop, window))
        )
        fr2 = stft_frames(y2, n_fft, hop, window)
        cs2 = jnp.matmul(fr2, CS_in, precision=prec)
        return safe_magnitude(cs2[:, :nb], cs2[:, nb:]).T

    def stage_objectives(wm):
        def obj_roundtrip(coeffs, aux):
            cos_in, sin_in, frames_const = aux
            m2 = roundtrip_m2(coeffs, cos_in, sin_in, frames_const)
            return jnp.sum(m2 * m2)

        def obj_detector(m2_in, aux):
            pred = detector_apply_banded(
                params, m2_in, lo, hi, net_cfg, cfg.matmul_precision
            )
            return jnp.mean((pred - wm) ** 2)

        def obj_full(coeffs, aux):
            cos_in, sin_in, frames_const = aux
            m2 = roundtrip_m2(coeffs, cos_in, sin_in, frames_const)
            pred = detector_apply_banded(
                params, m2, lo, hi, net_cfg, cfg.matmul_precision
            )
            return jnp.mean((pred - wm) ** 2)

        return {"roundtrip": obj_roundtrip, "detector": obj_detector,
                "full": obj_full}

    results = []
    for batch in args.batches:
        clips44 = jnp.asarray(make_clips(batch))
        audio16 = jax.jit(lambda a: resample_poly(a, 160, 441))(clips44)
        rng = np.random.default_rng(7)
        wm = jnp.asarray(
            (2 * rng.integers(0, 2, size=(batch, 20)) - 1).astype(np.float32)
        )
        band0, cos_in, sin_in, frames_const = jax.jit(jax.vmap(prep))(audio16)
        aux = (cos_in, sin_in, frames_const)

        row = {"batch": batch}
        for name in ("roundtrip", "detector", "full"):

            def make_run(n, name=name):
                def run_one(x0, aux_i, wm_i):
                    obj = stage_objectives(wm_i)[name]
                    g = jax.grad(obj)

                    def body(c, _):
                        return c - 1e-6 * g(c, aux_i), None

                    out, _ = jax.lax.scan(body, x0, None, length=n,
                                          unroll=cfg.scan_unroll)
                    return jnp.sum(out)

                return jax.jit(
                    lambda x0, aux_b, wm_b, eps: jnp.sum(
                        jax.vmap(run_one)(
                            jax.tree.map(lambda a: a * (1 + eps), x0),
                            aux_b, wm_b)
                    )
                )

            t_at = {}
            for n in (n1, n2):
                fn = make_run(n)
                x0 = band0
                _ = np.asarray(fn(x0, aux, wm, jnp.float32(0.0)))
                times = []
                for r in range(3):
                    t0 = time.time()
                    _ = np.asarray(fn(x0, aux, wm, jnp.float32(1e-6 * (r + 1))))
                    times.append(time.time() - t0)
                t_at[n] = min(times)
            per_iter = (t_at[n2] - t_at[n1]) / (n2 - n1) / batch * 1e3
            row[name + "_ms_per_iter_clip"] = round(per_iter, 4)
            print(f"B={batch} {name}: {per_iter:.4f} ms/iter/clip "
                  f"(t{n1}={t_at[n1]:.3f}s t{n2}={t_at[n2]:.3f}s)",
                  file=sys.stderr, flush=True)
        results.append(row)

    (ROOT / "PERF_STAGE_PROBE.json").write_text(
        json.dumps(results, indent=2) + "\n"
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
