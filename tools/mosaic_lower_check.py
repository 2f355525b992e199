"""AOT Mosaic lowering gate — catches TPU kernel lowering regressions on CPU.

The CPU test suite runs every Pallas kernel in interpret mode, which skips
Mosaic lowering entirely; a kernel edit can pass the whole suite yet fail
to lower on the real chip (round-5 example: jax 0.9.0 Mosaic rejects
strided sublane slices with "Shape mismatch in input, indices and output"
— the round-4 AvgPool strided-add form broke every chip program while
tests stayed green).  This tool lowers each kernel program for the `tpu`
platform via jax's cross-platform AOT path (`.trace(...).lower(...)`),
which runs the full Mosaic module build without needing a device.

Run on CPU (no chip, no tunnel):  python tools/mosaic_lower_check.py
Exits nonzero and prints the failing program + error on any regression.
"""

import importlib.util
import os
import pathlib
import sys
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parent.parent


def _force_mosaic():
    """Disable interpret mode in every kernel module so pallas_call traces
    lower through the real Mosaic path."""
    from aware_tpu.ops.pallas import (
        analysis_detector as m_ad,
        detector as m_det,
        iteration as m_it,
        ola_norm as m_ola,
        roundtrip as m_rt,
        roundtrip_tiled as m_rtt,
    )

    for mod in (m_ad, m_det, m_it, m_ola, m_rt, m_rtt):
        mod._use_interpret = lambda: False


def _lower(fn, *args, **kwargs):
    traced = jax.jit(fn, **kwargs).trace(*args)
    traced.lower(lowering_platforms=("tpu",))


def _speechlike() -> np.ndarray:
    rng = np.random.default_rng(1234)
    sr = 16000
    t = np.arange(2 * sr) / sr
    f0 = 120.0 + 30.0 * np.sin(2 * np.pi * 2.3 * t)
    x = np.zeros_like(t)
    phase = np.cumsum(2 * np.pi * f0 / sr)
    for k in range(1, 25):
        x += np.cos(k * phase) / k
    env = 0.4 + 0.6 * np.clip(np.sin(2 * np.pi * 3.1 * t), 0, None)
    x = x * env + 0.02 * rng.standard_normal(len(t))
    return (x / np.max(np.abs(x))).astype(np.float32)


def main() -> int:
    _force_mosaic()

    from aware_tpu.config import AwareConfig, in_band_bins
    from aware_tpu.models import init_params
    from aware_tpu.ops.mel import mel_filter_bank
    from aware_tpu.ops.pallas.detector import (
        P_BAND,
        detector_fused,
        fused_detector_consts,
    )
    from aware_tpu.ops.pallas.analysis_detector import analysis_detector
    from aware_tpu.ops.pallas.iteration import (
        iteration_forward,
        iteration_step,
    )
    from aware_tpu.ops.pallas.roundtrip import synth_norm

    cfg = AwareConfig()
    net = cfg.detection_net
    lo, hi = in_band_bins(net.sample_rate, net.n_fft, cfg.embedding_bands)
    nb = hi - lo
    params = {k: jnp.asarray(v) for k, v in init_params(net).items()}
    rng = np.random.default_rng(7)

    checks: list[tuple[str, object]] = []

    # --- standalone fused detector fwd + vjp --------------------------
    t_frames = 126
    basis = mel_filter_bank(net.sample_rate, net.n_fft, net.n_mels)
    dc = fused_detector_consts(params, basis, lo, hi, t_frames)
    cs = np.zeros((t_frames, 2 * P_BAND), np.float32)
    cs[:, :nb] = rng.standard_normal((t_frames, nb)) * 0.1
    cs[:, P_BAND : P_BAND + nb] = rng.standard_normal((t_frames, nb)) * 0.1
    cs = jnp.asarray(cs)
    g20 = jnp.asarray(rng.standard_normal(20).astype(np.float32))
    checks.append(
        ("detector_fused fwd", lambda: _lower(lambda c: detector_fused(c, dc), cs))
    )
    checks.append(
        (
            "detector_fused vjp",
            lambda: _lower(
                lambda c, gg: jax.vjp(lambda cc: detector_fused(cc, dc), c)[1](gg),
                cs,
                g20,
            ),
        )
    )

    # --- megakernel + two-kernel composition (make_problem geometry) --
    spec = importlib.util.spec_from_file_location(
        "titer", REPO / "tests" / "test_iteration.py"
    )
    titer = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(titer)
    c, ct = titer.make_problem(params, _speechlike())

    checks.append(
        (
            "iteration_forward fwd+vjp",
            lambda: _lower(
                lambda v, gg: jax.vjp(lambda x: iteration_forward(x, c), v)[1](gg),
                ct,
                g20,
            ),
        )
    )
    checks.append(
        (
            "synth_norm+analysis_detector fwd+vjp",
            lambda: _lower(
                lambda v, gg: jax.vjp(
                    lambda x: analysis_detector(
                        synth_norm(x, c.csin, c.y_const, c.env, c.ab, c.abt),
                        c.pads,
                        c.csw,
                        c.cswt,
                        c.det,
                    ),
                    v,
                )[1](gg),
                ct,
                g20,
            ),
        )
    )

    # --- whole-step solver kernel --------------------------------------
    n_bits = 20
    bits = rng.integers(0, 2, n_bits)
    wm_pad = (
        jnp.zeros((1, 128), jnp.float32)
        .at[0, :n_bits]
        .set(jnp.asarray((2 * bits - 1).astype(np.float32)))
    )
    delta = ct * (10.0 ** (-6.0 / 20.0))
    lower_b = jnp.maximum(ct - delta, 0.0)
    upper_b = ct + delta
    one = jnp.full((1, 1), 0.1, jnp.float32)
    checks.append(
        (
            "iteration_step (whole-step kernel)",
            lambda: _lower(
                lambda *a: iteration_step(
                    *a, c, b1=0.9, b2=0.999, eps=1e-8, n_bits=n_bits
                ),
                ct,
                jnp.zeros_like(ct),
                jnp.zeros_like(ct),
                ct,
                wm_pad,
                lower_b,
                upper_b,
                one,
                one,
                one,
                jnp.full((1, 1), jnp.inf, jnp.float32),
            ),
        )
    )

    # --- tiled long-clip kernels, vmapped (bench 60 s row shape) -------
    from aware_tpu.ops.pallas.roundtrip_tiled import (
        band_analysis_tiled,
        build_tiled_bases,
        synth_norm_tiled,
    )

    n_fft, hop = net.n_fft, net.n_fft // 4
    p_t = -(-nb // 128) * 128
    t_l, b_l = 1300, 2  # > the 1024-frame whole-clip bound
    ab_t = np.zeros((2 * p_t, n_fft), np.float32)
    ab_t[:nb] = rng.standard_normal((nb, n_fft)) * 0.05
    csw_t = np.zeros((n_fft, 2 * p_t), np.float32)
    csw_t[:, :nb] = rng.standard_normal((n_fft, nb)) * 0.05
    tb = build_tiled_bases(ab_t, csw_t)
    cts = jnp.asarray(
        rng.standard_normal((b_l, t_l, p_t)).astype(np.float32) * 0.1
    )
    csinps = jnp.asarray(
        rng.standard_normal((b_l, t_l + 3, 2 * p_t)).astype(np.float32)
    )
    ycs = jnp.asarray(
        rng.standard_normal((b_l, t_l - 1, hop)).astype(np.float32) * 0.01
    )
    env_t = jnp.asarray(
        (1.0 + rng.random((t_l - 1, hop))).astype(np.float32)
    )

    def _tiled_rt(ct, csinp, yc):
        y2 = synth_norm_tiled(ct, csinp, yc, env_t, tb["w_sf"], tb["w_sb"])
        return band_analysis_tiled(y2, tb["w_af"], tb["w_ab"])

    def _tiled_loss(ct, csinp, yc):
        return jnp.sum(_tiled_rt(ct, csinp, yc) ** 2)

    checks.append(
        (
            "tiled roundtrip vmapped fwd (60s bench shape)",
            lambda: _lower(jax.vmap(_tiled_rt), cts, csinps, ycs),
        )
    )
    checks.append(
        (
            "tiled roundtrip vmapped grad",
            lambda: _lower(jax.vmap(jax.grad(_tiled_loss)), cts, csinps, ycs),
        )
    )

    failed = []
    for name, thunk in checks:
        try:
            thunk()
            print(f"PASS  {name}")
        except Exception:
            failed.append(name)
            print(f"FAIL  {name}")
            traceback.print_exc(limit=6)
    if failed:
        print(f"\n{len(failed)}/{len(checks)} programs FAILED Mosaic lowering:")
        for name in failed:
            print(f"  - {name}")
        return 1
    print(f"\nall {len(checks)} programs lower to Mosaic cleanly")
    return 0


if __name__ == "__main__":
    sys.exit(main())
