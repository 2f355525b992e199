"""Real-chip regression tier: Mosaic kernels + fused paths + batch service.

Everything here compiles to real Mosaic/XLA TPU programs — a chip-path
regression (kernel numerics, VMEM blowup, lowering failure) fails THIS
suite even though `pytest tests/` (CPU interpret mode) stays green.

Timing note (CLAUDE.md): `jax.block_until_ready` is unreliable through
the axon tunnel, so every check forces a host transfer via np.asarray.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aware_tpu.config import AwareConfig, in_band_bins

CFG = AwareConfig()
NET = CFG.detection_net
LO, HI = in_band_bins(NET.sample_rate, NET.n_fft, CFG.embedding_bands)
NB = HI - LO


@pytest.fixture(scope="module")
def params():
    from aware_tpu.models import init_params

    return {k: jnp.asarray(v) for k, v in init_params(NET).items()}


# ------------------------------------------------------- detector kernel ---

class TestDetectorKernelOnChip:
    T = 126

    @pytest.fixture(scope="class")
    def consts(self, params):
        from aware_tpu.ops.mel import mel_filter_bank
        from aware_tpu.ops.pallas.detector import fused_detector_consts

        basis = mel_filter_bank(NET.sample_rate, NET.n_fft, NET.n_mels)
        return fused_detector_consts(params, basis, LO, HI, self.T)

    @pytest.fixture(scope="class")
    def cs(self, rng):
        from aware_tpu.ops.pallas.detector import P_BAND

        x = np.zeros((self.T, 2 * P_BAND), np.float32)
        x[:, :NB] = rng.standard_normal((self.T, NB)) * 0.1
        x[:, P_BAND : P_BAND + NB] = (
            rng.standard_normal((self.T, NB)) * 0.1
        )
        return jnp.asarray(x)

    def test_forward_matches_replica(self, cs, consts):
        from aware_tpu.ops.pallas.detector import (
            detector_fused,
            detector_fused_reference,
        )

        got = np.asarray(jax.jit(detector_fused)(cs, consts))
        want = np.asarray(detector_fused_reference(cs, consts))
        # Mosaic MXU accumulation order differs from the XLA replica's;
        # the tanh readout bounds it at ~1e-3 absolute on the chip
        np.testing.assert_allclose(got, want, atol=2e-3)
        # Sign (the bit decision) must agree wherever the replica's value
        # exceeds the kernel readout's bf16 quantization step (2^-9): a
        # sub-quantum value on random (non-embedded) input rounds to +-0
        # and its sign is undefined by design.
        decided = np.abs(want) >= 2e-3
        assert np.array_equal(np.sign(got)[decided], np.sign(want)[decided])

    def test_vjp_matches_replica_autodiff(self, cs, consts, rng):
        from aware_tpu.ops.pallas.detector import (
            detector_fused,
            detector_fused_reference,
        )

        g = jnp.asarray(rng.standard_normal(20).astype(np.float32))
        dk = np.asarray(
            jax.jit(
                lambda c, gg: jax.vjp(
                    lambda cc: detector_fused(cc, consts), c
                )[1](gg)[0]
            )(cs, g)
        )
        _, vr = jax.vjp(
            lambda c: detector_fused_reference(c, consts), cs
        )
        dr = np.asarray(vr(g)[0])
        scale = float(np.max(np.abs(dr)))
        assert float(np.max(np.abs(dk - dr))) / scale < 0.05


# ------------------------------------------------------ roundtrip kernels ---

def test_iteration_megakernel_on_chip(params, speechlike):
    """Mosaic-compiled whole-iteration megakernel == the two-kernel
    composition (synth_norm -> analysis_detector), forward and VJP.
    The CPU suite proves this in interpret mode; this is the compiled
    check (VMEM fit + lowering + numerics)."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "titer",
        pathlib.Path(__file__).parent.parent / "tests" / "test_iteration.py",
    )
    titer = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(titer)

    from aware_tpu.ops.pallas.analysis_detector import analysis_detector
    from aware_tpu.ops.pallas.iteration import iteration_forward
    from aware_tpu.ops.pallas.roundtrip import synth_norm

    c, ct = titer.make_problem(params, speechlike)

    def compose(v):
        y2 = synth_norm(v, c.csin, c.y_const, c.env, c.ab, c.abt)
        return analysis_detector(y2, c.pads, c.csw, c.cswt, c.det)

    got, vm = jax.vjp(jax.jit(lambda v: iteration_forward(v, c)), ct)
    want, vc = jax.vjp(jax.jit(compose), ct)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    g = jnp.asarray(
        np.random.default_rng(48).standard_normal(20).astype(np.float32)
    )
    dm, dc = np.asarray(vm(g)[0]), np.asarray(vc(g)[0])
    scale = np.max(np.abs(dc)) + 1e-12
    np.testing.assert_allclose(dm, dc, atol=1e-5 * scale)


def test_roundtrip_kernels_on_chip(params, speechlike, rng):
    """25-iteration kernel-path embed (roundtrip + detector kernels) on
    the chip: 0 BER readback and loss parity with the XLA slab path."""
    from aware_tpu.embed.solver import embed_one
    from aware_tpu.models.detector import detect_values_jit

    bits = np.random.default_rng(5).integers(0, 2, 20)
    wm = jnp.asarray((2 * bits - 1).astype(np.float32))
    clip = jnp.asarray(speechlike)
    cfg_k = AwareConfig().replace(
        use_pallas_roundtrip=True,
        num_iterations=25,
        matmul_precision="default",
    )
    cfg_s = AwareConfig().replace(
        num_iterations=25, matmul_precision="default"
    )
    rk = embed_one(params, clip, wm, cfg_k)
    rs = embed_one(params, clip, wm, cfg_s)
    vk = np.asarray(detect_values_jit(params, rk.audio))
    assert np.mean((vk > 0).astype(int) != bits) == 0.0
    assert abs(float(rk.best_loss) - float(rs.best_loss)) < 0.02


# --------------------------------------------------------- masked detect ---

def test_masked_forward_equals_unpadded_on_chip(params, rng):
    from aware_tpu.models.detector import (
        detector_apply,
        detector_apply_masked,
        preprocess_magnitude,
    )
    from aware_tpu.ops.windows import get_window

    w = get_window(CFG.window, CFG.win_length)
    x = rng.standard_normal(16000).astype(np.float32)
    mag = preprocess_magnitude(
        jnp.asarray(x), NET.n_fft, CFG.hop_length, w, LO, HI
    )
    t = mag.shape[-1]
    pad = 40
    mp = jnp.pad(mag, ((0, 0), (0, pad)))
    mask = jnp.concatenate([jnp.ones(t), jnp.zeros(pad)])
    got = np.asarray(
        jax.jit(detector_apply_masked, static_argnames=("cfg",))(
            params, mp, mask, NET
        )
    )
    want = np.asarray(
        jax.jit(detector_apply, static_argnames=("cfg",))(params, mag, NET)
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


# ------------------------------------------------------ fused robust grid ---

def test_fused_robust_grid_on_chip(params, speechlike):
    """The multi-lane compensation grid (one dispatched program) recovers
    a resample-desynced clip on the chip."""
    from aware_tpu.embed.solver import embed_one
    from aware_tpu.ops.resample import resample_poly
    from aware_tpu.service.api import AWAREDetector
    from aware_tpu.service.robust import detect_watermark_robust

    bits = np.random.default_rng(7).integers(0, 2, 20)
    wm = jnp.asarray((2 * bits - 1).astype(np.float32))
    cfg = AwareConfig().replace(
        use_pallas_roundtrip=True,
        num_iterations=50,
        matmul_precision="default",
    )
    res = embed_one(params, jnp.asarray(speechlike), wm, cfg)
    sped = np.asarray(resample_poly(res.audio, 21, 20))
    det = AWAREDetector(params=params, cfg=cfg)
    out = detect_watermark_robust(
        sped, 16000, det, rates=(0.9, 0.95, 1.0, 1.05, 1.1),
        stretch_rates=(0.93,), return_confidence=True, refine=False,
    )
    assert float(np.mean(out.bits != bits)) == 0.0
    assert out.kind == "resample"
    assert abs(out.rate - 20 / 21) < 0.06


# --------------------------------------------------------- batch service ---

def test_batch_embed_service_on_chip(params, speechlike):
    """embed_watermark_batch through the kernel path: every lane reads
    back its own pattern at 0 BER."""
    from aware_tpu.service.api import (
        AWAREDetector,
        AWAREEmbedder,
        detect_watermark_batch,
        embed_watermark_batch,
    )

    cfg = AwareConfig().replace(
        use_pallas_roundtrip=True,
        num_iterations=50,
        matmul_precision="default",
    )
    model = AWAREEmbedder(params=params, cfg=cfg)
    det = AWAREDetector(params=params, cfg=cfg)
    rng = np.random.default_rng(9)
    clips = np.stack([speechlike, np.roll(speechlike, 2000)])
    bits = rng.integers(0, 2, (2, 20))
    out = embed_watermark_batch(clips, 16000, bits, model)
    detected = detect_watermark_batch(out, 16000, det)
    assert np.mean(detected != bits) == 0.0


# -------------------------------------------------- tiled long-clip path ---

def test_tiled_kernels_vmapped_on_chip(rng):
    """Batched (custom_vmap -> batch-gridded) tiled round-trip kernels
    compile to Mosaic and match the bf16 XLA slab replica on chip.

    Round-5 regression guard: this exact shape class carried TWO chip-only
    failures the CPU interpret suite could not see — the generic Pallas
    vmap rule producing an ANY-space block spec Mosaic rejects, and the
    VMEM-placed halo'd DMA slice violating 8-row sublane tiling."""
    from aware_tpu.ops.pallas.roundtrip_tiled import (
        HALO,
        R,
        band_analysis_tiled,
        build_tiled_bases,
        make_csinp,
        synth_norm_tiled,
    )

    n_fft, hop, p = 1024, 256, 256
    t, b = 1300, 2  # > the 1024-frame whole-clip bound
    lr = t - 1
    ab_np = np.zeros((2 * p, n_fft), np.float32)
    ab_np[:NB] = rng.standard_normal((NB, n_fft)) * 0.05
    ab_np[p : p + NB] = rng.standard_normal((NB, n_fft)) * 0.05
    csw_np = np.zeros((n_fft, 2 * p), np.float32)
    csw_np[:, :NB] = rng.standard_normal((n_fft, NB)) * 0.05
    csw_np[:, p : p + NB] = rng.standard_normal((n_fft, NB)) * 0.05
    tb = build_tiled_bases(ab_np, csw_np)
    coeffs = rng.standard_normal((b, NB, t)).astype(np.float32) * 0.1
    cos = np.cos(rng.uniform(-np.pi, np.pi, (b, NB, t))).astype(np.float32)
    sin = np.sqrt(np.maximum(1 - cos**2, 0)).astype(np.float32)
    yconst = rng.standard_normal((b, lr, hop)).astype(np.float32) * 0.01
    env = (1.0 + rng.random((lr, hop))).astype(np.float32)

    cts = jnp.zeros((b, t, p), jnp.float32).at[:, :, :NB].set(
        jnp.asarray(coeffs).transpose(0, 2, 1)
    )
    csinps = jnp.stack(
        [make_csinp(jnp.asarray(cos[i]), jnp.asarray(sin[i]), p)
         for i in range(b)]
    )
    ycs, envj = jnp.asarray(yconst), jnp.asarray(env)

    def rt(ct, csinp, yc):
        y2 = synth_norm_tiled(ct, csinp, yc, envj, tb["w_sf"], tb["w_sb"])
        return band_analysis_tiled(y2, tb["w_af"], tb["w_ab"])

    got = np.asarray(jax.jit(jax.vmap(rt))(cts, csinps, ycs))

    # bf16 XLA slab replica (same operand casts as the kernels)
    ab = jnp.asarray(ab_np, jnp.bfloat16)
    csw = jnp.asarray(csw_np, jnp.bfloat16)

    def replica(i):
        reim = jnp.concatenate(
            [jnp.asarray(coeffs[i]) * cos[i], jnp.asarray(coeffs[i]) * sin[i]],
            axis=0,
        ).T
        reimp = jnp.zeros((t, 2 * p)).at[:, :NB].set(reim[:, :NB])
        reimp = reimp.at[:, p : p + NB].set(reim[:, NB:]).astype(jnp.bfloat16)
        yd = jnp.zeros((t + R - 1, hop))
        for k in range(R):
            yd = yd.at[k : k + t].add(
                jnp.dot(reimp, ab[:, k * hop : (k + 1) * hop],
                        preferred_element_type=jnp.float32)
            )
        u = yd[HALO - 1 : HALO - 1 + lr] / envj + ycs[i]
        m1 = jnp.max(jnp.abs(u))
        y2 = u / (m1 * (1 + 1e-8) + 1e-16)
        yp = jnp.zeros((t + R - 1, hop)).at[HALO - 1 : HALO - 1 + lr].set(y2)
        out = 0
        for k in range(R):
            out = out + jnp.dot(
                yp[k : k + t].astype(jnp.bfloat16),
                csw[k * hop : (k + 1) * hop],
                preferred_element_type=jnp.float32,
            )
        return out

    want = np.stack(
        [np.asarray(jax.jit(replica, static_argnums=0)(i)) for i in range(b)]
    )
    # atol headroom over the interpret-mode suite: on chip the kernel's
    # f32 accumulation order differs from XLA's (measured worst case
    # 2.7e-4 over 1.3M elements on O(1) outputs)
    np.testing.assert_allclose(got, want, atol=8e-4, rtol=1e-3)


def test_long_clip_batch_embed_on_chip(params, speechlike):
    """A >16 s batched embed runs through the TILED kernel path (the 60 s
    bench row program class) end-to-end on chip at 0 BER."""
    from aware_tpu.embed import embed_batch
    from aware_tpu.models.detector import detect_values_jit

    cfg = AwareConfig().replace(
        use_pallas_roundtrip=True,
        num_iterations=50,
        matmul_precision="default",
    )
    clip = np.tile(speechlike, 10)  # 20 s @ 16 kHz -> T=1251 > 1024
    clips = jnp.asarray(np.stack([clip, np.roll(clip, 4000)]))
    rng = np.random.default_rng(11)
    bits = rng.integers(0, 2, (2, 20))
    wms = jnp.asarray((2 * bits - 1).astype(np.float32))
    res = embed_batch(params, clips, wms, cfg)
    audio = np.asarray(res.audio)
    for i in range(2):
        vals = np.asarray(detect_values_jit(params, jnp.asarray(audio[i])))
        assert np.mean((vals > 0).astype(int) != bits[i]) == 0.0


def test_ecc_message_roundtrip_on_chip(params, speechlike):
    """The round-5b message layer on the real chip: a 1-byte payload
    encoded through the [20,8] soft-decision code, embedded by the
    kernel-path solver, ML-decoded from on-chip detector values with a
    significant presence p-value."""
    from aware_tpu.service.api import AWAREDetector, AWAREEmbedder
    from aware_tpu.service.api import embed_watermark
    from aware_tpu.service.ecc import detect_message, encode_message

    cfg = AwareConfig().replace(
        use_pallas_roundtrip=True,
        num_iterations=50,
        matmul_precision="default",
    )
    model = AWAREEmbedder(params=params, cfg=cfg)
    det = AWAREDetector(params=params, cfg=cfg)
    msg = np.array([1, 0, 1, 1, 0, 1, 0, 0], dtype=np.int32)
    wm = embed_watermark(speechlike, 16000, encode_message(msg), model)
    res = detect_message(np.asarray(wm), 16000, det, k=8)
    assert (res.msg_bits == msg).all()
    assert res.pvalue < 1e-2, res
