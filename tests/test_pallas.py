"""Fused OLA/normalize Pallas kernel vs the unfused XLA chain.

Runs in interpreter mode on CPU (the kernel auto-selects); the same code
compiles to Mosaic on TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aware_tpu.config import AwareConfig
from aware_tpu.ops.pallas import ola_normalize
from aware_tpu.ops.stft import istft_synthesis, peak_normalize
from aware_tpu.ops.windows import get_window

N_FFT, HOP = 1024, 256


def _xla_chain(wframes, window):
    return peak_normalize(
        peak_normalize(istft_synthesis(wframes, N_FFT, HOP, window))
    )


@pytest.fixture(scope="module")
def wframes(rng):
    t = 63  # 16k-sample clip
    return jnp.asarray(rng.standard_normal((2, t, N_FFT)).astype(np.float32))


@pytest.fixture(scope="module")
def window():
    return get_window("hann", N_FFT)


def test_forward_matches_xla(wframes, window):
    wkey = tuple(window.tolist())
    ours = np.asarray(ola_normalize(wframes, N_FFT, HOP, wkey))
    for i in range(wframes.shape[0]):
        ref = np.asarray(_xla_chain(wframes[i], window))
        np.testing.assert_allclose(ours[i], ref, atol=1e-6, rtol=1e-6)


def test_gradient_matches_autodiff(wframes, window):
    wkey = tuple(window.tolist())
    probe = jnp.asarray(
        np.random.default_rng(3).standard_normal(
            (wframes.shape[0], (wframes.shape[1] - 1) * HOP)
        ).astype(np.float32)
    )

    def loss_pallas(wf):
        return jnp.sum(ola_normalize(wf, N_FFT, HOP, wkey) * probe)

    def loss_xla(wf):
        return sum(
            jnp.sum(_xla_chain(wf[i], window) * probe[i])
            for i in range(wf.shape[0])
        )

    g_pallas = jax.grad(loss_pallas)(wframes)
    g_xla = jax.grad(loss_xla)(wframes)
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_xla), atol=1e-5, rtol=1e-4
    )


def test_solver_pallas_flag_matches(rng, speechlike):
    """Embed with the Pallas path enabled tracks the XLA path (outcome
    level; the chaotic loop amplifies fp differences)."""
    from aware_tpu.embed import embed_one
    from aware_tpu.models import init_params

    cfg_off = AwareConfig().replace(num_iterations=15, use_pallas_ola=False)
    cfg_on = AwareConfig().replace(num_iterations=15, use_pallas_ola=True)
    params = init_params(cfg_off.detection_net)
    wm = jnp.asarray((rng.integers(0, 2, 20) * 2 - 1).astype(np.float32))
    x = jnp.asarray(speechlike)
    r_off = embed_one(params, x, wm, cfg_off)
    r_on = embed_one(params, x, wm, cfg_on)
    assert abs(float(r_off.best_loss) - float(r_on.best_loss)) < 2e-2
    np.testing.assert_allclose(
        np.asarray(r_on.audio), np.asarray(r_off.audio), atol=1e-1
    )


def test_vmap_compatible(wframes, window):
    wkey = tuple(window.tolist())
    single = lambda wf: ola_normalize(wf[None], N_FFT, HOP, wkey)[0]
    batched = jax.vmap(single)(wframes)
    ref = ola_normalize(wframes, N_FFT, HOP, wkey)
    np.testing.assert_allclose(
        np.asarray(batched), np.asarray(ref), atol=1e-6
    )


# ---------------------------------------------------------------------------
# Fused slab round-trip kernels (ops/pallas/roundtrip.py)
# ---------------------------------------------------------------------------

class TestRoundtripKernels:
    """synth_norm / band_analysis vs bf16-identical pure-jax replicas.

    The kernels cast matmul operands (and, in the VJPs, cotangents) to
    bf16 — the same precision profile as the XLA path's DEFAULT-precision
    MXU matmuls on TPU — so forward comparisons are exact and VJP
    comparisons allow bf16-cotangent rounding.
    """

    T, P, R = 126, 256, 4
    HOP = 256

    @pytest.fixture(scope="class")
    def ops_data(self, rng):
        t, p, hop, r = self.T, self.P, self.HOP, self.R
        nfft = r * hop
        lr = t - 1
        d = {
            "ct": jnp.asarray(rng.standard_normal((t, p)).astype(np.float32)),
            "csin": jnp.asarray(
                rng.standard_normal((t, 2 * p)).astype(np.float32)
            ),
            "yconst": jnp.asarray(
                rng.standard_normal((lr, hop)).astype(np.float32)
            ),
            "env": jnp.asarray(
                (1.0 + rng.random((lr, hop))).astype(np.float32)
            ),
        }
        ab_np = rng.standard_normal((2 * p, nfft)).astype(np.float32)
        csw_np = rng.standard_normal((nfft, 2 * p)).astype(np.float32)
        d["ab"] = jnp.asarray(ab_np, jnp.bfloat16)
        d["abt"] = jnp.asarray(ab_np.T.copy(), jnp.bfloat16)
        d["csw"] = jnp.asarray(csw_np, jnp.bfloat16)
        d["cswt"] = jnp.asarray(csw_np.T.copy(), jnp.bfloat16)
        return d

    def _synth_ref(self, d, c):
        t, p, hop, r = self.T, self.P, self.HOP, self.R
        lr = t - 1
        reim = jnp.concatenate([c * d["csin"][:, :p], c * d["csin"][:, p:]], axis=1)
        rb = reim.astype(jnp.bfloat16)
        yd = jnp.zeros((t + r - 1, hop))
        for k in range(r):
            yd = yd.at[k : k + t].add(
                jnp.dot(rb, d["ab"][:, k * hop : (k + 1) * hop],
                        preferred_element_type=jnp.float32)
            )
        u = yd[r // 2 : r // 2 + lr] / d["env"] + d["yconst"]
        m1 = jnp.max(jnp.abs(u))
        return u / (m1 * (1 + 1e-8) + 1e-16)

    def _ana_ref(self, d, y2):
        t, hop, r = self.T, self.HOP, self.R
        lr = t - 1
        yp = jnp.zeros((t + r - 1, hop)).at[r // 2 : r // 2 + lr].set(y2)
        out = 0
        for k in range(r):
            out = out + jnp.dot(
                yp[k : k + t].astype(jnp.bfloat16),
                d["csw"][k * hop : (k + 1) * hop],
                preferred_element_type=jnp.float32,
            )
        return out

    def test_synth_forward_exact(self, ops_data):
        from aware_tpu.ops.pallas.roundtrip import synth_norm

        d = ops_data
        y2_k = synth_norm(d["ct"], d["csin"], d["yconst"], d["env"],
                          d["ab"], d["abt"])
        y2_r = self._synth_ref(d, d["ct"])
        np.testing.assert_array_equal(np.asarray(y2_k), np.asarray(y2_r))

    def test_analysis_forward_exact(self, ops_data):
        from aware_tpu.ops.pallas.roundtrip import band_analysis

        d = ops_data
        y2 = self._synth_ref(d, d["ct"])
        cs_k = band_analysis(y2, d["csw"], d["cswt"])
        cs_r = self._ana_ref(d, y2)
        np.testing.assert_array_equal(np.asarray(cs_k), np.asarray(cs_r))

    def test_vjps_match_autodiff(self, ops_data, rng):
        from aware_tpu.ops.pallas.roundtrip import band_analysis, synth_norm

        d = ops_data
        g1 = jnp.asarray(
            rng.standard_normal((self.T - 1, self.HOP)).astype(np.float32)
        )
        _, vk = jax.vjp(
            lambda c: synth_norm(c, d["csin"], d["yconst"], d["env"],
                                 d["ab"], d["abt"]), d["ct"]
        )
        _, vr = jax.vjp(lambda c: self._synth_ref(d, c), d["ct"])
        dk, dr = vk(g1)[0], vr(g1)[0]
        scale = float(jnp.max(jnp.abs(dr)))
        assert float(jnp.max(jnp.abs(dk - dr))) / scale < 0.02

        y2 = self._synth_ref(d, d["ct"])
        g2 = jnp.asarray(
            rng.standard_normal((self.T, 2 * self.P)).astype(np.float32)
        )
        _, vk2 = jax.vjp(lambda y: band_analysis(y, d["csw"], d["cswt"]), y2)
        _, vr2 = jax.vjp(lambda y: self._ana_ref(d, y), y2)
        dk2, dr2 = vk2(g2)[0], vr2(g2)[0]
        scale2 = float(jnp.max(jnp.abs(dr2)))
        assert float(jnp.max(jnp.abs(dk2 - dr2))) / scale2 < 0.02

    def test_solver_outcome_with_kernels(self, speechlike):
        """25-iteration embed through the kernel path reads back 0 BER and
        lands at the slab path's loss (outcome-level; bf16 kernels vs f32
        CPU XLA makes bit-comparison meaningless)."""
        from aware_tpu.embed.solver import embed_core
        from aware_tpu.models import detect_values, init_params

        bits = np.random.default_rng(5).integers(0, 2, 20)
        wm = jnp.asarray((2 * bits - 1).astype(np.float32))
        clip = jnp.asarray(speechlike)
        cfg_k = AwareConfig().replace(use_pallas_roundtrip=True,
                                      num_iterations=25)
        cfg_s = AwareConfig().replace(num_iterations=25)
        params = {k: jnp.asarray(v)
                  for k, v in init_params(cfg_k.detection_net).items()}
        rk = embed_core(params, clip, wm, cfg_k)
        rs = embed_core(params, clip, wm, cfg_s)
        vk = np.asarray(detect_values(params, rk.audio))
        assert np.mean((vk > 0).astype(int) != bits) == 0.0
        assert abs(float(rk.best_loss) - float(rs.best_loss)) < 0.02

    def test_embed_batch_with_kernels(self, speechlike):
        """The vmapped kernel path (pallas batching rule: batch -> grid,
        the bench.py configuration) solves to 0 BER for every lane."""
        from aware_tpu.embed.solver import embed_batch
        from aware_tpu.models import detect_values, init_params

        rng = np.random.default_rng(9)
        bits = rng.integers(0, 2, (2, 20))
        wms = jnp.asarray((2 * bits - 1).astype(np.float32))
        clips = jnp.asarray(
            np.stack([speechlike, np.roll(speechlike, 1234)])
        )
        cfg = AwareConfig().replace(use_pallas_roundtrip=True,
                                    num_iterations=25)
        params = {k: jnp.asarray(v)
                  for k, v in init_params(cfg.detection_net).items()}
        res = embed_batch(params, clips, wms, cfg)
        v = np.asarray(
            jax.vmap(lambda a: detect_values(params, a))(res.audio)
        )
        assert np.mean((v > 0).astype(int) != bits) == 0.0

    def test_long_clip_routes_to_tiled_kernels(self):
        """Clips past the whole-clip VMEM bound (~16 s, t_frames > 1024)
        now route to the TIME-TILED kernels (roundtrip_tiled) instead of
        falling back to XLA — and an explicit 'highest' precision pin
        still keeps the all-f32 XLA slab path (the kernels are bf16)."""
        from aware_tpu.embed.solver import build_problem
        from aware_tpu.models import init_params

        cfg = AwareConfig().replace(use_pallas_roundtrip=True)
        params = {k: jnp.asarray(v)
                  for k, v in init_params(cfg.detection_net).items()}
        long_clip = jnp.asarray(
            np.sin(np.arange(20 * 16000) * 0.05).astype(np.float32)
        )
        wm = jnp.ones((20,), jnp.float32)
        pb = build_problem(params, long_clip, wm, cfg)
        jaxpr = str(jax.make_jaxpr(pb.objective)(pb.coeffs0)).lower()
        assert "pallas" in jaxpr  # tiled round trip active
        # the fused DETECTOR stays bounded at 1024 frames (VMEM) — the
        # long-clip objective uses the XLA banded detector
        assert jaxpr.count("pallas_call") == 2
        # a short clip with the same config uses the whole-clip kernels
        short = long_clip[: 2 * 16000]
        pb2 = build_problem(params, short, wm, cfg)
        assert "pallas" in str(jax.make_jaxpr(pb2.objective)(pb2.coeffs0)).lower()
        # explicit maximal precision opts out of every bf16 kernel
        hi = cfg.replace(matmul_precision="highest")
        pb3 = build_problem(params, long_clip, wm, hi)
        assert "pallas" not in str(jax.make_jaxpr(pb3.objective)(pb3.coeffs0)).lower()
