"""Time-tiled round-trip kernels (ops/pallas/roundtrip_tiled.py).

Interpreter mode on CPU; the same code compiles to Mosaic on TPU.  The
tiled kernels must match the XLA slab math (bf16-identical replicas) on
clips PAST the whole-clip kernels' 1024-frame bound — the round-2 gap
where the fastest path never served long-form embeds.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aware_tpu.config import AwareConfig
from aware_tpu.ops.pallas.roundtrip_tiled import (
    HALO,
    R,
    build_tiled_bases,
    make_csinp,
    shift_mm,
    synth_norm_tiled,
    band_analysis_tiled,
)

N_FFT, HOP = 1024, 256
P = 256
NB = 225


@pytest.fixture(scope="module")
def rngl():
    return np.random.default_rng(7)


def test_shift_mm_matches_direct(rngl):
    n, d, e = 300, 128, 256  # deliberately not a tile multiple
    xp = jnp.asarray(rngl.standard_normal((n + HALO, d)).astype(np.float32))
    w_np = rngl.standard_normal((R, d, e)).astype(np.float32)
    w = jnp.asarray(w_np, jnp.bfloat16)
    got = np.asarray(shift_mm(xp, w, n))
    xb = np.asarray(xp.astype(jnp.bfloat16), np.float32)
    wf = np.asarray(w, np.float32)
    want = sum(xb[o : o + n] @ wf[o] for o in range(R))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-2)


class TestTiledRoundtrip:
    """Against the solver's own XLA slab formulation with bf16 casts."""

    T = 1300  # > 1024: past the whole-clip kernels' bound

    @pytest.fixture(scope="class")
    def data(self, rngl):
        t = self.T
        lr = t - 1
        coeffs = rngl.standard_normal((NB, t)).astype(np.float32) * 0.1
        cos = np.cos(rngl.uniform(-np.pi, np.pi, (NB, t))).astype(np.float32)
        sin = np.sqrt(np.maximum(1 - cos**2, 0)).astype(np.float32)
        yconst = rngl.standard_normal((lr, HOP)).astype(np.float32) * 0.01
        env = (1.0 + rngl.random((lr, HOP))).astype(np.float32)
        ab_np = np.zeros((2 * P, N_FFT), np.float32)
        ab_np[:NB] = rngl.standard_normal((NB, N_FFT)) * 0.05
        ab_np[P : P + NB] = rngl.standard_normal((NB, N_FFT)) * 0.05
        csw_np = np.zeros((N_FFT, 2 * P), np.float32)
        csw_np[:, :NB] = rngl.standard_normal((N_FFT, NB)) * 0.05
        csw_np[:, P : P + NB] = rngl.standard_normal((N_FFT, NB)) * 0.05
        tb = build_tiled_bases(ab_np, csw_np)
        return {
            "coeffs": jnp.asarray(coeffs),
            "cos": jnp.asarray(cos),
            "sin": jnp.asarray(sin),
            "yconst": jnp.asarray(yconst),
            "env": jnp.asarray(env),
            "ab_np": ab_np,
            "csw_np": csw_np,
            "tb": tb,
        }

    def _ct(self, d):
        t = self.T
        ct = jnp.zeros((t, P), jnp.float32)
        return ct.at[:, :NB].set(d["coeffs"].T)

    def _synth_ref(self, d, coeffs):
        """XLA slab formulation with the kernels' bf16 operand casts."""
        t, lr = self.T, self.T - 1
        pad_rows = HALO - 1
        reim = jnp.concatenate(
            [coeffs * d["cos"], coeffs * d["sin"]], axis=0
        ).T  # (T, 2nb)
        reimp = jnp.zeros((t, 2 * P))
        reimp = reimp.at[:, :NB].set(reim[:, :NB])
        reimp = reimp.at[:, P : P + NB].set(reim[:, NB:])
        rb = reimp.astype(jnp.bfloat16)
        ab = jnp.asarray(d["ab_np"], jnp.bfloat16)
        yd = jnp.zeros((t + R - 1, HOP))
        for k in range(R):
            yd = yd.at[k : k + t].add(
                jnp.dot(rb, ab[:, k * HOP : (k + 1) * HOP],
                        preferred_element_type=jnp.float32)
            )
        u = yd[pad_rows : pad_rows + lr] / d["env"] + d["yconst"]
        m1 = jnp.max(jnp.abs(u))
        return u / (m1 * (1 + 1e-8) + 1e-16)

    def _ana_ref(self, d, y2):
        t, lr = self.T, self.T - 1
        pad_rows = HALO - 1
        yp = jnp.zeros((t + R - 1, HOP)).at[pad_rows : pad_rows + lr].set(y2)
        csw = jnp.asarray(d["csw_np"], jnp.bfloat16)
        out = 0
        for k in range(R):
            out = out + jnp.dot(
                yp[k : k + t].astype(jnp.bfloat16),
                csw[k * HOP : (k + 1) * HOP],
                preferred_element_type=jnp.float32,
            )
        return out

    def test_synth_forward(self, data):
        d = data
        csinp = make_csinp(d["cos"], d["sin"], P)
        got = np.asarray(
            synth_norm_tiled(self._ct(d), csinp, d["yconst"], d["env"],
                             d["tb"]["w_sf"], d["tb"]["w_sb"])
        )
        want = np.asarray(self._synth_ref(d, d["coeffs"]))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)

    def test_analysis_forward(self, data):
        d = data
        y2 = self._synth_ref(d, d["coeffs"])
        got = np.asarray(
            band_analysis_tiled(y2, d["tb"]["w_af"], d["tb"]["w_ab"])
        )
        want = np.asarray(self._ana_ref(d, y2))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

    def test_vjps_match_autodiff(self, data, rngl):
        d = data
        csinp = make_csinp(d["cos"], d["sin"], P)
        g1 = jnp.asarray(
            rngl.standard_normal((self.T - 1, HOP)).astype(np.float32)
        )

        def ref_from_ct(ct):
            coeffs = ct[:, :NB].T
            return self._synth_ref(d, coeffs)

        ct = self._ct(d)
        _, vk = jax.vjp(
            lambda c: synth_norm_tiled(c, csinp, d["yconst"], d["env"],
                                       d["tb"]["w_sf"], d["tb"]["w_sb"]),
            ct,
        )
        _, vr = jax.vjp(ref_from_ct, ct)
        dk, dr = vk(g1)[0], vr(g1)[0]
        scale = float(jnp.max(jnp.abs(dr)))
        assert float(jnp.max(jnp.abs(dk - dr))) / scale < 0.02

        y2 = self._synth_ref(d, d["coeffs"])
        g2 = jnp.asarray(
            rngl.standard_normal((self.T, 2 * P)).astype(np.float32)
        )
        _, vk2 = jax.vjp(
            lambda y: band_analysis_tiled(y, d["tb"]["w_af"],
                                          d["tb"]["w_ab"]), y2
        )
        _, vr2 = jax.vjp(lambda y: self._ana_ref(d, y), y2)
        dk2, dr2 = vk2(g2)[0], vr2(g2)[0]
        scale2 = float(jnp.max(jnp.abs(dr2)))
        assert float(jnp.max(jnp.abs(dk2 - dr2))) / scale2 < 0.02

    def test_vmap_matches_per_example(self, data, rngl):
        """vmap dispatches into the natively batched grid (custom_vmap) —
        bit-identical to the per-example kernels, fwd and grad.  The
        solver's embed_batch vmaps the whole embed step, so this is the
        shape the round-5 chip bench 60 s row exercises (the generic
        Pallas vmap rule produced an ANY-space block spec Mosaic
        rejects)."""
        d = data
        t, lr, bsz = self.T, self.T - 1, 2
        csinp1 = make_csinp(d["cos"], d["sin"], P)
        cts = jnp.stack([self._ct(d), self._ct(d) * 0.7])
        csinps = jnp.stack([csinp1, csinp1 * 0.9])
        yconsts = jnp.stack([d["yconst"], d["yconst"] * 1.3])

        def f(ct, csinp, yconst):
            y2 = synth_norm_tiled(ct, csinp, yconst, d["env"],
                                  d["tb"]["w_sf"], d["tb"]["w_sb"])
            return band_analysis_tiled(y2, d["tb"]["w_af"], d["tb"]["w_ab"])

        def loss(ct, csinp, yconst):
            return jnp.sum(f(ct, csinp, yconst) ** 2)

        out_b = jax.vmap(f)(cts, csinps, yconsts)
        out_l = jnp.stack([f(cts[i], csinps[i], yconsts[i])
                           for i in range(bsz)])
        np.testing.assert_array_equal(np.asarray(out_b), np.asarray(out_l))
        g_b = jax.vmap(jax.grad(loss))(cts, csinps, yconsts)
        g_l = jnp.stack([jax.grad(loss)(cts[i], csinps[i], yconsts[i])
                         for i in range(bsz)])
        np.testing.assert_array_equal(np.asarray(g_b), np.asarray(g_l))


@pytest.mark.slow
def test_long_clip_solver_outcome():
    """A 20 s clip (T=1251 > 1024) embeds through the TILED kernel path
    and reads back 0 BER, landing at the XLA slab path's loss."""
    from aware_tpu.embed.solver import build_problem, embed_core
    from aware_tpu.models import detect_values, init_params

    sr = 16000
    t = np.arange(20 * sr) / sr
    ph = np.cumsum(2 * np.pi * (120 + 30 * np.sin(2 * np.pi * 2.3 * t)) / sr)
    x = sum(np.cos(k * ph) / k for k in range(1, 20))
    x *= 0.4 + 0.6 * np.clip(np.sin(2 * np.pi * 3.1 * t), 0, None)
    clip = jnp.asarray((x / np.max(np.abs(x))).astype(np.float32))

    bits = np.random.default_rng(5).integers(0, 2, 20)
    wm = jnp.asarray((2 * bits - 1).astype(np.float32))
    cfg_k = AwareConfig().replace(use_pallas_roundtrip=True,
                                  num_iterations=12)
    cfg_s = AwareConfig().replace(num_iterations=12)
    params = {k: jnp.asarray(v)
              for k, v in init_params(cfg_k.detection_net).items()}

    pb = build_problem(params, clip, wm, cfg_k)
    jx = str(jax.make_jaxpr(pb.objective)(pb.coeffs0)).lower()
    assert "pallas" in jx  # the tiled kernels ARE active past 1024 frames

    rk = embed_core(params, clip, wm, cfg_k)
    rs = embed_core(params, clip, wm, cfg_s)
    vk = np.asarray(detect_values(params, rk.audio))
    assert np.mean((vk > 0).astype(int) != bits) == 0.0
    assert abs(float(rk.best_loss) - float(rs.best_loss)) < 0.02
