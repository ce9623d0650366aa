"""int8 trunk quantization inside the fused render kernels.

The q8 path replaces the trunk matmuls (fwd + bwd recompute) with int8
(per-column weight scales, dynamic per-tile activation scales) while heads
and the cotangent chain stay in the compute dtype (straight-through
gradients). These tests pin, at f32 compute in interpret mode:

- weight quantization round-trip error <= half an LSB per element,
- forward outputs of camera/shadow ops close to the unquantized kernels,
- gradients finite and directionally aligned with the unquantized ones,
- the PallasField dispatch + a full train-step value_and_grad smoke.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eonerf_code_tpu.models.eonerf import EONerfField
from eonerf_code_tpu.ops.pallas.fused_field import (
    _pad_pe_rows,
    flatten_weights,
    pack_params,
    quantize_trunk_int8,
)
from eonerf_code_tpu.ops.pallas.fused_render import (
    make_fused_camera,
    make_fused_shadow,
)
from eonerf_code_tpu.ops.sampling import set_last_valid


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(13)
    field = EONerfField(n_images=5)
    params = field.init(jax.random.PRNGKey(2), jnp.zeros((2, 3, 3)),
                        jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32),
                        method="init_all")
    r, k = 16, 24
    o = rng.uniform(-0.5, 0.5, (r, 3)).astype(np.float32)
    o[:, 2] = 0.95
    d = np.tile(np.array([0.03, -0.02, -1.0], np.float32), (r, 1))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    z = np.sort(rng.uniform(0.0, 2.0, (r, k)).astype(np.float32), axis=1)
    delta = np.diff(z, axis=1, append=2.2).astype(np.float32)
    mask = rng.random((r, k)) > 0.2
    idx = rng.integers(0, 5, r).astype(np.int32)
    return field, params, (jnp.asarray(o), jnp.asarray(d), jnp.asarray(z),
                           jnp.asarray(delta), jnp.asarray(mask),
                           jnp.asarray(idx))


def _rayin(o, d, emb):
    return jnp.concatenate([o, d, emb, jnp.zeros((o.shape[0], 6))], axis=1)


def _rel_l2(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


class TestQuantizeWeights:
    def test_roundtrip_half_lsb(self, setup):
        field, params, _ = setup
        flat = _pad_pe_rows(flatten_weights(pack_params(params)),
                            with_transient=True)
        q = quantize_trunk_int8(flat)
        w8s, scales = q[:8], q[8:]
        for wmat, w8, s in zip(flat[:8], w8s, scales):
            assert w8.dtype == jnp.int8
            deq = np.asarray(w8, np.float32) * np.asarray(s)
            err = np.abs(deq - np.asarray(wmat))
            # round-to-nearest: error <= scale/2 per element (per column)
            assert (err <= np.asarray(s) / 2 + 1e-9).all()
            assert int(np.abs(np.asarray(w8)).max()) <= 127


class TestQuantForwardClose:
    def test_camera(self, setup):
        field, params, (o, d, z, delta, mask, idx) = setup
        w = pack_params(params)
        emb = params["params"]["transient_encoder"]["embedding"][idx]
        deltam = set_last_valid(delta, mask, 1e10) * mask
        cam = make_fused_camera(jnp.float32, interpret=True)
        cam_q = make_fused_camera(jnp.float32, interpret=True, trunk_quant=True)
        acc = cam(w, _rayin(o, d, emb), z, deltam)
        acc_q = cam_q(w, _rayin(o, d, emb), z, deltam)
        # int8 trunk error propagated through heads + compositing: small
        # relative to the signal on every accumulator channel
        assert _rel_l2(acc_q[:, 0], acc[:, 0]) < 0.05      # depth
        assert _rel_l2(acc_q[:, 1:4], acc[:, 1:4]) < 0.05  # albedo
        assert _rel_l2(acc_q[:, 6], acc[:, 6]) < 0.05      # opacity

    def test_shadow(self, setup):
        field, params, (o, d, z, delta, mask, idx) = setup
        w = pack_params(params)
        deltam = delta * mask
        sh = make_fused_shadow(jnp.float32, interpret=True)
        sh_q = make_fused_shadow(jnp.float32, interpret=True, trunk_quant=True)
        zero_emb = jnp.zeros((o.shape[0], 4))
        geo = sh(w, _rayin(o, d, zero_emb), z, deltam, mask.astype(jnp.float32))
        geo_q = sh_q(w, _rayin(o, d, zero_emb), z, deltam,
                     mask.astype(jnp.float32))
        assert _rel_l2(geo_q, geo) < 0.05


class TestQuantGradients:
    @pytest.mark.parametrize("tier", [True, "full"])
    def test_camera_grads_aligned(self, setup, tier):
        field, params, (o, d, z, delta, mask, idx) = setup
        from jax.flatten_util import ravel_pytree

        w = pack_params(params)
        emb = params["params"]["transient_encoder"]["embedding"][idx]
        deltam = set_last_valid(delta, mask, 1e10) * mask
        coef = jnp.asarray(np.random.default_rng(3).normal(
            size=(o.shape[0], 7)).astype(np.float32))

        def make_loss(cam):
            def loss(w_, o_):
                acc = cam(w_, _rayin(o_, d, emb), z, deltam)
                return jnp.sum(acc[:, :7] * coef)
            return loss

        cam = make_fused_camera(jnp.float32, interpret=True)
        cam_q = make_fused_camera(jnp.float32, interpret=True, trunk_quant=tier)
        gw, go = jax.grad(make_loss(cam), argnums=(0, 1))(w, o)
        gw_q, go_q = jax.grad(make_loss(cam_q), argnums=(0, 1))(w, o)
        fw, _ = ravel_pytree(gw)
        fq, _ = ravel_pytree(gw_q)
        assert bool(jnp.isfinite(fq).all())
        cos = float(jnp.vdot(fw, fq) / (jnp.linalg.norm(fw)
                                        * jnp.linalg.norm(fq) + 1e-12))
        assert cos > 0.95, f"weight-grad cosine {cos}"
        cos_o = float(jnp.vdot(go.ravel(), go_q.ravel())
                      / (jnp.linalg.norm(go) * jnp.linalg.norm(go_q) + 1e-12))
        assert cos_o > 0.9, f"origin-grad cosine {cos_o}"

    def test_shadow_grads_aligned_full(self, setup):
        field, params, (o, d, z, delta, mask, idx) = setup
        from jax.flatten_util import ravel_pytree

        w = pack_params(params)
        deltam = delta * mask
        maskf = mask.astype(jnp.float32)
        zero_emb = jnp.zeros((o.shape[0], 4))
        coef = jnp.asarray(np.random.default_rng(9).normal(
            size=(o.shape[0],)).astype(np.float32))

        def make_loss(sh):
            def loss(w_, o_):
                geo = sh(w_, _rayin(o_, d, zero_emb), z, deltam, maskf)
                return jnp.sum(geo * coef)
            return loss

        sh = make_fused_shadow(jnp.float32, interpret=True)
        sh_q = make_fused_shadow(jnp.float32, interpret=True,
                                 trunk_quant="full")
        gw, go = jax.grad(make_loss(sh), argnums=(0, 1))(w, o)
        gw_q, go_q = jax.grad(make_loss(sh_q), argnums=(0, 1))(w, o)
        fw, _ = ravel_pytree(gw)
        fq, _ = ravel_pytree(gw_q)
        assert bool(jnp.isfinite(fq).all())
        cos = float(jnp.vdot(fw, fq) / (jnp.linalg.norm(fw)
                                        * jnp.linalg.norm(fq) + 1e-12))
        assert cos > 0.95, f"weight-grad cosine {cos}"
        cos_o = float(jnp.vdot(go.ravel(), go_q.ravel())
                      / (jnp.linalg.norm(go) * jnp.linalg.norm(go_q) + 1e-12))
        assert cos_o > 0.9, f"origin-grad cosine {cos_o}"


class TestDispatch:
    def test_render_rays_and_train_step_smoke(self, setup):
        from eonerf_code_tpu.data.rays import satrays_from_tensor
        from eonerf_code_tpu.models.fused import PallasField
        from eonerf_code_tpu.render.satellite import RenderConfig, render_rays
        from eonerf_code_tpu.utils import metrics as M

        field, params, _ = setup
        rng = np.random.default_rng(21)
        n = 12
        o = np.zeros((n, 3), np.float32)
        o[:, 0] = rng.uniform(-0.8, 0.8, n)
        o[:, 2] = 0.999
        d = np.tile(np.array([0.05, 0.02, -1.0], np.float32), (n, 1))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        sun = np.tile(np.array([0.3, 0.2, -0.93], np.float32), (n, 1))
        sun /= np.linalg.norm(sun, axis=1, keepdims=True)
        rays_t = np.hstack([o, d, np.zeros((n, 1), np.float32),
                            2.0 * np.ones((n, 1), np.float32), sun])
        ts = rng.integers(0, 5, n).astype(np.int32)
        rays = satrays_from_tensor(jnp.asarray(rays_t), jnp.asarray(ts))
        rgbs = jnp.asarray(rng.random((n, 3)).astype(np.float32))
        cfg = RenderConfig(n_samples=16, sc_n_samples=16)
        key = jax.random.PRNGKey(5)

        pf = PallasField(field, interpret=True, tile=512, bwd_tile=512)
        pf_q = PallasField(field, interpret=True, tile=512, bwd_tile=512,
                           trunk_quant=True)
        out = render_rays(pf, params, rays, key, cfg, shadows=True)
        out_q = render_rays(pf_q, params, rays, key, cfg, shadows=True)
        assert _rel_l2(out_q["rgb"], out["rgb"]) < 0.1
        assert _rel_l2(out_q["depth"], out["depth"]) < 0.1

        def loss(p):
            o_ = render_rays(pf_q, p, rays, key, cfg, shadows=True)
            l, _ = M.uncertainty_aware_loss(rgbs, o_["rgb"], o_["beta"])
            return l

        l, g = jax.value_and_grad(loss)(params)
        from jax.flatten_util import ravel_pytree

        flat, _ = ravel_pytree(g)
        assert bool(jnp.isfinite(flat).all()) and float(
            jnp.abs(flat).max()) > 0.0
        assert np.isfinite(float(l))

    def test_make_render_field_reads_cfg(self, setup):
        from eonerf_code_tpu.config import TrainConfig
        from eonerf_code_tpu.models.fused import make_render_field

        field, params, _ = setup
        cfg = TrainConfig(root_dir="/tmp", use_pallas=True,
                          trunk_quant="int8")
        rf = make_render_field(field, cfg)
        assert getattr(rf, "trunk_quant", False) is True
        cfg_full = TrainConfig(root_dir="/tmp", use_pallas=True,
                               trunk_quant="int8_full")
        rf_full = make_render_field(field, cfg_full)
        assert getattr(rf_full, "trunk_quant", False) == "full"

    def test_train_step_smoke_full(self, setup):
        from eonerf_code_tpu.data.rays import satrays_from_tensor
        from eonerf_code_tpu.models.fused import PallasField
        from eonerf_code_tpu.render.satellite import RenderConfig, render_rays
        from eonerf_code_tpu.utils import metrics as M

        field, params, _ = setup
        rng = np.random.default_rng(22)
        n = 12
        o = np.zeros((n, 3), np.float32)
        o[:, 0] = rng.uniform(-0.8, 0.8, n)
        o[:, 2] = 0.999
        d = np.tile(np.array([0.05, 0.02, -1.0], np.float32), (n, 1))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        sun = np.tile(np.array([0.3, 0.2, -0.93], np.float32), (n, 1))
        sun /= np.linalg.norm(sun, axis=1, keepdims=True)
        rays_t = np.hstack([o, d, np.zeros((n, 1), np.float32),
                            2.0 * np.ones((n, 1), np.float32), sun])
        ts = rng.integers(0, 5, n).astype(np.int32)
        rays = satrays_from_tensor(jnp.asarray(rays_t), jnp.asarray(ts))
        rgbs = jnp.asarray(rng.random((n, 3)).astype(np.float32))
        cfg = RenderConfig(n_samples=16, sc_n_samples=16)
        key = jax.random.PRNGKey(6)
        pf_q = PallasField(field, interpret=True, tile=512, bwd_tile=512,
                           trunk_quant="full")

        def loss(p):
            o_ = render_rays(pf_q, p, rays, key, cfg, shadows=True)
            l, _ = M.uncertainty_aware_loss(rgbs, o_["rgb"], o_["beta"])
            return l

        l, g = jax.value_and_grad(loss)(params)
        from jax.flatten_util import ravel_pytree

        flat, _ = ravel_pytree(g)
        assert bool(jnp.isfinite(flat).all()) and float(
            jnp.abs(flat).max()) > 0.0
        assert np.isfinite(float(l))
