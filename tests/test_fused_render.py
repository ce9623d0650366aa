"""The fused render kernels (field + in-kernel compositing, per-ray I/O)
must match the flax-field + XLA-volrend reference path — forward AND
gradients. Interpret mode on CPU at f32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eonerf_code_tpu.models.eonerf import EONerfField
from eonerf_code_tpu.ops.pallas.fused_field import pack_params
from eonerf_code_tpu.ops.pallas.fused_render import (
    make_fused_camera,
    make_fused_shadow,
)
from eonerf_code_tpu.ops.sampling import set_last_valid
from eonerf_code_tpu.ops.volrend import (
    accumulate,
    exit_transmittance,
    render_weights,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(5)
    field = EONerfField(n_images=6)
    params = field.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 3)),
                        jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32),
                        method="init_all")
    r, k = 12, 17
    o = rng.uniform(-0.5, 0.5, (r, 3)).astype(np.float32)
    o[:, 2] = 0.95
    d = np.tile(np.array([0.03, -0.02, -1.0], np.float32), (r, 1))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    z = np.sort(rng.uniform(0.0, 2.0, (r, k)).astype(np.float32), axis=1)
    delta = np.diff(z, axis=1, append=2.2).astype(np.float32)
    mask = (rng.random((r, k)) > 0.25)
    mask[3] = False  # one ray with no valid samples
    idx = rng.integers(0, 6, r).astype(np.int32)
    return field, params, (jnp.asarray(o), jnp.asarray(d), jnp.asarray(z),
                           jnp.asarray(delta), jnp.asarray(mask),
                           jnp.asarray(idx))


def reference_camera(field, params, o, d, z, delta, mask, idx):
    pos = o[:, None, :] + d[:, None, :] * z[..., None]
    delta_cam = set_last_valid(delta, mask, 1e10)
    sun = jnp.zeros((o.shape[0], 3))
    sigma, albedo, _amb, t_s, t_b = field.apply(params, pos, sun, idx)
    w, _, _ = render_weights(sigma, delta_cam, mask)
    return {
        "depth": accumulate(w, z),
        "albedo": accumulate(w, albedo),
        "ts": accumulate(w, t_s[..., 0]),
        "tb": accumulate(w, t_b[..., 0]),
        "opacity": accumulate(w),
    }


def _rayin(o, d, emb):
    r = o.shape[0]
    return jnp.concatenate([o, d, emb, jnp.zeros((r, 6))], axis=1)


def _camera_inputs(params, o, d, z, delta, mask, idx):
    emb = params["params"]["transient_encoder"]["embedding"][idx]
    deltam = set_last_valid(delta, mask, 1e10) * mask
    return _rayin(o, d, emb), z, deltam


class TestCameraOp:
    def test_forward_parity(self, setup):
        field, params, (o, d, z, delta, mask, idx) = setup
        cam = make_fused_camera(jnp.float32, interpret=True)
        rayin, z_, deltam = _camera_inputs(params, o, d, z, delta, mask, idx)
        acc = cam(pack_params(params), rayin, z_, deltam)
        ref = reference_camera(field, params, o, d, z, delta, mask, idx)
        np.testing.assert_allclose(acc[:, 0], ref["depth"], rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(acc[:, 1:4], ref["albedo"], rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(acc[:, 4], ref["ts"], rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(acc[:, 5], ref["tb"], rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(acc[:, 6], ref["opacity"], rtol=2e-5, atol=1e-5)

    def test_gradients(self, setup):
        field, params, (o, d, z, delta, mask, idx) = setup
        cam = make_fused_camera(jnp.float32, interpret=True)
        emb = params["params"]["transient_encoder"]["embedding"][idx]
        deltam = set_last_valid(delta, mask, 1e10) * mask
        coef = jnp.asarray(np.random.default_rng(0).normal(
            size=(o.shape[0], 7)).astype(np.float32))

        def loss_fused(w, o_, emb_):
            acc = cam(w, _rayin(o_, d, emb_), z, deltam)
            return jnp.sum(acc[:, :7] * coef)

        def loss_ref(p, o_, emb_table):
            p = jax.tree_util.tree_map(lambda x: x, p)
            p["params"]["transient_encoder"]["embedding"] = emb_table
            ref = reference_camera(field, p, o_, d, z, delta, mask, idx)
            stack = jnp.concatenate(
                [ref["depth"][:, None], ref["albedo"], ref["ts"][:, None],
                 ref["tb"][:, None], ref["opacity"][:, None]], axis=1)
            return jnp.sum(stack * coef)

        w = pack_params(params)
        gw, go, gemb = jax.grad(loss_fused, argnums=(0, 1, 2))(w, o, emb)
        emb_table = params["params"]["transient_encoder"]["embedding"]
        gp, go_ref, gtab_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(
            params, o, emb_table)
        gp = gp["params"]
        # weight grads (trunk layer 0 + a head) track the flax reference
        np.testing.assert_allclose(
            np.asarray(gw.trunk_w[0]),
            np.asarray(gp["trunk"]["hidden_0"]["kernel"]), rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(gw.sigma_w),
            np.asarray(gp["sigma_head"]["output"]["kernel"]), rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(gw.alb_w1),
            np.asarray(gp["albedo_mlp"]["output"]["kernel"]), rtol=1e-3, atol=1e-5)
        # origin gradients (the bundle-adjustment path)
        np.testing.assert_allclose(np.asarray(go), np.asarray(go_ref),
                                   rtol=1e-3, atol=1e-4)
        # per-ray emb grads scatter back to the table rows
        gtab = jnp.zeros_like(emb_table).at[idx].add(gemb)
        np.testing.assert_allclose(np.asarray(gtab), np.asarray(gtab_ref),
                                   rtol=1e-3, atol=1e-5)

    def test_ray_padding_irrelevant(self, setup):
        """R not a multiple of the ray tile: outputs equal the first-R rows
        of a padded call."""
        field, params, (o, d, z, delta, mask, idx) = setup
        cam = make_fused_camera(jnp.float32, interpret=True, tile_target=512)
        rayin, z_, deltam = _camera_inputs(params, o, d, z, delta, mask, idx)
        acc_all = cam(pack_params(params), rayin, z_, deltam)
        acc_sub = cam(pack_params(params), rayin[:5], z_[:5], deltam[:5])
        np.testing.assert_allclose(np.asarray(acc_sub), np.asarray(acc_all[:5]),
                                   rtol=1e-5, atol=1e-6)


class TestShadowOp:
    def test_forward_parity(self, setup):
        field, params, (o, d, z, delta, mask, idx) = setup
        sh = make_fused_shadow(jnp.float32, interpret=True)
        pos = o[:, None, :] + d[:, None, :] * z[..., None]
        sigma = field.apply(params, pos, method="density")
        ref = exit_transmittance(sigma, delta, mask)
        deltam = delta * mask
        geo = sh(pack_params(params), _rayin(o, d, jnp.zeros((o.shape[0], 4))),
                 z, deltam, mask.astype(jnp.float32))
        np.testing.assert_allclose(np.asarray(geo), np.asarray(ref),
                                   rtol=2e-5, atol=1e-6)
        # the no-valid-samples ray returns exactly 1 (reference fallback)
        assert float(geo[3]) == 1.0

    def test_origin_gradient(self, setup):
        """d(geo)/d(origin) — the depth-gradient path of the shadow pass."""
        field, params, (o, d, z, delta, mask, idx) = setup
        sh = make_fused_shadow(jnp.float32, interpret=True)
        deltam = delta * mask
        coef = jnp.asarray(np.random.default_rng(1).normal(
            size=(o.shape[0],)).astype(np.float32))

        def loss_fused(w, o_):
            geo = sh(w, _rayin(o_, d, jnp.zeros((o.shape[0], 4))), z, deltam,
                     mask.astype(jnp.float32))
            return jnp.sum(geo * coef)

        def loss_ref(p, o_):
            pos = o_[:, None, :] + d[:, None, :] * z[..., None]
            sigma = field.apply(p, pos, method="density")
            return jnp.sum(exit_transmittance(sigma, delta, mask) * coef)

        w = pack_params(params)
        gw, go = jax.grad(loss_fused, argnums=(0, 1))(w, o)
        gp, go_ref = jax.grad(loss_ref, argnums=(0, 1))(params, o)
        np.testing.assert_allclose(np.asarray(go), np.asarray(go_ref),
                                   rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(gw.trunk_w[0]),
            np.asarray(gp["params"]["trunk"]["hidden_0"]["kernel"]),
            rtol=1e-3, atol=1e-6)
        # head weights get exact zeros
        assert float(jnp.abs(gw.bott_w).max()) == 0.0


class TestSavedActs:
    """save_acts=True streams the trunk activations from forward to
    backward instead of recomputing them — same math, different data path,
    so gradients must match the recompute kernels near-exactly (f32: the
    saved activations ARE the recomputed ones)."""

    def _grads(self, setup, **kw):
        field, params, (o, d, z, delta, mask, idx) = setup
        cam = make_fused_camera(jnp.float32, interpret=True, **kw)
        emb = params["params"]["transient_encoder"]["embedding"][idx]
        deltam = set_last_valid(delta, mask, 1e10) * mask
        coef = jnp.asarray(np.random.default_rng(2).normal(
            size=(o.shape[0], 7)).astype(np.float32))

        def loss(w, o_, emb_):
            acc = cam(w, _rayin(o_, d, emb_), z, deltam)
            return jnp.sum(acc[:, :7] * coef)

        return jax.grad(loss, argnums=(0, 1, 2))(pack_params(params), o, emb)

    def test_camera_grads_match_recompute(self, setup):
        gw_r, go_r, ge_r = self._grads(setup)
        gw_s, go_s, ge_s = self._grads(setup, save_acts=True)
        for a, b in zip(jax.tree_util.tree_leaves(gw_r),
                        jax.tree_util.tree_leaves(gw_s)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(go_s), np.asarray(go_r),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(ge_s), np.asarray(ge_r),
                                   rtol=1e-6, atol=1e-7)

    def test_camera_cap_falls_back(self, setup):
        """A cap below the stream size silently uses the recompute path —
        same gradients, no failure."""
        gw_r, go_r, _ = self._grads(setup)
        gw_c, go_c, _ = self._grads(setup, save_acts=True, save_acts_cap_mb=0)
        np.testing.assert_allclose(np.asarray(go_c), np.asarray(go_r),
                                   rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(gw_c.trunk_w[0]),
                                   np.asarray(gw_r.trunk_w[0]),
                                   rtol=0, atol=0)

    def test_shadow_grads_match_recompute(self, setup):
        field, params, (o, d, z, delta, mask, idx) = setup
        deltam = delta * mask
        coef = jnp.asarray(np.random.default_rng(3).normal(
            size=(o.shape[0],)).astype(np.float32))

        def grads(**kw):
            sh = make_fused_shadow(jnp.float32, interpret=True, **kw)

            def loss(w, o_):
                geo = sh(w, _rayin(o_, d, jnp.zeros((o.shape[0], 4))), z,
                         deltam, mask.astype(jnp.float32))
                return jnp.sum(geo * coef)

            return jax.grad(loss, argnums=(0, 1))(pack_params(params), o)

        gw_r, go_r = grads()
        gw_s, go_s = grads(save_acts=True)
        np.testing.assert_allclose(np.asarray(go_s), np.asarray(go_r),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(gw_s.trunk_w[0]),
                                   np.asarray(gw_r.trunk_w[0]),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(gw_s.sigma_w),
                                   np.asarray(gw_r.sigma_w),
                                   rtol=1e-6, atol=1e-7)

    def test_quant_combination_rejected(self):
        with pytest.raises(ValueError):
            make_fused_camera(jnp.float32, interpret=True, save_acts=True,
                              trunk_quant=True)

    def test_primal_without_grad_matches(self, setup):
        """The undifferentiated op never saves; forward values match the
        recompute op exactly."""
        field, params, (o, d, z, delta, mask, idx) = setup
        rayin, z_, deltam = _camera_inputs(params, o, d, z, delta, mask, idx)
        w = pack_params(params)
        cam_r = make_fused_camera(jnp.float32, interpret=True)
        cam_s = make_fused_camera(jnp.float32, interpret=True, save_acts=True)
        np.testing.assert_allclose(np.asarray(cam_s(w, rayin, z_, deltam)),
                                   np.asarray(cam_r(w, rayin, z_, deltam)),
                                   rtol=0, atol=0)

    def test_save_ok_false_forces_recompute(self, setup):
        """save_ok=False (the renderer's step-level all-or-nothing gate)
        routes a save-capable kernel through the recompute path —
        bit-identical gradients."""
        field, params, (o, d, z, delta, mask, idx) = setup
        cam = make_fused_camera(jnp.float32, interpret=True, save_acts=True)
        cam_r = make_fused_camera(jnp.float32, interpret=True)
        emb = params["params"]["transient_encoder"]["embedding"][idx]
        deltam = set_last_valid(delta, mask, 1e10) * mask
        coef = jnp.asarray(np.random.default_rng(2).normal(
            size=(o.shape[0], 7)).astype(np.float32))

        def loss(fn, **kw):
            def f(w, o_):
                acc = fn(w, _rayin(o_, d, emb), z, deltam, **kw)
                return jnp.sum(acc[:, :7] * coef)
            return jax.grad(f, argnums=(0, 1))(pack_params(params), o)

        gw_g, go_g = loss(cam, save_ok=False)
        gw_r, go_r = loss(cam_r)
        np.testing.assert_allclose(np.asarray(go_g), np.asarray(go_r),
                                   rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(gw_g.trunk_w[0]),
                                   np.asarray(gw_r.trunk_w[0]),
                                   rtol=0, atol=0)

    def test_step_save_ok_all_or_nothing(self, setup):
        """PallasField.step_save_ok: True only when every stream of the
        step fits the cap (mixed saved/recompute steps are the measured
        on-chip pathology)."""
        from eonerf_code_tpu.models.fused import PallasField

        field, params, _ = setup
        # cap sized between the two streams: camera (K=128) over, shadow
        # (K=32) under -> the STEP must say no
        r, k_cam, k_sc = 4096, 128, 32
        cam_mb = r * 128 * 2048 * 4 / 2**20   # f32 stream, kpad(128)=128
        pf = PallasField(field, interpret=True, save_acts=True,
                         save_acts_cap_mb=int(cam_mb * 0.5))
        assert not pf.step_save_ok(r, k_cam, k_sc)
        # both fit -> yes
        pf_big = PallasField(field, interpret=True, save_acts=True,
                             save_acts_cap_mb=int(cam_mb * 2))
        assert pf_big.step_save_ok(r, k_cam, k_sc)
        # the gate bounds the SUM of live streams, not the per-stream max:
        # each stream fits individually here (camera = cam_mb, shadow =
        # cam_mb/4) but camera+shadow = 1.25*cam_mb exceeds the cap
        pf_sum = PallasField(field, interpret=True, save_acts=True,
                             save_acts_cap_mb=int(cam_mb * 1.1))
        assert not pf_sum.step_save_ok(r, k_cam, k_sc)
        assert pf_sum.step_save_ok(r, k_cam, 0)
        # camera-only step with a small camera stream -> yes
        assert pf.step_save_ok(r, k_sc, 0)
        # save_acts off -> always no
        pf_off = PallasField(field, interpret=True, save_acts=False)
        assert not pf_off.step_save_ok(r, k_sc, 0)


class TestCoarseOp:
    def test_forward_parity(self, setup):
        """Fused coarse weights == render_weights over the same sigma field
        (deltam*mask carries the masking, identical sdelta)."""
        from eonerf_code_tpu.ops.pallas.fused_render import make_fused_coarse

        field, params, (o, d, z, delta, mask, idx) = setup
        co = make_fused_coarse(jnp.float32, interpret=True)
        pos = o[:, None, :] + d[:, None, :] * z[..., None]
        sigma = field.apply(params, pos, method="density")
        deltam = set_last_valid(delta, mask, 1e10)
        ref, _, _ = render_weights(sigma, deltam, mask)
        w = co(pack_params(params), _rayin(o, d, jnp.zeros((o.shape[0], 4))),
               z, deltam * mask)
        assert w.shape == z.shape
        np.testing.assert_allclose(np.asarray(w), np.asarray(ref),
                                   rtol=2e-5, atol=1e-6)

    def test_no_gradient_leak(self, setup):
        """The op is forward-only; differentiating through a consumer that
        (wrongly) touches it must see zero, not crash."""
        from eonerf_code_tpu.ops.pallas.fused_render import make_fused_coarse

        field, params, (o, d, z, delta, mask, idx) = setup
        co = make_fused_coarse(jnp.float32, interpret=True)
        deltam = set_last_valid(delta, mask, 1e10) * mask

        def f(w):
            out = co(w, _rayin(o, d, jnp.zeros((o.shape[0], 4))), z, deltam)
            return jnp.sum(out)

        g = jax.grad(f)(pack_params(params))
        assert float(jnp.abs(g.trunk_w[0]).max()) == 0.0


class TestRendererDispatch:
    def test_render_rays_fused_matches_per_sample_path(self):
        """render_rays through PallasField (fused path) vs through the raw
        flax field: full output dict + loss gradients agree at f32."""
        from eonerf_code_tpu.data.rays import satrays_from_tensor
        from eonerf_code_tpu.models.fused import PallasField
        from eonerf_code_tpu.render.satellite import RenderConfig, render_rays
        from eonerf_code_tpu.utils import metrics as M

        rng = np.random.default_rng(9)
        field = EONerfField(n_images=4)
        params = field.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 3)),
                            jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32),
                            method="init_all")
        pf = PallasField(field, interpret=True, tile=512, bwd_tile=512)
        assert pf.supports_fused_render

        n = 24
        o = np.zeros((n, 3), np.float32)
        o[:, 0] = rng.uniform(-0.8, 0.8, n)
        o[:, 1] = rng.uniform(-0.8, 0.8, n)
        o[:, 2] = 0.999
        d = np.tile(np.array([0.05, 0.02, -1.0], np.float32), (n, 1))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        sun = np.tile(np.array([0.3, 0.2, -0.93], np.float32), (n, 1))
        sun /= np.linalg.norm(sun, axis=1, keepdims=True)
        rays_t = np.hstack([o, d, np.zeros((n, 1), np.float32),
                            2.0 * np.ones((n, 1), np.float32), sun])
        ts = rng.integers(0, 4, n).astype(np.int32)
        rays = satrays_from_tensor(jnp.asarray(rays_t), jnp.asarray(ts))
        rgbs = jnp.asarray(rng.random((n, 3)).astype(np.float32))
        cfg = RenderConfig(n_samples=16, sc_n_samples=16)
        key = jax.random.PRNGKey(7)

        out_ref = render_rays(field, params, rays, key, cfg, shadows=True)
        out_fused = render_rays(pf, params, rays, key, cfg, shadows=True)
        for k in ("rgb", "depth", "albedo_rgb", "geo_shadows", "transient_s",
                  "beta", "opacity", "ambient_rgb", "shadowless_rgb",
                  "pts_per_ray", "sc_pts_per_ray"):
            np.testing.assert_allclose(
                np.asarray(out_fused[k]), np.asarray(out_ref[k]),
                rtol=3e-5, atol=2e-5, err_msg=k)

        def loss(f):
            def inner(p):
                out = render_rays(f, p, rays, key, cfg, shadows=True)
                l, _ = M.uncertainty_aware_loss(rgbs, out["rgb"], out["beta"])
                return l
            return inner

        from jax.flatten_util import ravel_pytree

        l_ref, g_ref = jax.value_and_grad(loss(field))(params)
        l_fus, g_fus = jax.value_and_grad(loss(pf))(params)
        np.testing.assert_allclose(float(l_fus), float(l_ref), rtol=1e-5)
        flat_r, _ = ravel_pytree(g_ref)
        flat_f, _ = ravel_pytree(g_fus)
        denom = float(jnp.linalg.norm(flat_r)) + 1e-12
        rel = float(jnp.linalg.norm(flat_f - flat_r)) / denom
        assert rel < 1e-4, f"gradient rel-L2 {rel}"

    def test_render_rays_fused_hierarchical_matches(self):
        """The hierarchical path (n_importance > 0): the fused coarse op
        feeds sample_pdf with the same weights the per-sample path computes,
        so both backends draw the same z_fine and the outputs agree."""
        from eonerf_code_tpu.data.rays import satrays_from_tensor
        from eonerf_code_tpu.models.fused import PallasField
        from eonerf_code_tpu.render.satellite import RenderConfig, render_rays

        rng = np.random.default_rng(13)
        field = EONerfField(n_images=4)
        params = field.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 3)),
                            jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32),
                            method="init_all")
        pf = PallasField(field, interpret=True, tile=512, bwd_tile=512)
        n = 24
        o = np.zeros((n, 3), np.float32)
        o[:, 0] = rng.uniform(-0.8, 0.8, n)
        o[:, 1] = rng.uniform(-0.8, 0.8, n)
        o[:, 2] = 0.999
        d = np.tile(np.array([0.05, 0.02, -1.0], np.float32), (n, 1))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        sun = np.tile(np.array([0.3, 0.2, -0.93], np.float32), (n, 1))
        sun /= np.linalg.norm(sun, axis=1, keepdims=True)
        rays_t = np.hstack([o, d, np.zeros((n, 1), np.float32),
                            2.0 * np.ones((n, 1), np.float32), sun])
        rays = satrays_from_tensor(jnp.asarray(rays_t),
                                   jnp.asarray(rng.integers(0, 4, n).astype(np.int32)))
        cfg = RenderConfig(n_samples=12, n_importance=8, sc_n_samples=16)
        key = jax.random.PRNGKey(7)
        out_ref = render_rays(field, params, rays, key, cfg, shadows=True)
        out_fused = render_rays(pf, params, rays, key, cfg, shadows=True)
        for k in ("rgb", "depth", "geo_shadows", "beta", "pts_per_ray"):
            np.testing.assert_allclose(
                np.asarray(out_fused[k]), np.asarray(out_ref[k]),
                rtol=3e-5, atol=2e-5, err_msg=k)

    def test_render_depth_fused_matches(self):
        from eonerf_code_tpu.data.rays import satrays_from_tensor
        from eonerf_code_tpu.models.fused import PallasField
        from eonerf_code_tpu.render.satellite import RenderConfig, render_depth

        rng = np.random.default_rng(11)
        field = EONerfField(n_images=3)
        params = field.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 3)),
                            jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32),
                            method="init_all")
        pf = PallasField(field, interpret=True, tile=512, bwd_tile=512)
        n = 16
        o = np.zeros((n, 3), np.float32)
        o[:, 0] = rng.uniform(-0.5, 0.5, n)
        o[:, 2] = 0.999
        d = np.tile(np.array([0.0, 0.0, -1.0], np.float32), (n, 1))
        sun = np.tile(np.array([0.3, 0.2, -0.93], np.float32), (n, 1))
        sun /= np.linalg.norm(sun, axis=1, keepdims=True)
        rays_t = np.hstack([o, d, np.zeros((n, 1), np.float32),
                            2.0 * np.ones((n, 1), np.float32), sun])
        rays = satrays_from_tensor(jnp.asarray(rays_t),
                                   jnp.zeros((n,), jnp.int32))
        cfg = RenderConfig(n_samples=16, sc_n_samples=16)
        key = jax.random.PRNGKey(3)
        ref = render_depth(field, params, rays, key, cfg)
        fus = render_depth(pf, params, rays, key, cfg)
        np.testing.assert_allclose(np.asarray(fus), np.asarray(ref),
                                   rtol=3e-5, atol=2e-5)

    def test_render_rays_fused_bundle_adjust_gradients(self):
        """rpc_correction composes with the fused path: the learned
        per-image ray offsets shift the fused render identically to the
        per-sample path, and their gradient (which flows through the
        kernels' d_origin output — fused_render.py rows 0:3 of d_rayin)
        matches the XLA field's."""
        from eonerf_code_tpu.data.rays import satrays_from_tensor
        from eonerf_code_tpu.models.fused import PallasField
        from eonerf_code_tpu.render.satellite import RenderConfig, render_rays
        from eonerf_code_tpu.utils import metrics as M

        rng = np.random.default_rng(21)
        field = EONerfField(n_images=4, rpc_correction=True)
        params = field.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 3)),
                            jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32),
                            method="init_all")
        # non-zero offsets so the forward parity exercises the shift
        emb = params["params"]["ray_correction_enc"]["embedding"]
        params["params"]["ray_correction_enc"]["embedding"] = (
            emb + jnp.asarray(rng.normal(0, 0.05, emb.shape), jnp.float32))
        pf = PallasField(field, interpret=True, tile=512, bwd_tile=512)

        n = 24
        o = np.zeros((n, 3), np.float32)
        o[:, 0] = rng.uniform(-0.8, 0.8, n)
        o[:, 1] = rng.uniform(-0.8, 0.8, n)
        o[:, 2] = 0.999
        d = np.tile(np.array([0.05, 0.02, -1.0], np.float32), (n, 1))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        sun = np.tile(np.array([0.3, 0.2, -0.93], np.float32), (n, 1))
        sun /= np.linalg.norm(sun, axis=1, keepdims=True)
        rays_t = np.hstack([o, d, np.zeros((n, 1), np.float32),
                            2.0 * np.ones((n, 1), np.float32), sun])
        ts = rng.integers(0, 4, n).astype(np.int32)
        rays = satrays_from_tensor(jnp.asarray(rays_t), jnp.asarray(ts))
        rgbs = jnp.asarray(rng.random((n, 3)).astype(np.float32))
        cfg = RenderConfig(n_samples=16, sc_n_samples=16)
        key = jax.random.PRNGKey(7)

        out_ref = render_rays(field, params, rays, key, cfg, shadows=True)
        out_fused = render_rays(pf, params, rays, key, cfg, shadows=True)
        for k in ("rgb", "depth", "geo_shadows", "beta"):
            np.testing.assert_allclose(
                np.asarray(out_fused[k]), np.asarray(out_ref[k]),
                rtol=3e-5, atol=2e-5, err_msg=k)

        def loss(f):
            def inner(p):
                out = render_rays(f, p, rays, key, cfg, shadows=True)
                l, _ = M.uncertainty_aware_loss(rgbs, out["rgb"], out["beta"])
                return l
            return inner

        g_ref = jax.grad(loss(field))(params)
        g_fus = jax.grad(loss(pf))(params)
        gb_ref = np.asarray(g_ref["params"]["ray_correction_enc"]["embedding"])
        gb_fus = np.asarray(g_fus["params"]["ray_correction_enc"]["embedding"])
        assert np.abs(gb_ref).max() > 0, "BA gradient unexpectedly zero"
        rel = np.linalg.norm(gb_fus - gb_ref) / (np.linalg.norm(gb_ref) + 1e-12)
        # the d_origin path multiplies PE derivatives by frequencies up to
        # 2^(L-1)*pi -- f32 accumulation noise is ~1e-3 relative (the
        # kernel-level origin-grad tests above use the same tolerance); a
        # missing gradient term would show as a >>1e-2 systematic deviation
        assert rel < 2e-3, f"BA-offset gradient rel-L2 {rel}"
