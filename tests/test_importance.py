"""Hierarchical (importance) sampling: inverse-CDF correctness and the
renderer's fine-sampling path. The reference declared --n_importance but
never implemented it (SURVEY §2 #11)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eonerf_code_tpu.ops.sampling import sample_pdf
from eonerf_code_tpu.render.satellite import RenderConfig, render_rays
from tests.test_render import _SlabField, make_rays


class TestSamplePDF:
    def test_concentrates_where_weights_are(self):
        r, k = 64, 32
        bins = jnp.broadcast_to(jnp.linspace(0.0, 2.0, k + 1), (r, k + 1))
        w = jnp.zeros((r, k)).at[:, 20].set(1.0)  # all mass in bin 20
        z = sample_pdf(jax.random.PRNGKey(0), bins, w, 128)
        lo, hi = float(bins[0, 20]), float(bins[0, 21])
        frac_in = float(((z >= lo - 1e-4) & (z <= hi + 1e-4)).mean())
        assert frac_in > 0.95

    def test_uniform_weights_cover_range(self):
        r, k = 16, 16
        bins = jnp.broadcast_to(jnp.linspace(1.0, 3.0, k + 1), (r, k + 1))
        w = jnp.ones((r, k))
        z = sample_pdf(jax.random.PRNGKey(1), bins, w, 256)
        assert float(z.min()) >= 1.0 - 1e-5 and float(z.max()) <= 3.0 + 1e-5
        np.testing.assert_allclose(float(z.mean()), 2.0, atol=0.05)

    def test_deterministic_mode_sorted_quantiles(self):
        r, k = 4, 8
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, k + 1), (r, k + 1))
        w = jnp.ones((r, k))
        z = sample_pdf(jax.random.PRNGKey(0), bins, w, 10, perturb=False)
        assert bool(jnp.all(jnp.diff(z, axis=-1) >= 0))

    def test_empty_ray_does_not_nan(self):
        r, k = 4, 8
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, k + 1), (r, k + 1))
        w = jnp.zeros((r, k))
        z = sample_pdf(jax.random.PRNGKey(0), bins, w, 16)
        assert np.isfinite(np.asarray(z)).all()


class TestRendererImportance:
    def test_fine_sampling_sharpens_depth(self):
        """On the opaque-slab scene, n_importance must reduce the depth
        quantization error vs the same coarse budget."""
        rng = np.random.default_rng(0)
        field = _SlabField(sigma0=300.0, z_top=0.0)
        rays = make_rays(rng, 64)
        key = jax.random.PRNGKey(3)
        coarse_cfg = RenderConfig(n_samples=24, sc_n_samples=16, perturb=True)
        fine_cfg = RenderConfig(n_samples=24, sc_n_samples=16, perturb=True,
                                n_importance=48)
        d_c = np.asarray(render_rays(field, None, rays, key, coarse_cfg,
                                     shadows=False)["depth"])[:, 0]
        d_f = np.asarray(render_rays(field, None, rays, key, fine_cfg,
                                     shadows=False)["depth"])[:, 0]
        err_c = np.abs(d_c - 0.999).mean()
        err_f = np.abs(d_f - 0.999).mean()
        assert err_f < err_c * 0.6, (err_c, err_f)

    def test_gradients_flow(self):
        from eonerf_code_tpu.models.eonerf import EONerfField

        field = EONerfField(n_images=2, net_depth=2, net_width=32)
        params = field.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 3)),
                            jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32),
                            method="init_all")
        rng = np.random.default_rng(1)
        rays = make_rays(rng, 8)
        cfg = RenderConfig(n_samples=8, sc_n_samples=8, n_importance=8)

        def loss(p):
            out = render_rays(field, p, rays, jax.random.PRNGKey(1), cfg, True)
            return jnp.mean(out["rgb"] ** 2)

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
        assert any(float(jnp.abs(x).max()) > 0 for x in leaves)
