"""Model tests: encoder layout vs the reference formula, EO-NeRF parameter
shapes (8x256 trunk with skip at 4, head widths), radiometric identity init,
occupancy grid update/query."""

import jax
import jax.numpy as jnp
import numpy as np

from eonerf_code_tpu.models.encoders import sinusoidal_encode, sinusoidal_latent_dim
from eonerf_code_tpu.models.eonerf import EONerfField
from eonerf_code_tpu.models.vanilla import VanillaNeRF
from eonerf_code_tpu.ops.occupancy import OccupancyGrid


class TestEncoder:
    def test_latent_dim(self):
        assert sinusoidal_latent_dim(3, 0, 10) == 63
        assert sinusoidal_latent_dim(3, 0, 4) == 27

    def test_layout_matches_reference_formula(self, rng):
        """Degree-major [identity | sin | cos] ordering (mlp.py:190-208)."""
        x = rng.standard_normal((5, 3)).astype(np.float32)
        out = np.asarray(sinusoidal_encode(jnp.asarray(x), 0, 4))
        scales = np.array([1.0, 2.0, 4.0, 8.0])
        xb = (x[:, None, :] * scales[:, None]).reshape(5, 12)
        expected = np.concatenate([x, np.sin(xb), np.sin(xb + 0.5 * np.pi)], axis=1)
        np.testing.assert_allclose(out, expected, atol=1e-6)

    def test_freq_mask(self, rng):
        x = rng.standard_normal((4, 3)).astype(np.float32)
        mask = np.zeros(27, np.float32)
        mask[:3] = 1.0  # identity only
        out = np.asarray(sinusoidal_encode(jnp.asarray(x), 0, 4, freq_mask=jnp.asarray(mask)))
        np.testing.assert_allclose(out[:, :3], x, atol=1e-6)
        np.testing.assert_allclose(out[:, 3:], 0.0)


class TestEONerfField:
    def test_param_shapes(self):
        field = EONerfField(n_images=10)
        params = field.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 3)),
                            jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32),
                            method="init_all")["params"]
        trunk = params["trunk"]
        assert trunk["hidden_0"]["kernel"].shape == (63, 256)
        assert trunk["hidden_5"]["kernel"].shape == (256 + 63, 256)  # post-skip layer
        assert trunk["hidden_7"]["kernel"].shape == (256, 256)
        assert params["sigma_head"]["output"]["kernel"].shape == (256, 1)
        assert params["bottleneck"]["output"]["kernel"].shape == (256, 256)
        assert params["albedo_mlp"]["hidden_0"]["kernel"].shape == (256, 128)
        assert params["albedo_mlp"]["output"]["kernel"].shape == (128, 3)
        assert params["transient_mlp"]["hidden_0"]["kernel"].shape == (256 + 4, 128)
        assert params["ambient_mlp"]["hidden_0"]["kernel"].shape == (27, 128)
        assert params["transient_encoder"]["embedding"].shape == (10, 4)
        assert params["radiometric_enc"]["embedding"].shape == (10, 9)

    def test_radiometric_identity_init(self):
        field = EONerfField(n_images=6)
        params = field.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 3)),
                            jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32),
                            method="init_all")
        a, b, bias = field.apply(params, jnp.arange(6), method="radiometric")
        np.testing.assert_allclose(np.asarray(a), 1.0)
        np.testing.assert_allclose(np.asarray(b), 0.0)
        np.testing.assert_allclose(np.asarray(bias), 0.0)

    def test_output_ranges(self, rng):
        field = EONerfField(n_images=3, net_depth=2, net_width=32)
        x = jnp.asarray(rng.uniform(-1, 1, (4, 7, 3)).astype(np.float32))
        sun = jnp.asarray(rng.standard_normal((4, 3)).astype(np.float32))
        idx = jnp.zeros((4,), jnp.int32)
        params = field.init(jax.random.PRNGKey(0), x, sun, idx, method="init_all")
        sigma, albedo, ambient, t_s, t_beta = field.apply(params, x, sun, idx)
        assert sigma.shape == (4, 7)
        assert albedo.shape == (4, 7, 3)
        assert ambient.shape == (4, 3)
        assert float(sigma.min()) >= 0.0  # softplus
        assert 0.0 <= float(albedo.min()) and float(albedo.max()) <= 1.0
        assert float(t_beta.min()) >= 0.0
        d = field.apply(params, x, method="density")
        np.testing.assert_allclose(np.asarray(d), np.asarray(sigma), atol=1e-6)


class TestVanillaNeRF:
    def test_forward(self, rng):
        model = VanillaNeRF(net_depth=2, net_width=32)
        x = jnp.asarray(rng.uniform(-1, 1, (5, 4, 3)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((5, 1, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x, v)
        rgb, sigma = model.apply(params, x, v)
        assert rgb.shape == (5, 4, 3) and sigma.shape == (5, 4)
        assert float(sigma.min()) >= 0.0


class TestOccupancyGrid:
    def test_update_and_query(self):
        grid = OccupancyGrid.create(resolution=16)

        def density_fn(xyz):  # occupied lower half-space
            return jnp.where(xyz[..., 2] < 0.0, 100.0, 0.0)

        grid = grid.update(density_fn, jax.random.PRNGKey(0), render_step_size=2 / 128)
        below = grid.query(jnp.asarray([[0.0, 0.0, -0.5]]))
        above = grid.query(jnp.asarray([[0.0, 0.0, 0.5]]))
        assert bool(below[0]) and not bool(above[0])

    def test_is_pytree(self):
        grid = OccupancyGrid.create(resolution=8)
        leaves = jax.tree_util.tree_leaves(grid)
        assert len(leaves) == 2


class TestOccupancyPartialUpdate:
    def test_subset_update_scatters(self):
        import jax
        import jax.numpy as jnp

        grid = OccupancyGrid.create(resolution=16)

        def density_fn(xyz):
            return jnp.full(xyz.shape[:-1], 100.0)

        g1 = grid.update(density_fn, jax.random.PRNGKey(0), 2 / 128, max_cells=256)
        # only a subset got the occupancy bump
        touched = int((g1.occs > 0).sum())
        assert 0 < touched <= 256
        # repeated updates keep growing coverage
        g2 = g1.update(density_fn, jax.random.PRNGKey(1), 2 / 128, max_cells=256)
        assert int((g2.occs > 0).sum()) >= touched
