"""Bundle adjustment: the learnable ray-offset params exist and train, and
the export maps a known scene-frame offset to the correct RPC shift."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eonerf_code_tpu.geo.bundle_adjust import corrected_rpc, rpc_offset_from_scene_offset
from eonerf_code_tpu.models.eonerf import EONerfField
from tests.test_geo import make_synthetic_rpc


class TestRayOffsetParams:
    def test_params_created_and_zero_init(self):
        field = EONerfField(n_images=5, net_depth=2, net_width=32, rpc_correction=True)
        params = field.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 3)),
                            jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32),
                            method="init_all")
        emb = params["params"]["ray_correction_enc"]["embedding"]
        assert emb.shape == (5, 3)
        np.testing.assert_allclose(np.asarray(emb), 0.0)
        off = field.apply(params, jnp.arange(5), method="ray_offset")
        np.testing.assert_allclose(np.asarray(off), 0.0)

    def test_offset_shifts_rendered_rays(self, rng=np.random.default_rng(0)):
        """A +z origin offset on image 0 must change that image's render."""
        from tests.test_render import make_rays
        from eonerf_code_tpu.render.satellite import RenderConfig, render_rays

        field = EONerfField(n_images=2, net_depth=2, net_width=32, rpc_correction=True)
        params = field.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 3)),
                            jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32),
                            method="init_all")
        rays = make_rays(rng, 16)
        cfg = RenderConfig(n_samples=16, sc_n_samples=16, perturb=False)
        out0 = render_rays(field, params, rays, jax.random.PRNGKey(1), cfg, False)
        shifted = jax.tree_util.tree_map(lambda x: x, params)
        emb = shifted["params"]["ray_correction_enc"]["embedding"]
        shifted["params"]["ray_correction_enc"]["embedding"] = emb.at[0, 2].set(-0.2)
        out1 = render_rays(field, shifted, rays, jax.random.PRNGKey(1), cfg, False)
        assert float(jnp.abs(out1["depth"] - out0["depth"]).max()) > 1e-4


class TestRPCExport:
    def test_known_offset_roundtrip(self):
        """For the synthetic affine RPC, an easting shift of de meters must
        produce d_col = de / (m_per_deg_lon * lon_scale) * col_scale."""
        rpc = make_synthetic_rpc(0.0)
        scene_scale = np.array([150.0, 150.0, 40.0])
        # scene origin near the rpc center, zone 17R
        from eonerf_code_tpu.geo import utm_from_latlon

        e0, n0 = utm_from_latlon(np.array([30.35]), np.array([-81.66]))
        origin = np.array([float(e0[0]), float(n0[0]), 0.0])
        offset_n = np.array([0.1, 0.0, 0.0])  # 15 m east
        d_col, d_row = rpc_offset_from_scene_offset(
            rpc, offset_n, scene_scale, origin, "17R")
        # this camera: col = lon_n * col_scale + ... -> d_col ~ 15 m in deg /
        # lon_scale * col_scale
        m_per_deg = 111320.0 * np.cos(np.radians(30.35))
        expected = (15.0 / m_per_deg) / rpc.lon_scale * rpc.col_scale
        np.testing.assert_allclose(d_col, expected, rtol=5e-3)
        assert abs(d_row) < abs(d_col) * 0.1

        fixed = corrected_rpc(rpc, offset_n, scene_scale, origin, "17R")
        np.testing.assert_allclose(fixed.col_offset, rpc.col_offset - d_col)
