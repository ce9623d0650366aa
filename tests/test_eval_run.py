"""Nadir virtual camera geometry + full eval_eonerf runner mechanics."""

import numpy as np
import pytest

from eonerf_code_tpu.render.nadir import nadir_rays_with_sun, virtual_ortho_rays


class TestNadirRays:
    def test_nadir_geometry(self):
        rays = virtual_ortho_rays(16, 16, radius=2.0, scene_scale=np.array([100.0, 100.0, 20.0]))
        assert rays.shape == (256, 8)
        o, d = rays[:, :3], rays[:, 3:6]
        # straight-down rays from the z=+1 plane covering [-1, 1]^2
        np.testing.assert_allclose(d[:, 2], -1.0, atol=1e-6)
        np.testing.assert_allclose(d[:, :2], 0.0, atol=1e-6)
        np.testing.assert_allclose(o[:, 2], 1.0, atol=1e-6)
        assert -1.0 <= o[:, 0].min() and o[:, 0].max() <= 1.0
        # near/far bounds per the reference (0 / 2.5)
        np.testing.assert_allclose(rays[:, 6], 0.0)
        np.testing.assert_allclose(rays[:, 7], 2.5)

    def test_sun_dirs_normalized(self):
        rays, h, w = nadir_rays_with_sun(10, 12, 40.0, 150.0,
                                         np.array([120.0, 110.0, 17.0]))
        assert (h, w) == (12, 10)
        assert rays.shape == (120, 11)
        np.testing.assert_allclose(np.linalg.norm(rays[:, 8:11], axis=1), 1.0, atol=1e-5)

    def test_oblique_view_plane_is_perpendicular(self):
        scale = np.array([100.0, 100.0, 20.0])
        rays = virtual_ortho_rays(8, 8, radius=2.0, el_deg=20.0, az_deg=45.0,
                                  scene_scale=scale)
        o, d = rays[:, :3].astype(np.float64), rays[0, 3:6].astype(np.float64)
        # all origins lie on a plane with normal d through pt_a
        rel = o - o.mean(0)
        np.testing.assert_allclose(rel @ d, 0.0, atol=1e-5)
