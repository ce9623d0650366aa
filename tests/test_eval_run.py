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


class TestPinholeCamera:
    """The reference's dormant pinhole branch (eval_eonerf.py:152,166-179),
    implemented for real."""

    def test_shared_origin_and_fov(self):
        from eonerf_code_tpu.render.nadir import pose_spherical, virtual_pinhole_rays

        rays = virtual_pinhole_rays(16, 16, focal=16.0, radius=2.0)
        assert rays.shape == (256, 8)
        o, d = rays[:, :3], rays[:, 3:6]
        # one shared camera center for all rays
        assert np.allclose(o, o[0], atol=1e-7)
        np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-6)
        # nadir pose at radius 2: camera at (0, 0, 2) looking down -z
        np.testing.assert_allclose(o[0], [0.0, 0.0, 2.0], atol=1e-6)
        c = (16 // 2) * 16 + 16 // 2
        assert d[c, 2] < -0.99
        # rays diverge (perspective, not ortho)
        assert np.abs(d[0] - d[-1]).max() > 0.1
        # near/far per the reference rule: max(0, radius-2) / near+2.5
        np.testing.assert_allclose(rays[:, 6], 0.0)
        np.testing.assert_allclose(rays[:, 7], 2.5)

    def test_pose_spherical_matches_reference_composition(self):
        from eonerf_code_tpu.render.nadir import pose_spherical

        c2w = pose_spherical(30.0, 20.0, 3.0)
        # camera center distance preserved by the rotations
        np.testing.assert_allclose(np.linalg.norm(c2w[:3, 3]), 3.0, atol=1e-9)
        # rotation block is orthonormal
        r = c2w[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)

    def test_nadir_rays_with_sun_pinhole(self):
        from eonerf_code_tpu.render.nadir import nadir_rays_with_sun

        rays, h, w = nadir_rays_with_sun(10, 12, 40.0, 150.0,
                                         np.array([120.0, 110.0, 17.0]),
                                         pinhole=True)
        assert rays.shape == (120, 11)
        o = rays[:, :3]
        assert np.allclose(o, o[0], atol=1e-7)
        np.testing.assert_allclose(np.linalg.norm(rays[:, 8:11], axis=1), 1.0,
                                   atol=1e-5)

    def test_pinhole_honors_enu_frame(self):
        """The pinhole branch must rotate the CAMERA by the ENU frame,
        not just the sun vector — camera rays in the broken z-up basis
        with an ENU-rotated sun is exactly the inconsistent ECEF geometry
        the frame exists to fix."""
        from eonerf_code_tpu.render.nadir import (
            nadir_rays_with_sun,
            virtual_pinhole_rays,
        )

        # a non-trivial orthonormal [e|n|u] frame (90 deg about x)
        frame = np.array([[1.0, 0.0, 0.0],
                          [0.0, 0.0, 1.0],
                          [0.0, -1.0, 0.0]])
        base = virtual_pinhole_rays(8, 8, focal=8.0, radius=2.0)
        rot = virtual_pinhole_rays(8, 8, focal=8.0, radius=2.0, frame=frame)
        np.testing.assert_allclose(rot[:, :3], base[:, :3] @ frame.T,
                                   atol=1e-6)
        np.testing.assert_allclose(rot[:, 3:6], base[:, 3:6] @ frame.T,
                                   atol=1e-6)
        # identity frame is a no-op
        ident = virtual_pinhole_rays(8, 8, focal=8.0, radius=2.0,
                                     frame=np.eye(3))
        np.testing.assert_allclose(ident, base, atol=1e-7)
        # end to end: camera AND sun live in the same rotated basis
        scale = np.ones(3)
        r0, _, _ = nadir_rays_with_sun(6, 6, 40.0, 150.0, scale, pinhole=True)
        r1, _, _ = nadir_rays_with_sun(6, 6, 40.0, 150.0, scale, pinhole=True,
                                       frame=frame)
        np.testing.assert_allclose(r1[:, 3:6], r0[:, 3:6] @ frame.T,
                                   atol=1e-6)
        np.testing.assert_allclose(r1[:, 8:11], r0[:, 8:11] @ frame.T,
                                   atol=1e-5)

    def test_enu_frame_degenerate_at_pole(self):
        """enu_frame at a scene center on the rotation axis (east is
        ill-defined) must still return a finite orthonormal basis."""
        from eonerf_code_tpu.render.nadir import enu_frame

        for c in ([0.0, 0.0, 6356752.0], [0.0, 0.0, -6356752.0]):
            f = enu_frame(c)
            assert np.isfinite(f).all()
            np.testing.assert_allclose(f.T @ f, np.eye(3), atol=1e-12)
            # up stays radial
            np.testing.assert_allclose(f[:, 2], np.asarray(c) / np.linalg.norm(c),
                                       atol=1e-12)
