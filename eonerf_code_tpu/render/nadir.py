"""Virtual cameras for the DSM sweep and novel-view rendering.

Port of the reference's virtual ray generator (eval_eonerf.py:78-249), BOTH
branches:

- orthographic (the branch the reference actually uses): parallel rays along
  the view direction, origins on a plane perpendicular to it through a point
  at ``radius`` above the scene origin (0, 0, -1), covering the [-1, 1]^2
  footprint; near = max(0, radius-2), far = near + 2.5;
- pinhole (hardcoded off in the reference via `pinhole = False`,
  eval_eonerf.py:152,166-179): a perspective camera posed by
  ``pose_spherical(azimuth, elevation, radius)``, per-pixel directions from
  the focal length, one shared origin at the camera center.

Per-pixel sun directions come from the chosen view's sun elevation/azimuth,
rescaled into the normalized frame.
"""

import numpy as np

from eonerf_code_tpu.data.satellite import dir_vec_from_el_az


def pose_spherical(theta_deg, phi_deg, radius):
    """Camera-to-world matrix at azimuth ``theta``, elevation ``phi``,
    distance ``radius`` (eval_eonerf.py:97-127)."""
    t, p = np.radians(theta_deg), np.radians(phi_deg)
    trans = np.eye(4)
    trans[2, 3] = radius
    rot_phi = np.array([[1, 0, 0, 0],
                        [0, np.cos(p), np.sin(p), 0],
                        [0, -np.sin(p), np.cos(p), 0],
                        [0, 0, 0, 1]])
    rot_theta = np.array([[np.cos(t), 0, -np.sin(t), 0],
                          [0, 1, 0, 0],
                          [np.sin(t), 0, np.cos(t), 0],
                          [0, 0, 0, 1]])
    return rot_theta @ rot_phi @ trans


def virtual_pinhole_rays(w, h, focal, radius=2.0, el_deg=0.0, az_deg=0.0,
                         near=None, far=None, pixel_center=0.5):
    """(h*w, 8) perspective ray tensor [o, d, near, far] in the normalized
    frame (the reference's dormant pinhole branch, eval_eonerf.py:166-179).

    Documented deviation: directions are NORMALIZED here, so [near, far]
    measures true arc length for every pixel; the reference marches t along
    UNNORMALIZED directions, reaching up to |d|x the span for oblique
    pixels. Since the branch is hardcoded off in the reference (no output
    to match) the well-defined metric convention wins.
    """
    c2w = pose_spherical(az_deg, el_deg, radius)
    x, y = np.meshgrid(np.arange(w, dtype=np.float64) + pixel_center,
                       np.arange(h, dtype=np.float64) + pixel_center,
                       indexing="xy")
    cam_dirs = np.stack([(x - w * 0.5) / focal, -(y - h * 0.5) / focal,
                         -np.ones_like(x)], axis=-1)
    dirs = (cam_dirs[..., None, :] * c2w[None, None, :3, :3]).sum(axis=-1)
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.broadcast_to(c2w[:3, -1], dirs.shape)
    near = max(0.0, radius - 2.0) if near is None else near
    far = near + 2.5 if far is None else far
    o = origins.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    ones = np.ones((o.shape[0], 1))
    return np.hstack([o, d, near * ones, far * ones]).astype(np.float32)


def virtual_ortho_rays(w, h, radius=2.0, el_deg=0.0, az_deg=0.0,
                       scene_scale=np.ones(3)):
    """(h*w, 8) ray tensor [o, d, near, far] in the normalized frame."""
    d = dir_vec_from_el_az(el_deg, az_deg).astype(np.float64)
    d = d / np.asarray(scene_scale, np.float64)
    d = d / np.linalg.norm(d)

    pt_o = np.array([0.0, 0.0, -1.0])
    pt_a = pt_o - radius * d  # center of the virtual image plane

    x = (np.arange(w) - w * 0.5) / (1.0 * w / radius) + pt_a[0]
    y = -(np.arange(h) - h * 0.5) / (1.0 * h / radius) + pt_a[1]
    X, Y = np.meshgrid(x, y)
    Z = ((-d[0] * (X - pt_a[0]) - d[1] * (Y - pt_a[1])) / d[2]) + pt_a[2]
    origins = np.stack([X.ravel(), Y.ravel(), Z.ravel()], 1)

    dirs = np.tile(d, (origins.shape[0], 1))
    near = max(0.0, radius - 2.0)
    far = near + 2.5
    ones = np.ones((origins.shape[0], 1))
    return np.hstack([origins, dirs, near * ones, far * ones]).astype(np.float32)


def nadir_rays_with_sun(w, h, sun_el_deg, sun_az_deg, scene_scale,
                        img_downscale=1.0, radius=2.0, pinhole=False):
    """(h*w, 11) nadir ray tensor incl. sun dirs (eval_eonerf.py:78-95).

    ``pinhole=True`` selects the perspective branch (the reference computes
    focal = max(h, w) // downscale, eval_eonerf.py:85)."""
    h = int(h // img_downscale)
    w = int(w // img_downscale)
    if pinhole:
        focal = max(h, w) // img_downscale
        rays = virtual_pinhole_rays(w, h, focal, radius=radius)
    else:
        rays = virtual_ortho_rays(w, h, radius=radius, scene_scale=scene_scale)
    sun_d = dir_vec_from_el_az(sun_el_deg, sun_az_deg)
    sun_d = sun_d / np.asarray(scene_scale, np.float64)
    sun_d = sun_d / np.linalg.norm(sun_d)
    sun = np.tile(sun_d, (rays.shape[0], 1)).astype(np.float32)
    return np.hstack([rays, sun]).astype(np.float32), h, w
