"""Virtual orthographic camera for the DSM sweep.

Port of the reference's nadir ray generator (eval_eonerf.py:78-249,
orthographic branch): parallel rays along the view direction, origins on a
plane perpendicular to it through a point at ``radius`` above the scene
origin (0, 0, -1), covering the [-1, 1]^2 footprint; near = max(0, radius-2),
far = near + 2.5; per-pixel sun directions from the chosen view's sun
elevation/azimuth, rescaled into the normalized frame.
"""

import numpy as np

from eonerf_code_tpu.data.satellite import dir_vec_from_el_az


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
                        img_downscale=1.0, radius=2.0):
    """(h*w, 11) nadir ray tensor incl. sun dirs (eval_eonerf.py:78-95)."""
    h = int(h // img_downscale)
    w = int(w // img_downscale)
    rays = virtual_ortho_rays(w, h, radius=radius, scene_scale=scene_scale)
    sun_d = dir_vec_from_el_az(sun_el_deg, sun_az_deg)
    sun_d = sun_d / np.asarray(scene_scale, np.float64)
    sun_d = sun_d / np.linalg.norm(sun_d)
    sun = np.tile(sun_d, (rays.shape[0], 1)).astype(np.float32)
    return np.hstack([rays, sun]).astype(np.float32), h, w
