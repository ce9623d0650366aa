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
                         near=None, far=None, pixel_center=0.5, frame=None):
    """(h*w, 8) perspective ray tensor [o, d, near, far] in the normalized
    frame (the reference's dormant pinhole branch, eval_eonerf.py:166-179).

    Documented deviation: directions are NORMALIZED here, so [near, far]
    measures true arc length for every pixel; the reference marches t along
    UNNORMALIZED directions, reaching up to |d|x the span for oblique
    pixels. Since the branch is hardcoded off in the reference (no output
    to match) the well-defined metric convention wins.

    ``frame``: 3x3 with COLUMNS [east, north, up] in the scene's world axes
    (see virtual_ortho_rays). pose_spherical builds the camera in a local
    z-up frame; origins and directions are rotated by ``frame`` so ECEF
    scenes get the same consistent ENU geometry as the ortho branch.
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
    if frame is not None:
        frame = np.asarray(frame, np.float64)
        dirs = dirs @ frame.T
        origins = origins @ frame.T
    near = max(0.0, radius - 2.0) if near is None else near
    far = near + 2.5 if far is None else far
    o = origins.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    ones = np.ones((o.shape[0], 1))
    return np.hstack([o, d, near * ones, far * ones]).astype(np.float32)


def virtual_ortho_rays(w, h, radius=2.0, el_deg=0.0, az_deg=0.0,
                       scene_scale=np.ones(3), frame=None):
    """(h*w, 8) ray tensor [o, d, near, far] in the normalized frame.

    ``frame``: 3x3 with COLUMNS [east, north, up] expressed in the scene's
    world axes — identity (default) for the UTM frame, the local ENU basis
    at the scene center for ECEF scenes (enu_frame). The el/az convention
    is always local ENU; the frame maps it into the cube's axes. With
    frame=None the arithmetic below reduces bit-exactly to the reference's
    z-up construction (eval_eonerf.py:130-249)."""
    d_enu = dir_vec_from_el_az(el_deg, az_deg).astype(np.float64)
    if frame is None:
        e_ax = np.array([1.0, 0.0, 0.0])
        n_ax = np.array([0.0, 1.0, 0.0])
        u_ax = np.array([0.0, 0.0, 1.0])
        d = d_enu
    else:
        frame = np.asarray(frame, np.float64)
        e_ax, n_ax, u_ax = frame[:, 0], frame[:, 1], frame[:, 2]
        d = frame @ d_enu
    d = d / np.asarray(scene_scale, np.float64)
    d = d / np.linalg.norm(d)

    pt_o = -u_ax  # "bottom" of the scene cube along local up
    pt_a = pt_o - radius * d  # center of the virtual image plane

    x = (np.arange(w) - w * 0.5) / (1.0 * w / radius)
    y = -(np.arange(h) - h * 0.5) / (1.0 * h / radius)
    X, Y = np.meshgrid(x, y)
    # origins vary along (east, north); each origin's up-coordinate solves
    # the plane equation d . (origin - pt_a) = 0 — the reference's slanted
    # image plane through pt_a (eval_eonerf.py:171-177), in ENU components
    du, de, dn = d @ u_ax, d @ e_ax, d @ n_ax
    U = (-de * X - dn * Y) / du
    origins = (pt_a[None, :]
               + X.ravel()[:, None] * e_ax[None, :]
               + Y.ravel()[:, None] * n_ax[None, :]
               + U.ravel()[:, None] * u_ax[None, :])

    dirs = np.tile(d, (origins.shape[0], 1))
    near = max(0.0, radius - 2.0)
    far = near + 2.5
    ones = np.ones((origins.shape[0], 1))
    return np.hstack([origins, dirs, near * ones, far * ones]).astype(np.float32)


def enu_frame(ecef_center):
    """Local [east | north | up] basis (columns) at an ECEF point — the
    frame that makes el/az conventions meaningful inside an ECEF-normalized
    scene cube. The reference's ECEF prototype skips this rotation (its
    eval nadir camera and sun vectors use z-up axes in the ECEF frame,
    datasets/satellite.py:497-498 merely flips the sign), which is why its
    --ecef DSM eval is geometrically broken; this framework fixes it."""
    c = np.asarray(ecef_center, np.float64)
    u = c / np.linalg.norm(c)
    z = np.array([0.0, 0.0, 1.0])
    e = np.cross(z, u)
    e_norm = np.linalg.norm(e)
    if e_norm < 1e-9:
        # scene center on the rotation axis: "east" is ill-defined; any
        # orthonormal pair completes the basis (pick +y for determinism)
        e = np.array([0.0, 1.0, 0.0])
    else:
        e = e / e_norm
    n = np.cross(u, e)
    return np.stack([e, n, u], axis=1)


def nadir_rays_with_sun(w, h, sun_el_deg, sun_az_deg, scene_scale,
                        img_downscale=1.0, radius=2.0, pinhole=False,
                        frame=None):
    """(h*w, 11) nadir ray tensor incl. sun dirs (eval_eonerf.py:78-95).

    ``pinhole=True`` selects the perspective branch (the reference computes
    focal = max(h, w) // downscale, eval_eonerf.py:85). ``frame``: local
    [east|north|up] basis for ECEF scenes (see virtual_ortho_rays)."""
    h = int(h // img_downscale)
    w = int(w // img_downscale)
    if pinhole:
        focal = max(h, w) // img_downscale
        rays = virtual_pinhole_rays(w, h, focal, radius=radius, frame=frame)
    else:
        rays = virtual_ortho_rays(w, h, radius=radius, scene_scale=scene_scale,
                                  frame=frame)
    sun_d = dir_vec_from_el_az(sun_el_deg, sun_az_deg)
    if frame is not None:
        sun_d = np.asarray(frame, np.float64) @ sun_d
    sun_d = sun_d / np.asarray(scene_scale, np.float64)
    sun_d = sun_d / np.linalg.norm(sun_d)
    sun = np.tile(sun_d, (rays.shape[0], 1)).astype(np.float32)
    return np.hstack([rays, sun]).astype(np.float32), h, w
