"""Bundle-adjustment export: learned ray-bundle offsets -> RPC corrections.

The framework learns per-image translations of the ray bundle in the
normalized scene frame (models/eonerf.py `ray_correction_enc` — the feature
the reference declares via --rpc_correction but never implements; its
building blocks live at sat_utils.py:365-450). This module converts a
learned offset into the equivalent per-image RPC row/col offset correction,
so adjusted cameras can be exported for downstream photogrammetry:

  1. denormalize the offset into UTM meters,
  2. convert a reference ground point with and without the offset to
     lon/lat via the (differentiable) inverse UTM,
  3. project both through the RPC; the image-space displacement is the
     col/row offset to SUBTRACT from the RPC.

Because satellite ray bundles are near-parallel, a constant image-space
shift captures the bundle translation to sub-pixel accuracy across the
scene — the same modeling assumption the EO-NeRF paper makes.
"""

import numpy as np

from eonerf_code_tpu.geo import lonlat_from_utm
from eonerf_code_tpu.geo.utm import N0_SOUTH


def rpc_offset_from_scene_offset(rpc, scene_offset_n, scene_scale, scene_origin,
                                 utm_zonestring, south=False, alt=0.0):
    """Image-space (d_col, d_row) equivalent of a normalized-frame bundle
    translation.

    Args:
      rpc: the image's RPCModel.
      scene_offset_n: (3,) learned offset in the normalized cube.
      scene_scale / scene_origin: the scene normalization (per-axis scale and
        UTM offset of the cube center).
      utm_zonestring: e.g. "17R".
      alt: reference altitude (meters) at which to evaluate the shift.
    Returns:
      (d_col, d_row): the shift the learned correction applies in image
      space. A corrected RPC uses col_offset - d_col, row_offset - d_row.
    """
    scene_offset_n = np.asarray(scene_offset_n, np.float64)
    scale = np.asarray(scene_scale, np.float64)
    origin = np.asarray(scene_origin, np.float64)
    d_world = scene_offset_n * scale  # meters (UTM frame)

    base = origin.copy()
    base[2] = alt
    shifted = base + d_world

    def project(pt):
        n = pt[1] - (N0_SOUTH if south else 0.0)
        lon, lat = lonlat_from_utm(np.array([pt[0]]), np.array([n]), utm_zonestring)
        col, row = rpc.projection(lon, lat, np.array([pt[2]]))
        return float(col[0]), float(row[0])

    c0, r0 = project(base)
    c1, r1 = project(shifted)
    return c1 - c0, r1 - r0


def corrected_rpc(rpc, scene_offset_n, scene_scale, scene_origin,
                  utm_zonestring, south=False, alt=0.0):
    """Return a copy of ``rpc`` with the learned bundle correction folded
    into its col/row offsets."""
    d_col, d_row = rpc_offset_from_scene_offset(
        rpc, scene_offset_n, scene_scale, scene_origin, utm_zonestring,
        south=south, alt=alt)
    out = rpc.rescaled(1.0)  # deep copy
    out.col_offset -= d_col
    out.row_offset -= d_row
    return out
