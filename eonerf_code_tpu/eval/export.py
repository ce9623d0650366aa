"""Export bundle-adjusted cameras from a trained run.

The reference's --rpc_correction is declared but never wired
(SURVEY §2 #12); this framework trains real per-image ray-bundle offsets
(models/eonerf.py `ray_correction_enc`). For downstream photogrammetry the
learned scene-frame corrections are only useful folded back into the camera
model — this module writes, per train view, the original metadata with the
RPC's col/row offsets corrected (geo/bundle_adjust.py `corrected_rpc`),
plus the applied image-space shift for auditability.
"""

import os

import numpy as np

from eonerf_code_tpu.data.satellite import SatelliteDataset, read_json, write_json
from eonerf_code_tpu.geo.bundle_adjust import rpc_offset_from_scene_offset


def export_adjusted_rpcs(run_dir, output_dir, epoch_nb=None, root_dir=None,
                         img_dir=None):
    """Write bundle-adjusted RPC metadata for every train view of a run.

    Returns a dict {img_id: {"path", "d_col", "d_row"}}. Raises if the run
    was trained without --rpc_correction (no offsets to export).
    """
    from eonerf_code_tpu.eval.run import load_run

    cfg, _field, params = load_run(run_dir, epoch_nb)
    if root_dir:
        cfg.root_dir = root_dir
    if img_dir:
        cfg.img_dir = img_dir
    if cfg.cache_dir and not os.path.isdir(cfg.cache_dir):
        cfg.cache_dir = None

    enc = params["params"].get("ray_correction_enc")
    if enc is None:
        raise ValueError(
            f"run {run_dir} was trained without --rpc_correction: "
            "no bundle-adjustment offsets in the checkpoint")
    offsets = np.asarray(enc["embedding"], np.float64)

    ds = SatelliteDataset(cfg.root_dir, cfg.img_dir, split="train",
                          img_downscale=cfg.img_downscale, utm=not cfg.ecef,
                          cache_dir=cfg.cache_dir, subset=cfg.subset_n_views)
    zonestring = ds.scene.utm_zonestring
    south = zonestring[-1] < "N"
    os.makedirs(output_dir, exist_ok=True)

    out = {}
    for i, json_path in enumerate(ds.json_files):
        meta = read_json(json_path)
        rpc = ds.all_rpcs[i]
        d_col, d_row = rpc_offset_from_scene_offset(
            rpc, offsets[i], ds.scene.scene_scale, ds.scene.scene_offset,
            zonestring, south=south)
        # NB: ds.all_rpcs are rescaled by img_downscale; export at the
        # METADATA's native scale by applying the shift (also computed at
        # the working scale, so rescale it back) to the original dict
        scale = cfg.img_downscale if cfg.img_downscale else 1.0
        native = dict(meta["rpc"])
        native["col_offset"] = native["col_offset"] - d_col * scale
        native["row_offset"] = native["row_offset"] - d_row * scale
        meta_out = dict(meta)
        meta_out["rpc"] = native
        meta_out["rpc_adjustment_px"] = {
            "d_col": float(d_col * scale), "d_row": float(d_row * scale),
            "working_scale_d_col": float(d_col),
            "working_scale_d_row": float(d_row),
        }
        img_id = os.path.splitext(os.path.basename(json_path))[0]
        path = os.path.join(output_dir, img_id + ".json")
        write_json(meta_out, path)
        out[img_id] = {"path": path, "d_col": float(d_col * scale),
                       "d_row": float(d_row * scale)}
    return out
