"""Full evaluation entry: DSM extraction from a trained run + altitude MAE.

Functional mirror of the reference's `eval_eonerf` (eval_eonerf.py:251-381):
reload opts.json, restore the checkpointed field, and either

- dsm=True: pick the most-nadir training view, build a virtual orthographic
  nadir camera over the scene cube, render depth (+ full outputs), extract
  the georeferenced DSM, register against lidar GT and report MAE; or
- dsm=False: render every train+test view and report beta-loss + PSNR.
"""

import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np

from eonerf_code_tpu.config import TrainConfig
from eonerf_code_tpu.data.rays import satrays_from_tensor
from eonerf_code_tpu.data.satellite import SatelliteDataset, get_file_id, read_json
from eonerf_code_tpu.models.eonerf import EONerfField
from eonerf_code_tpu.render.nadir import nadir_rays_with_sun
from eonerf_code_tpu.render.satellite import RenderConfig, render_image
from eonerf_code_tpu.train import checkpoints as ckpt_lib
from eonerf_code_tpu.utils import metrics as M


from eonerf_code_tpu.data.views import sort_by_increasing_view_incidence_angle as sort_views_by_incidence  # noqa: E402,E501


def load_run(run_dir, epoch_nb=None, n_images=None):
    """Restore (cfg, field, params) from a training run directory."""
    opts_path = os.path.join(run_dir, "opts.json")
    if not os.path.exists(opts_path):
        raise SystemExit(
            f"error: no training run at '{run_dir}' (missing {opts_path}); "
            "check the run id and --logs_dir")
    cfg = TrainConfig.load(opts_path)
    if epoch_nb is not None:
        path = os.path.join(run_dir, "ckpts", f"epoch={epoch_nb}")
    else:
        path = ckpt_lib.latest_checkpoint(run_dir)
    assert path is not None and os.path.exists(path), f"no checkpoint under {run_dir}"

    restored = ckpt_lib.restore_checkpoint(path)
    params = jax.tree_util.tree_map(jnp.asarray, restored["params"])

    if n_images is None:
        train_txt = os.path.join(cfg.root_dir, "train.txt")
        if os.path.exists(train_txt):
            with open(train_txt) as f:
                n_images = len([x for x in f.read().split("\n") if ".json" in x])
            if cfg.subset_n_views is not None and cfg.subset_n_views > 1:
                n_images = min(n_images, cfg.subset_n_views)
    # tolerate an embedding-vocab mismatch between checkpoint and dataset:
    # the checkpointed table size wins (eval_eonerf.py:52-56 — the reference
    # warns and adopts the embedding-dict shape)
    n_in_ckpt = params["params"]["transient_encoder"]["embedding"].shape[0]
    if n_images is not None and n_images != n_in_ckpt:
        print("warning: number of input images is inconsistent with the "
              f"shape of the embedding dictionary ({n_images} vs {n_in_ckpt})")
    n_images = n_in_ckpt
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    base_field = EONerfField(n_images=n_images, net_depth=cfg.net_depth,
                             net_width=cfg.net_width,
                             radiometric_normalization=cfg.radiometric_normalization,
                             rpc_correction=cfg.rpc_correction,
                             compute_dtype=dtype)
    # same backend selection as the trainer (train/loop.py): a bf16 run that
    # trained/validated through the fused Pallas kernels also EVALS through
    # them — one render backend per run, never two
    from eonerf_code_tpu.models.fused import make_render_field

    field = make_render_field(base_field, cfg)

    # checkpoint saved mid coarse-to-fine ramp: training only ever rendered
    # through the PE mask of its step (masked trunk rows carry untrained
    # random init) — eval must apply the SAME mask or its renders mix
    # trained structure with noise (train/loop.py _reg_params)
    end = getattr(cfg, "freq_reg_end_step", 0)
    ckpt_step = int(restored.get("step", end))
    if end > 0 and ckpt_step < end:
        from eonerf_code_tpu.models.encoders import barf_alpha, barf_freq_mask
        from eonerf_code_tpu.models.freq_reg import mask_trunk_pe

        deg = base_field.pos_enc_deg
        mask = barf_freq_mask(
            barf_alpha(ckpt_step, cfg.freq_reg_start_step, end, deg),
            3, 0, deg)
        params = mask_trunk_pe(params, mask)
    return cfg, field, params


def load_occ_grid(run_dir, cfg, epoch_nb=None):
    """Restore the checkpointed occupancy grid when the run trained with
    occ_tighten — eval must sample the same way training did. The
    checkpoint's occ_sampling.json sidecar records whether the stability
    gate had actually OPENED by this checkpoint: an early or
    never-stabilized checkpoint trained untightened, so eval must too."""
    if not getattr(cfg, "occ_tighten", False):
        return None
    path = (os.path.join(run_dir, "ckpts", f"epoch={epoch_nb}")
            if epoch_nb is not None else ckpt_lib.latest_checkpoint(run_dir))
    sidecar = os.path.join(path, "occ_sampling.json")
    restored = None
    if os.path.exists(sidecar):
        import json

        with open(sidecar) as f:
            if not json.load(f).get("tighten_active", True):
                return None
    else:
        # sidecar lost: the checkpoint pytree carries the gate verdict
        # (train/loop.py _gate_pytree) — the checkpoint is self-contained
        restored = ckpt_lib.restore_checkpoint(path)
        if "gate" in restored and not int(restored["gate"]["tighten_active"]):
            return None
    if restored is None:
        restored = ckpt_lib.restore_checkpoint(path)
    if "occ" not in restored:
        return None
    from eonerf_code_tpu.ops.occupancy import OccupancyGrid

    grid = OccupancyGrid.create(cfg.n_grid)
    return grid.replace(occs=jnp.asarray(restored["occ"]["occs"]),
                        binaries=jnp.asarray(restored["occ"]["binaries"]))


def save_outputs_to_images(dataset, sample, results, out_dir, suffix=""):
    """Write per-key rendered rasters + GT rgb + depth/DSM GeoTIFFs
    (reference: datasets/satellite.py:195-239)."""
    from eonerf_code_tpu.io.image import save_image_like

    src_id = sample["src_id"]
    src_path = os.path.join(dataset.img_dir, src_id + ".tif")
    h, w = sample["h"], sample["w"]
    for k in ("geo_shadows", "transient_s", "beta"):
        if k in results:
            img = np.asarray(results[k]).reshape(1, h, w).repeat(3, 0)
            save_image_like(os.path.join(out_dir, k, f"{src_id}{suffix}.tif"), img, src_path)
    for k in ("rgb", "ambient_rgb", "albedo_rgb"):
        if k in results:
            img = np.asarray(results[k]).reshape(h, w, 3).transpose(2, 0, 1)
            save_image_like(os.path.join(out_dir, k, f"{src_id}{suffix}.tif"), img, src_path)
    gt = np.asarray(sample["rgbs"]).reshape(h, w, 3).transpose(2, 0, 1)
    save_image_like(os.path.join(out_dir, "gt_rgb", f"{src_id}{suffix}.tif"), gt, src_path)
    if "depth" in results:
        _, _, alts = dataset.utmalt_from_depth(sample["rays"], np.asarray(results["depth"]))
        save_image_like(os.path.join(out_dir, "depth", f"{src_id}{suffix}.tif"),
                        np.asarray(alts, np.float32).reshape(1, h, w), src_path)
        dsm_res = 0.5 if "JAX" in src_id else 0.3
        dataset.dsm_from_depth(sample["rays"], np.asarray(results["depth"]),
                               dsm_path=os.path.join(out_dir, "dsm", f"{src_id}{suffix}.tif"),
                               resolution=dsm_res)


def save_depth_priors_img(dataset, sample, external_dsm_path, out_dir,
                          external_conf_path=None, suffix=""):
    """Write the reprojected depth-prior / DSM-prior / confidence rasters for
    one view (reference: datasets/satellite.py:241-264)."""
    import numpy as np

    from eonerf_code_tpu.io.image import save_image_like

    src_id = sample["src_id"]
    src_path = os.path.join(dataset.img_dir, src_id + ".tif")
    h, w = sample["h"], sample["w"]
    json_path = os.path.join(dataset.scene.root_dir, src_id + ".json")

    depths, confs = dataset.load_depth_priors_from_dsm(
        external_dsm_path, external_conf_path, json_files=[json_path])
    depth = np.asarray(depths[0] if isinstance(depths, list) else depths)
    _, _, alts = dataset.utmalt_from_depth(sample["rays"], depth)
    alts = np.asarray(alts, np.float32)
    alts[depth < 0.0] = np.nan
    save_image_like(os.path.join(out_dir, "depth_prior", f"{src_id}{suffix}.tif"),
                    alts.reshape(1, h, w), src_path)
    dsm_res = 0.5 if "JAX" in src_id else 0.3
    dataset.dsm_from_depth(sample["rays"], depth,
                           dsm_path=os.path.join(out_dir, "dsm_prior",
                                                 f"{src_id}{suffix}.tif"),
                           resolution=dsm_res)
    if confs is not None:
        conf = np.asarray(confs[0] if isinstance(confs, list) else confs, np.float32)
        conf[conf < 0.0] = np.nan
        save_image_like(os.path.join(out_dir, "conf_prior", f"{src_id}{suffix}.tif"),
                        conf.reshape(1, h, w), src_path)


def eval_eonerf(run_id, logs_dir, output_dir, epoch_nb=None, root_dir=None,
                img_dir=None, gt_dir=None, dsm=False, chunk=4096, dsm_resolution=None,
                pinhole=False, data_axis=0, nadir_frame="auto"):
    run_dir = os.path.join(logs_dir, run_id)
    cfg, field, params = load_run(run_dir, epoch_nb)
    if data_axis and data_axis != 1:
        import functools

        from eonerf_code_tpu.parallel.mesh import make_mesh
        from eonerf_code_tpu.render.satellite import render_image_sharded

        mesh = make_mesh(n_data=None if data_axis == -1 else data_axis)
        render = functools.partial(render_image_sharded, mesh=mesh)
        print(f"eval sharded over {mesh.shape['data']} devices", flush=True)
    else:
        render = render_image
    if root_dir:
        cfg.root_dir = root_dir
    if img_dir:
        cfg.img_dir = img_dir
    if gt_dir:
        cfg.gt_dir = gt_dir
    if cfg.cache_dir and not os.path.isdir(cfg.cache_dir):
        cfg.cache_dir = None

    dataset = SatelliteDataset(cfg.root_dir, cfg.img_dir, split="val",
                               img_downscale=cfg.img_downscale, utm=not cfg.ecef,
                               cache_dir=cfg.cache_dir)
    # evaluate over train + test rosters (eval_eonerf.py:269-276)
    files = dataset.scene._split_files("train.txt")
    if os.path.exists(os.path.join(cfg.root_dir, "test.txt")):
        files = files + dataset.scene._split_files("test.txt")
    dataset.json_files = [os.path.join(cfg.root_dir, p) for p in files]
    dataset.all_ids_img = list(range(len(files)))

    rcfg = RenderConfig(n_samples=cfg.n_samples,
                        sc_n_samples=cfg.resolve_sc_n_samples(),
                        n_importance=cfg.n_importance,
                        occ_tighten=cfg.occ_tighten,
                        occ_tighten_shadows=cfg.resolved_occ_tighten_shadows(),
                        occ_explore_frac=0.0)
    occ_grid = load_occ_grid(run_dir, cfg, epoch_nb)
    out_dir = os.path.join(output_dir, run_id)
    key = jax.random.PRNGKey(0)

    if dsm:
        nadir_json = sort_views_by_incidence(dataset.scene.root_dir)[0]
        d = read_json(nadir_json)
        src_id = get_file_id(nadir_json)
        # ECEF scenes: the cube's "up" is the local radial, not +z — build
        # the sweep in the ENU basis at the scene center (the reference's
        # --ecef prototype skips this and its DSM eval is geometrically
        # broken; render/nadir.py enu_frame). nadir_frame="zup" forces the
        # reference's broken construction (for A/B demonstration).
        frame = None
        if cfg.ecef and nadir_frame != "zup":
            from eonerf_code_tpu.render.nadir import enu_frame

            frame = enu_frame(dataset.scene.scene_offset)
        rays_np, h, w = nadir_rays_with_sun(
            int(d["width"]), int(d["height"]), 90.0 - float(d["sun_elevation"]),
            float(d["sun_azimuth"]), dataset.scene.scene_scale,
            img_downscale=cfg.img_downscale, pinhole=pinhole, frame=frame)
        rays = satrays_from_tensor(jnp.asarray(rays_np),
                                   jnp.zeros((rays_np.shape[0],), jnp.int32))
        results = render(field, params, rays, key, rcfg, shadows=True,
                         chunk=chunk, occ_grid=occ_grid)
        sample = {"rays": rays_np, "rgbs": np.ones((rays_np.shape[0], 3), np.float32),
                  "src_id": src_id, "h": h, "w": w}
        save_outputs_to_images(dataset, sample, results, out_dir)

        dsm_path = os.path.join(out_dir, "dsm", f"{src_id}.tif")
        if dsm_resolution is not None:  # non-default grids (synthetic scenes)
            dataset.dsm_from_depth(rays_np, np.asarray(results["depth"]),
                                   dsm_path=dsm_path, resolution=dsm_resolution)
        assert os.path.exists(dsm_path)
        if cfg.gt_dir is None:
            return {"dsm_path": dsm_path}

        aoi_id = cfg.aoi_id or (src_id[:7] if "JAX" in src_id
                                else os.path.basename(cfg.root_dir.rstrip("/")).replace("_new", ""))
        from eonerf_code_tpu.eval.dsm import compute_mae_and_save_dsm_diff

        epoch_tag = epoch_nb if epoch_nb is not None else "final"
        mae = compute_mae_and_save_dsm_diff(dsm_path, src_id, cfg.gt_dir, out_dir,
                                            epoch_tag, aoi_id)
        tmp = os.path.join(out_dir, f"{src_id}_rdsm_epoch{epoch_tag}.tif")
        final = tmp.replace(".tif", f"_{mae:.3f}.tif")
        if os.path.exists(tmp):
            shutil.move(tmp, final)
        return {"mae": mae, "dsm_path": dsm_path, "rdsm_path": final}

    # dsm=False: per-view photometric metrics
    report = []
    for i in range(len(dataset.json_files)):
        sample = dataset.get_val_sample(i)
        rays = satrays_from_tensor(jnp.asarray(sample["rays"]), jnp.asarray(sample["ts"]))
        results = render(field, params, rays, key, rcfg, shadows=True,
                         chunk=chunk, occ_grid=occ_grid)
        rgbs = jnp.asarray(sample["rgbs"])
        loss, _ = M.uncertainty_aware_loss(rgbs, results["rgb"], results["beta"])
        psnr_ = M.psnr(results["rgb"], rgbs)
        save_outputs_to_images(dataset, sample, results, out_dir)
        report.append({"src_id": sample["src_id"], "loss": float(loss), "psnr": float(psnr_)})
    return report
