"""Depth-prior and shadow-prior pipelines: DSM reprojection through the RPC
into per-ray depths, SGM-confidence gating, shadow-mask thresholding, and
the prior-loss training path."""

import os

import numpy as np
import pytest

from eonerf_code_tpu.config import TrainConfig
from eonerf_code_tpu.data.satellite import SatelliteDataset
from eonerf_code_tpu.data.synthetic import SyntheticScene, SyntheticSceneSpec, generate_scene
from eonerf_code_tpu.io.geotiff import write_geotiff, GeoTiffFile


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("prior_scene"))
    spec = SyntheticSceneSpec(n_views=3, n_test_views=1, img_size=32,
                              dsm_resolution=2.0)
    info = generate_scene(out, spec)
    info["spec"] = spec
    return info


class TestDepthPriors:
    def test_depth_priors_match_geometry(self, scene):
        """Using the GT DSM as the external prior: reprojected depths must
        agree with the true surface depth along each ray."""
        gt_dsm = os.path.join(scene["gt_dir"], f"{scene['aoi_id']}_DSM.tif")
        ds = SatelliteDataset(scene["root_dir"], scene["img_dir"], split="train",
                              prior_dsm_path=gt_dsm)
        assert ds.prior_depths is not None
        n = 32 * 32
        assert ds.prior_depths.shape == (3 * n,)
        valid = ds.prior_depths >= 0
        assert valid.mean() > 0.3  # DSM covers the central 80% of the scene

        # walk rays to the prior depth; altitude must equal the heightfield
        rays = ds.all_rays.astype(np.float64)
        d = ds.prior_depths.astype(np.float64)
        e, nn, a = ds.utmalt_from_depth(rays, d)
        sc = SyntheticScene(scene["spec"])
        gt_h = sc.height(e, nn)
        err = np.abs(a - gt_h)[valid]
        # 2 m DSM cells + 3x3 rasterizer splat smear building edges; the
        # bulk of the prior must be decimeter-accurate
        assert np.median(err) < 0.5
        assert np.quantile(err, 0.8) < 2.0

    def test_conf_prior_gating(self, scene, tmp_path):
        gt_dsm = os.path.join(scene["gt_dir"], f"{scene['aoi_id']}_DSM.tif")
        src = GeoTiffFile(gt_dsm)
        conf = np.full((src.height, src.width), 5.0, np.float32)
        conf[: src.height // 2] = 1.0  # low confidence in the north half
        conf_path = str(tmp_path / "conf.tif")
        write_geotiff(conf_path, conf, profile=src.profile)
        ds = SatelliteDataset(scene["root_dir"], scene["img_dir"], split="train",
                              prior_dsm_path=gt_dsm, prior_conf_path=conf_path)
        assert ds.prior_confs is not None
        assert ds.prior_confs.shape == ds.prior_depths.shape
        vals = ds.prior_confs[ds.prior_confs >= 0]
        assert set(np.unique(vals)) <= {1.0, 5.0}

    def test_training_with_depth_prior(self, scene, tmp_path):
        from eonerf_code_tpu.train.loop import Trainer

        gt_dsm = os.path.join(scene["gt_dir"], f"{scene['aoi_id']}_DSM.tif")
        cfg = TrainConfig(
            root_dir=scene["root_dir"], img_dir=scene["img_dir"],
            logs_dir=str(tmp_path), exp_name="p", init_dsm_path=gt_dsm,
            batch_size=256, max_train_steps=8, n_samples=16,
            net_depth=2, net_width=32, occ_enabled=False, val_freq=10**9)
        tr = Trainer(cfg)
        stats = tr.run(log_every=4)
        assert stats["steps"] == 8
        import json

        tags = set()
        with open(os.path.join(tr.log_dir, "metrics.jsonl")) as f:
            for line in f:
                tags.add(json.loads(line)["tag"])
        assert "train/depth_l2" in tags


class TestShadowPriors:
    def test_mask_loading_and_training(self, scene, tmp_path):
        # build shadow masks from the analytic scene: lit=1 (white), shadow=0
        from PIL import Image

        sc = SyntheticScene(scene["spec"])
        ds0 = SatelliteDataset(scene["root_dir"], scene["img_dir"], split="train")
        mask_dir = str(tmp_path / "masks")
        os.makedirs(mask_dir, exist_ok=True)
        import json as _json

        for json_name in sorted(os.listdir(scene["root_dir"])):
            if not json_name.endswith(".json"):
                continue
            with open(os.path.join(scene["root_dir"], json_name)) as f:
                meta = _json.load(f)
            img = (np.ones((32, 32)) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(mask_dir, meta["img"].replace(".tif", ".png")))

        ds = SatelliteDataset(scene["root_dir"], scene["img_dir"], split="train",
                              shadow_masks_dir=mask_dir)
        assert ds.prior_shadows is not None
        assert ds.prior_shadows.shape == (3 * 32 * 32,)
        np.testing.assert_array_equal(np.unique(ds.prior_shadows), [1.0])

        from eonerf_code_tpu.train.loop import Trainer

        cfg = TrainConfig(
            root_dir=scene["root_dir"], img_dir=scene["img_dir"],
            logs_dir=str(tmp_path / "logs"), exp_name="s",
            shadow_masks_dir=mask_dir,
            batch_size=256, max_train_steps=6, n_samples=16,
            net_depth=2, net_width=32, occ_enabled=False, val_freq=10**9,
            first_shadow_step=2, first_beta_step=2)
        tr = Trainer(cfg)
        stats = tr.run(log_every=2)
        assert stats["steps"] == 6


class TestDepthPriorVisualization:
    def test_save_depth_priors_img(self, scene, tmp_path):
        from eonerf_code_tpu.eval.run import save_depth_priors_img

        gt_dsm = os.path.join(scene["gt_dir"], f"{scene['aoi_id']}_DSM.tif")
        ds = SatelliteDataset(scene["root_dir"], scene["img_dir"], split="val")
        sample = ds.get_val_sample(0)
        save_depth_priors_img(ds, sample, gt_dsm, str(tmp_path / "out"))
        assert os.path.exists(os.path.join(tmp_path, "out", "depth_prior",
                                           sample["src_id"] + ".tif"))
        assert os.path.exists(os.path.join(tmp_path, "out", "dsm_prior",
                                           sample["src_id"] + ".tif"))
