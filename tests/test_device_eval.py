"""Device-side DSM evaluation must reproduce the host registration/MAE
pipeline on the same grids."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eonerf_code_tpu.eval.device import device_dsm_mae, rasterize_local
from eonerf_code_tpu.eval.registration import apply_shift_arrays, compute_shift_arrays
from eonerf_code_tpu.ops.raster import rasterize_pointcloud


def smooth(rng, n):
    from numpy.lib.stride_tricks import sliding_window_view

    base = rng.standard_normal((n + 8, n + 8)) * 4
    return sliding_window_view(base, (9, 9)).mean(axis=(2, 3))


class TestDeviceMAE:
    def test_recovers_shift_and_bias(self, rng):
        gt = smooth(rng, 240)
        dy_true, dx_true = 3, -2
        pred = np.roll(gt, (dy_true, dx_true), axis=(0, 1)) + 5.0
        mae, (dx, dy, bias) = jax.jit(device_dsm_mae)(jnp.asarray(pred), jnp.asarray(gt))
        # registration convention: pred[j+dy, i+dx] aligns with gt[j, i]
        assert (int(dx), int(dy)) == (dx_true, dy_true)
        np.testing.assert_allclose(float(bias), -5.0, atol=1e-3)
        # rolled edges wrap garbage; interior MAE must be ~0 -> overall small
        assert float(mae) < 0.2

    def test_matches_host_pipeline(self, rng):
        gt = smooth(rng, 200)
        pred = np.roll(gt, (2, 4), axis=(0, 1)) * 1.0 + 2.5
        pred[10:30, 40:60] = np.nan  # holes

        # host: compute shift + apply + clip + mae
        dxh, dyh, a, b = compute_shift_arrays(gt, pred, scaling=False)
        reg = apply_shift_arrays(pred, dxh, dyh, a, b)
        reg = np.clip(reg, np.nanmin(gt) - 10, np.nanmax(gt) + 10)
        err = reg - gt
        host_mae = np.nanmean(np.abs(err))

        mae, (dx, dy, bias) = jax.jit(device_dsm_mae)(jnp.asarray(pred), jnp.asarray(gt))
        assert (int(dx), int(dy)) == (dxh, dyh)
        np.testing.assert_allclose(float(bias), b, atol=1e-3)
        np.testing.assert_allclose(float(mae), host_mae, atol=5e-3)

    def test_identical_grids_zero(self, rng):
        gt = smooth(rng, 150)
        mae, (dx, dy, bias) = device_dsm_mae(jnp.asarray(gt), jnp.asarray(gt))
        assert (int(dx), int(dy)) == (0, 0)
        np.testing.assert_allclose(float(mae), 0.0, atol=1e-5)


class TestTrainerDeviceEval:
    def test_device_mae_close_to_host(self, tmp_path_factory):
        """On a briefly trained model, the device MAE must land near the
        host GeoTIFF pipeline's (different rasterization grids -> tolerance,
        not equality)."""
        from eonerf_code_tpu.config import TrainConfig
        from eonerf_code_tpu.data.synthetic import SyntheticSceneSpec, generate_scene
        from eonerf_code_tpu.train.loop import Trainer

        out = str(tmp_path_factory.mktemp("dev_eval_scene"))
        scene = generate_scene(out, SyntheticSceneSpec(n_views=3, n_test_views=1,
                                                       img_size=32, dsm_resolution=2.0))
        cfg = TrainConfig(root_dir=scene["root_dir"], img_dir=scene["img_dir"],
                          gt_dir=scene["gt_dir"], aoi_id=scene["aoi_id"],
                          logs_dir=str(tmp_path_factory.mktemp("dev_eval_logs")),
                          exp_name="d", batch_size=256, max_train_steps=40,
                          n_samples=24, net_depth=2, net_width=32,
                          occ_enabled=False, val_freq=10**9, chunk=1024)
        tr = Trainer(cfg)
        tr.run(log_every=10**9)
        sample = tr.val_ds.get_val_sample(0)
        pred = tr.render_view(sample, depth_only=True)
        host = tr._val_mae_host(sample, pred)
        dev = tr.val_mae_device(sample, pred)
        assert np.isfinite(dev) and np.isfinite(host)
        assert abs(dev - host) < max(0.3 * host, 0.5), (dev, host)


class TestDeviceRaster:
    def test_matches_host(self, rng):
        e = rng.uniform(0, 30, 400)
        n = rng.uniform(0, 30, 400)
        a = rng.uniform(0, 20, 400)
        host = rasterize_pointcloud(e, n, a, 0.0, 30.0, 1.0, 30, 30, radius=1)
        dev = np.asarray(rasterize_local(jnp.asarray(e, jnp.float32),
                                         jnp.asarray(n, jnp.float32),
                                         jnp.asarray(a, jnp.float32),
                                         0.0, 30.0, 1.0, 30, 30))
        np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-4, equal_nan=True)


class TestBestCheckpointTracking:
    def test_best_ckpt_saved_on_val_mae(self, tmp_path_factory):
        import os

        from eonerf_code_tpu.config import TrainConfig
        from eonerf_code_tpu.data.synthetic import SyntheticSceneSpec, generate_scene
        from eonerf_code_tpu.train.loop import Trainer

        out = str(tmp_path_factory.mktemp("best_scene"))
        scene = generate_scene(out, SyntheticSceneSpec(n_views=2, n_test_views=1,
                                                       img_size=24, dsm_resolution=2.0))
        cfg = TrainConfig(root_dir=scene["root_dir"], img_dir=scene["img_dir"],
                          gt_dir=scene["gt_dir"], aoi_id=scene["aoi_id"],
                          logs_dir=str(tmp_path_factory.mktemp("best_logs")),
                          exp_name="b", batch_size=128, max_train_steps=22,
                          n_samples=12, net_depth=2, net_width=32,
                          occ_enabled=False, val_freq=10, n_val_images=2,
                          chunk=576)
        tr = Trainer(cfg)
        tr.run(log_every=10**9)
        assert np.isfinite(tr.best_val_mae)
        assert os.path.exists(os.path.join(tr.log_dir, "ckpts", "epoch=best"))
