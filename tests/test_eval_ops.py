"""Rasterization + registration + crop/MAE tests (SURVEY §4 seams:
plyflatten-equivalent grid average, NCC on synthetically shifted rasters)."""

import jax.numpy as jnp
import numpy as np
import pytest

from eonerf_code_tpu.eval.dsm import crop_to_projwin, dsm_pointwise_diff
from eonerf_code_tpu.eval.registration import (
    apply_shift_arrays,
    compute_shift_arrays,
    downsample2x,
    ncc,
    recursive_ncc,
)
from eonerf_code_tpu.io.geotiff import Affine, CRS, GeoTiffFile, write_geotiff
from eonerf_code_tpu.ops.raster import rasterize_pointcloud, rasterize_pointcloud_jax


class TestRaster:
    def test_single_cell_mean_with_neighborhood(self):
        # two points in the same cell -> that cell (and its 3x3 ring) = mean
        easts = np.array([10.2, 10.3])
        norths = np.array([99.7, 99.8])
        alts = np.array([5.0, 7.0])
        dsm = rasterize_pointcloud(easts, norths, alts, xoff=8.0, yoff=102.0,
                                   resolution=1.0, xsize=6, ysize=6, radius=1)
        # point cell: col=2, row=2
        assert dsm[2, 2] == 6.0
        assert dsm[1, 2] == 6.0  # ring
        assert np.isnan(dsm[5, 5])

    def test_radius_zero_exact_binning(self, rng):
        easts = rng.uniform(0, 10, 500)
        norths = rng.uniform(0, 10, 500)
        alts = rng.uniform(0, 100, 500)
        dsm = rasterize_pointcloud(easts, norths, alts, 0.0, 10.0, 1.0, 10, 10, radius=0)
        cols = np.floor(easts).astype(int)
        rows = np.floor(10.0 - norths).astype(int)
        for r, c in [(3, 4), (0, 0), (9, 9)]:
            sel = (cols == c) & (rows == r)
            if sel.any():
                np.testing.assert_allclose(dsm[r, c], alts[sel].mean())

    def test_jax_matches_numpy(self, rng):
        easts = rng.uniform(0, 20, 300)
        norths = rng.uniform(0, 20, 300)
        alts = rng.uniform(0, 50, 300)
        ref = rasterize_pointcloud(easts, norths, alts, 0.0, 20.0, 0.5, 40, 40, radius=1)
        dev = np.asarray(rasterize_pointcloud_jax(
            jnp.asarray(easts), jnp.asarray(norths), jnp.asarray(alts),
            0.0, 20.0, 0.5, 40, 40, radius=1))
        np.testing.assert_allclose(dev, ref, rtol=1e-10, equal_nan=True)


class TestRegistration:
    def test_downsample_nan_aware(self):
        u = np.array([[[1.0, np.nan], [3.0, 5.0]]])
        out = downsample2x(u)
        np.testing.assert_allclose(out[0, 0, 0], 3.0)

    def test_recovers_known_shift(self, rng):
        base = rng.standard_normal((300, 300)).astype(np.float64)
        # smooth it so NCC has structure
        from numpy.lib.stride_tricks import sliding_window_view

        k = 9
        sm = sliding_window_view(base, (k, k)).mean(axis=(2, 3))
        u = sm[10:210, 10:210][None]
        dx_true, dy_true = 7, -4
        v = sm[10 + dy_true:210 + dy_true, 10 + dx_true:210 + dx_true][None]
        # ncc compares u[j,i] to v[j+dy, i+dx]: v is u shifted by (-dx,-dy)
        dx, dy = recursive_ncc(u, v)
        assert (dx, dy) == (-dx_true, -dy_true)

    def test_affine_z_fit(self, rng):
        u = rng.standard_normal((1, 120, 120)) * 5 + 100
        v = u - 12.5  # constant bias
        dx, dy, a, b = compute_shift_arrays(u, v, scaling=False)
        assert (dx, dy) == (0, 0) and a == 1
        np.testing.assert_allclose(b, 12.5, atol=1e-9)
        out = apply_shift_arrays(v, dx, dy, a, b)
        np.testing.assert_allclose(out, u, atol=1e-9)

    def test_ncc_identical_is_one(self, rng):
        u = rng.standard_normal((1, 64, 64))
        np.testing.assert_allclose(ncc(u, u.copy()), 1.0, rtol=1e-12)


class TestCropAndDiff:
    def _write(self, path, arr, xoff, yoff, res=1.0):
        write_geotiff(path, arr.astype(np.float32), crs=CRS.from_utm_zone(17),
                      transform=Affine(res, 0, xoff, 0, -res, yoff), nodata=float("nan"))

    def test_crop_projwin(self, tmp_path, rng):
        arr = rng.standard_normal((40, 40))
        p = str(tmp_path / "src.tif")
        self._write(p, arr, xoff=100.0, yoff=200.0)
        src = GeoTiffFile(p)
        out, tr = crop_to_projwin(src, ulx=110.0, uly=190.0, lrx=130.0, lry=170.0, resolution=1.0)
        assert out.shape == (20, 20)
        np.testing.assert_allclose(out, arr[10:30, 10:30], atol=1e-6)
        assert tr.c == 110.0 and tr.f == 190.0

    def test_end_to_end_mae_of_biased_copy(self, tmp_path, rng):
        """GT vs a shifted+biased copy of itself: registration must undo both
        -> MAE ~ 0."""
        gt = (rng.standard_normal((200, 200)) * 2).astype(np.float64)
        from numpy.lib.stride_tricks import sliding_window_view

        gt = sliding_window_view(np.pad(gt, 4, mode="edge"), (9, 9)).mean(axis=(2, 3))
        gt_p = str(tmp_path / "gt.tif")
        self._write(gt_p, gt, xoff=0.0, yoff=200.0)

        pred = gt + 3.0  # pure z bias
        pred_p = str(tmp_path / "pred.tif")
        self._write(pred_p, pred, xoff=0.0, yoff=200.0)

        err = dsm_pointwise_diff(pred_p, gt_p, (0.0, 0.0, 200, 1.0))
        assert float(np.nanmean(np.abs(err))) < 1e-6
