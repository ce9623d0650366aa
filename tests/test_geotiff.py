"""GeoTIFF codec tests: write->read round trips (our writer), plus reading
files produced by an independent encoder (PIL) to guard against a codec that
only understands itself."""

import numpy as np
import pytest

from eonerf_code_tpu.io import Affine, CRS, GeoTiffFile, load_rgb_image, write_geotiff


class TestRoundTrip:
    @pytest.mark.parametrize("dtype,count", [("float32", 1), ("uint8", 3), ("float64", 1), ("uint16", 2)])
    def test_write_read(self, tmp_path, rng, dtype, count):
        arr = (rng.random((count, 37, 53)) * 200).astype(dtype)
        path = str(tmp_path / "t.tif")
        tr = Affine(0.5, 0, 435000.0, 0, -0.5, 3359000.0)
        write_geotiff(path, arr, crs=CRS.from_utm_zone(17), transform=tr, nodata=float("nan"))
        f = GeoTiffFile(path)
        np.testing.assert_array_equal(f.read(), arr)
        assert f.crs.epsg == 32617
        assert f.res == (0.5, 0.5)
        assert np.isnan(f.nodata)
        assert f.bounds.left == 435000.0
        assert f.bounds.top == 3359000.0
        np.testing.assert_allclose(f.bounds.right, 435000.0 + 53 * 0.5)
        # per-band read is 1-based like rasterio
        np.testing.assert_array_equal(f.read(1), arr[0])

    def test_profile_round_trip(self, tmp_path, rng):
        arr = rng.random((1, 16, 16)).astype(np.float32)
        p1 = str(tmp_path / "a.tif")
        p2 = str(tmp_path / "b.tif")
        write_geotiff(p1, arr, crs=CRS.from_utm_zone(21, south=True),
                      transform=Affine(0.3, 0, 354000.0, 0, -0.3, 6182000.0), nodata=float("nan"))
        f = GeoTiffFile(p1)
        write_geotiff(p2, f.read(), profile=f.profile)
        g = GeoTiffFile(p2)
        assert g.crs.epsg == 32721
        assert g.transform == f.transform
        np.testing.assert_array_equal(g.read(), arr)

    def test_southern_hemisphere_zone(self):
        crs = CRS.from_utm_zone(21, south=True)
        assert crs.utm_zone() == (21, True)
        assert CRS(32617).utm_zone() == (17, False)


class TestForeignEncoders:
    def test_read_pil_uint8(self, tmp_path, rng):
        from PIL import Image

        arr = (rng.random((21, 34, 3)) * 255).astype(np.uint8)
        path = str(tmp_path / "pil.tif")
        Image.fromarray(arr).save(path)
        f = GeoTiffFile(path)
        np.testing.assert_array_equal(f.read().transpose(1, 2, 0), arr)

    @pytest.mark.parametrize("comp", ["tiff_lzw", "tiff_deflate", "packbits"])
    def test_read_pil_compressed(self, tmp_path, rng, comp):
        from PIL import Image

        arr = (rng.random((45, 67)) * 255).astype(np.uint8)
        path = str(tmp_path / f"{comp}.tif")
        Image.fromarray(arr).save(path, compression=comp)
        f = GeoTiffFile(path)
        np.testing.assert_array_equal(f.read(1), arr)

    def test_read_pil_float32(self, tmp_path, rng):
        from PIL import Image

        arr = rng.standard_normal((33, 44)).astype(np.float32)
        path = str(tmp_path / "f32.tif")
        Image.fromarray(arr, mode="F").save(path)
        f = GeoTiffFile(path)
        np.testing.assert_array_equal(f.read(1), arr)


class TestImageLoader:
    def test_load_rgb_tif(self, tmp_path, rng):
        arr = (rng.random((3, 24, 32)) * 255).astype(np.uint8)
        path = str(tmp_path / "rgb.tif")
        write_geotiff(path, arr)
        img = load_rgb_image(path)
        assert img.shape == (24, 32, 3)
        assert img.max() <= 1.0 and img.min() >= 0.0
        np.testing.assert_allclose(img, arr.transpose(1, 2, 0) / 255.0, atol=1e-6)

    def test_load_grayscale_png_tiled(self, tmp_path, rng):
        from PIL import Image

        arr = (rng.random((20, 20)) * 255).astype(np.uint8)
        path = str(tmp_path / "g.png")
        Image.fromarray(arr).save(path)
        img = load_rgb_image(path)
        assert img.shape == (20, 20, 3)
        np.testing.assert_array_equal(img[:, :, 0], img[:, :, 2])

    def test_downscale(self, tmp_path, rng):
        arr = (rng.random((3, 40, 60)) * 255).astype(np.uint8)
        path = str(tmp_path / "d.tif")
        write_geotiff(path, arr)
        img = load_rgb_image(path, downscale_factor=2)
        assert img.shape == (20, 30, 3)
