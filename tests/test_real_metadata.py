"""Real-data readiness: the loader against adversarial metadata the
synthetic generator cannot produce by construction (VERDICT round-1 item 9).

Fixtures reproduce recorded real-world format quirks of DFC2019/IARPA-style
exports: uint16 multispectral GeoTIFFs with nodata, binary uint8 masks,
CRLF/blank-line split rosters, jsons without min_alt/max_alt, rasters a
pixel off their json dims, and large pixel grids through the native RPC
path."""

import json
import os

import numpy as np
import pytest

from eonerf_code_tpu.data.satellite import (
    SatelliteDataset,
    alt_bounds,
    cast_rays,
)
from eonerf_code_tpu.data.synthetic import SyntheticScene, SyntheticSceneSpec, generate_scene
from eonerf_code_tpu.geo import RPCModel
from eonerf_code_tpu.io.geotiff import Affine, write_geotiff
from eonerf_code_tpu.io.image import load_rgb_image


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("realmeta_scene"))
    spec = SyntheticSceneSpec(n_views=3, n_test_views=1, img_size=32)
    info = generate_scene(out, spec)
    info["spec"] = spec
    return info


class TestRasterQuirks:
    def test_uint16_multiband_with_nodata(self, tmp_path):
        """11-bit WorldView values in a uint16 container, 4 bands, nodata=0:
        must scale by the PAYLOAD bit depth (11-bit full scale 2047), not
        the container range (which would crush the data to [0, 0.03]) and
        not clip to white; nodata maps to 0 with no NaNs."""
        rng = np.random.default_rng(0)
        arr = rng.integers(1, 2047, size=(4, 16, 16)).astype(np.uint16)
        arr[0, 8, 8] = 2047  # full-scale 11-bit pixel
        arr[:, :4, :4] = 0  # nodata corner
        p = str(tmp_path / "wv3.tif")
        write_geotiff(p, arr, nodata=0.0)
        img = load_rgb_image(p)
        assert img.shape == (16, 16, 3)
        assert np.isfinite(img).all()
        assert abs(img.max() - 1.0) < 1e-6   # 2047/2047: full payload range
        assert img.mean() > 0.1              # not crushed toward zero
        np.testing.assert_array_equal(img[:4, :4], 0.0)

    def test_binary_uint8_mask_passthrough(self, tmp_path):
        """0/1 uint8 masks (shadow priors) must NOT be rescaled — the
        reference's max>1.1 heuristic keeps them and so do we."""
        m = np.zeros((1, 8, 8), np.uint8)
        m[0, :, 4:] = 1
        p = str(tmp_path / "mask.tif")
        write_geotiff(p, m)
        img = load_rgb_image(p)
        assert set(np.unique(img)) == {0.0, 1.0}

    def test_nan_nodata_float_raster(self, tmp_path):
        arr = np.full((1, 8, 8), 0.5, np.float32)
        arr[0, 0, 0] = np.nan
        p = str(tmp_path / "f.tif")
        write_geotiff(p, arr, nodata=float("nan"))
        img = load_rgb_image(p)
        assert np.isfinite(img).all()
        assert img[0, 0, 0] == 0.0


class TestSceneRadiometricScale:
    def test_one_scale_per_scene(self, scene_dir, tmp_path):
        """Views of one sensor whose maxes straddle full-scale boundaries
        (1000 / 1100 / 240 in uint16) must divide by the SAME scene-wide
        scale (2047), not per-image scales (1023 / 2047 / 255) — per-image
        inference produces 2-4x radiometric inconsistency across training
        views (advisor round-2 medium finding)."""
        import shutil

        root = scene_dir["root_dir"]
        root2 = str(tmp_path / "scene")
        shutil.copytree(root, root2)
        img_dir2 = str(tmp_path / "imgs")
        shutil.copytree(scene_dir["img_dir"], img_dir2)
        maxes = [1000.0, 1100.0, 240.0]
        for name, m in zip(scene_dir["names"], maxes):
            p = os.path.join(img_dir2, name + ".tif")
            img = load_rgb_image(p)  # float [0,1]
            u16 = np.round(img / max(img.max(), 1e-6) * m).astype(np.uint16)
            write_geotiff(p, u16.transpose(2, 0, 1))
        ds = SatelliteDataset(root2, img_dir2, split="train")
        assert ds.radiometric_scale == 2047.0
        # per-view maxes in the loaded pool reflect ONE divisor
        rgb_max = [ds.all_rgbs[ds.all_ids_img[:, 0] == i].max()
                   for i in range(len(maxes))]
        for got, m in zip(rgb_max, maxes):
            assert got == pytest.approx(m / 2047.0, rel=1e-3)
        # cached: a second dataset instance reuses the stored scale
        ds2 = SatelliteDataset(root2, img_dir2, split="train")
        assert ds2.radiometric_scale == 2047.0

    def test_uint8_scene_takes_trivial_path(self, scene_dir):
        ds = SatelliteDataset(scene_dir["root_dir"], scene_dir["img_dir"],
                              split="train")
        assert ds.radiometric_scale is None


class TestMetadataQuirks:
    def test_crlf_and_blank_lines_in_split(self, scene_dir, tmp_path):
        """train.txt exported from Windows tooling: CRLF endings, trailing
        blank lines, stray spaces."""
        root = scene_dir["root_dir"]
        with open(os.path.join(root, "train.txt")) as f:
            names = [p for p in f.read().split("\n") if ".json" in p]
        mangled = "\r\n".join(f"  {n} " for n in names) + "\r\n\r\n"
        import shutil

        root2 = str(tmp_path / "scene")
        shutil.copytree(root, root2)
        with open(os.path.join(root2, "train.txt"), "w") as f:
            f.write(mangled)
        loc = os.path.join(root2, "scene.loc_utm")
        if os.path.exists(loc):
            os.remove(loc)
        ds = SatelliteDataset(root2, scene_dir["img_dir"], split="train")
        assert len(ds.json_files) == len(names)
        assert ds.all_rays.shape[1] == 11

    def test_missing_alt_bounds_falls_back_to_rpc_range(self, scene_dir):
        root = scene_dir["root_dir"]
        name = scene_dir["names"][0]
        with open(os.path.join(root, name + ".json")) as f:
            d = json.load(f)
        lo, hi = alt_bounds(d)
        assert (lo, hi) == (float(d["min_alt"]), float(d["max_alt"]))
        d2 = {k: v for k, v in d.items() if k not in ("min_alt", "max_alt")}
        lo2, hi2 = alt_bounds(d2)
        rpc = d["rpc"]
        assert lo2 == pytest.approx(rpc["alt_offset"] - rpc["alt_scale"])
        assert hi2 == pytest.approx(rpc["alt_offset"] + rpc["alt_scale"])
        # and rays can actually be cast from the fallback bounds
        r = cast_rays([1.0, 2.0], [1.0, 2.0], RPCModel(rpc), lo2, hi2)
        assert np.isfinite(r).all()

    def test_raster_json_size_mismatch(self, scene_dir, tmp_path):
        """A raster one row/col off its json height/width must still produce
        an aligned (rays, rgbs) pairing."""
        import shutil

        root = scene_dir["root_dir"]
        root2 = str(tmp_path / "scene")
        shutil.copytree(root, root2)
        img_dir2 = str(tmp_path / "imgs")
        shutil.copytree(scene_dir["img_dir"], img_dir2)
        name = scene_dir["names"][0]
        img = load_rgb_image(os.path.join(img_dir2, name + ".tif"))
        bigger = np.pad(img, ((0, 1), (0, 1), (0, 0)), mode="edge")
        write_geotiff(os.path.join(img_dir2, name + ".tif"),
                      bigger.transpose(2, 0, 1).astype(np.float32))
        ds = SatelliteDataset(root2, img_dir2, split="train")
        n = ds.all_img_shapes.prod(axis=1).sum()
        assert ds.all_rays.shape[0] == n
        assert ds.all_rgbs.shape[0] == n

        # one pixel SMALLER than the json dims: edge-padded back
        smaller = img[:-1, :-1]
        write_geotiff(os.path.join(img_dir2, name + ".tif"),
                      smaller.transpose(2, 0, 1).astype(np.float32))
        ds = SatelliteDataset(root2, img_dir2, split="train")
        assert ds.all_rgbs.shape[0] == ds.all_rays.shape[0]


class TestNativeAtScale:
    def test_native_rpc_large_grid_matches_python(self, scene_dir):
        """>4096-px-wide pixel grids through the C++ RPC path (the size real
        WorldView crops reach) agree with the python path."""
        from eonerf_code_tpu import native

        if not native.available():
            pytest.skip("native library not built")
        root = scene_dir["root_dir"]
        with open(os.path.join(root, scene_dir["names"][0] + ".json")) as f:
            d = json.load(f)
        rpc = RPCModel(d["rpc"])
        n = 5000 * 50  # 250k points, wider than 4096 in one dimension
        rng = np.random.default_rng(1)
        cols = rng.uniform(0, 5000, n)
        rows = rng.uniform(0, 50, n)
        alts = rng.uniform(d["min_alt"], d["max_alt"], n)
        lon_n, lat_n = native.rpc_localize(rpc, cols, rows, alts)
        lon_p, lat_p = rpc.localization(cols, rows, alts)
        np.testing.assert_allclose(lon_n, lon_p, atol=1e-9)
        np.testing.assert_allclose(lat_n, lat_p, atol=1e-9)


class TestRealFormatFullPipeline:
    """One tiny train -> eval -> registered-MAE pass over a REAL-FORMAT
    fixture scene: uint16 11-bit-payload imagery, CRLF/whitespace rosters,
    fitted RPCs with real coefficient magnitudes (VERDICT r2 item 5) — so
    first contact with DFC2019 exercises the whole stack, not just the
    loader. Reference semantics: datasets/satellite.py:406-476,
    eval_eonerf.py:251-381."""

    @pytest.fixture(scope="class")
    def real_format_scene(self, tmp_path_factory):
        import shutil

        from eonerf_code_tpu.io.image import load_rgb_image

        base = str(tmp_path_factory.mktemp("realfmt_base"))
        spec = SyntheticSceneSpec(n_views=3, n_test_views=1, img_size=40,
                                  dsm_resolution=2.0)
        info = generate_scene(base, spec)
        # uint16 container, 11-bit payload (max ~1100 like real WorldView)
        for name in info["names"]:
            p = os.path.join(info["img_dir"], name + ".tif")
            img = load_rgb_image(p)
            u16 = np.round(img * 1100.0).astype(np.uint16)
            write_geotiff(p, u16.transpose(2, 0, 1))
        # CRLF + stray-whitespace rosters (Windows tooling exports)
        for roster in ("train.txt", "test.txt"):
            rp = os.path.join(info["root_dir"], roster)
            with open(rp) as f:
                names = [x for x in f.read().split("\n") if ".json" in x]
            with open(rp, "w", newline="") as f:
                f.write("\r\n".join(f"  {n} " for n in names) + "\r\n\r\n")
        loc = os.path.join(info["root_dir"], "scene.loc_utm")
        if os.path.exists(loc):
            os.remove(loc)  # recompute from the mangled rosters
        return info

    def test_train_eval_registered_mae(self, real_format_scene, tmp_path):
        from eonerf_code_tpu.config import TrainConfig
        from eonerf_code_tpu.eval.run import eval_eonerf
        from eonerf_code_tpu.train.loop import Trainer

        info = real_format_scene
        logs = str(tmp_path / "logs")
        cfg = TrainConfig(
            root_dir=info["root_dir"], img_dir=info["img_dir"],
            gt_dir=info["gt_dir"], logs_dir=logs, exp_name="realfmt",
            aoi_id=info["aoi_id"], batch_size=512, max_train_steps=400,
            n_samples=32, net_depth=4, net_width=64, occ_enabled=False,
            lr_decay_steps=300, first_shadow_step=250, first_beta_step=10**9,
            val_freq=10_000, chunk=1600, seed=0)
        tr = Trainer(cfg)
        # the scene-wide scale engaged (uint16 payload, ~11-bit max)
        assert tr.train_ds.radiometric_scale in (1023.0, 2047.0)
        stats = tr.run(log_every=200)
        assert stats["steps"] == 400

        out = eval_eonerf("realfmt", logs, str(tmp_path / "eval"), dsm=True,
                          gt_dir=info["gt_dir"], dsm_resolution=2.0)
        assert os.path.exists(out["dsm_path"])
        assert np.isfinite(out["mae"])
        # smoke bound: a working geometry/registration stack on 400 CPU
        # steps lands well under the ~10 m scale of a broken one
        assert out["mae"] < 8.0, f"registered MAE implausibly high: {out['mae']:.2f} m"
