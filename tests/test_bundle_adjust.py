"""Bundle adjustment: the learnable ray-offset params exist and train, and
the export maps a known scene-frame offset to the correct RPC shift."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eonerf_code_tpu.geo.bundle_adjust import corrected_rpc, rpc_offset_from_scene_offset
from eonerf_code_tpu.models.eonerf import EONerfField
from tests.test_geo import make_synthetic_rpc


class TestRayOffsetParams:
    def test_params_created_and_zero_init(self):
        field = EONerfField(n_images=5, net_depth=2, net_width=32, rpc_correction=True)
        params = field.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 3)),
                            jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32),
                            method="init_all")
        emb = params["params"]["ray_correction_enc"]["embedding"]
        assert emb.shape == (5, 3)
        np.testing.assert_allclose(np.asarray(emb), 0.0)
        off = field.apply(params, jnp.arange(5), method="ray_offset")
        np.testing.assert_allclose(np.asarray(off), 0.0)

    def test_offset_shifts_rendered_rays(self, rng=np.random.default_rng(0)):
        """A +z origin offset on image 0 must change that image's render."""
        from tests.test_render import make_rays
        from eonerf_code_tpu.render.satellite import RenderConfig, render_rays

        field = EONerfField(n_images=2, net_depth=2, net_width=32, rpc_correction=True)
        params = field.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 3)),
                            jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32),
                            method="init_all")
        rays = make_rays(rng, 16)
        cfg = RenderConfig(n_samples=16, sc_n_samples=16, perturb=False)
        out0 = render_rays(field, params, rays, jax.random.PRNGKey(1), cfg, False)
        shifted = jax.tree_util.tree_map(lambda x: x, params)
        emb = shifted["params"]["ray_correction_enc"]["embedding"]
        shifted["params"]["ray_correction_enc"]["embedding"] = emb.at[0, 2].set(-0.2)
        out1 = render_rays(field, shifted, rays, jax.random.PRNGKey(1), cfg, False)
        assert float(jnp.abs(out1["depth"] - out0["depth"]).max()) > 1e-4


class TestRPCExport:
    def test_known_offset_roundtrip(self):
        """For the synthetic affine RPC, an easting shift of de meters must
        produce d_col = de / (m_per_deg_lon * lon_scale) * col_scale."""
        rpc = make_synthetic_rpc(0.0)
        scene_scale = np.array([150.0, 150.0, 40.0])
        # scene origin near the rpc center, zone 17R
        from eonerf_code_tpu.geo import utm_from_latlon

        e0, n0 = utm_from_latlon(np.array([30.35]), np.array([-81.66]))
        origin = np.array([float(e0[0]), float(n0[0]), 0.0])
        offset_n = np.array([0.1, 0.0, 0.0])  # 15 m east
        d_col, d_row = rpc_offset_from_scene_offset(
            rpc, offset_n, scene_scale, origin, "17R")
        # this camera: col = lon_n * col_scale + ... -> d_col ~ 15 m in deg /
        # lon_scale * col_scale
        m_per_deg = 111320.0 * np.cos(np.radians(30.35))
        expected = (15.0 / m_per_deg) / rpc.lon_scale * rpc.col_scale
        np.testing.assert_allclose(d_col, expected, rtol=5e-3)
        assert abs(d_row) < abs(d_col) * 0.1

        fixed = corrected_rpc(rpc, offset_n, scene_scale, origin, "17R")
        np.testing.assert_allclose(fixed.col_offset, rpc.col_offset - d_col)


class TestSyntheticRPCBias:
    """The factory's rpc_bias_px knob: images rendered with the TRUE camera,
    published RPCs biased — the miscalibration condition BA corrects."""

    def test_bias_shifts_rays_not_images(self, tmp_path):
        from eonerf_code_tpu.data.satellite import SatelliteDataset
        from eonerf_code_tpu.data.synthetic import SyntheticSceneSpec, generate_scene

        spec0 = SyntheticSceneSpec(n_views=3, n_test_views=1, img_size=32,
                                   dsm_resolution=2.0, seed=5)
        specb = SyntheticSceneSpec(n_views=3, n_test_views=1, img_size=32,
                                   dsm_resolution=2.0, seed=5, rpc_bias_px=2.0)
        clean = generate_scene(str(tmp_path / "clean"), spec0)
        biased = generate_scene(str(tmp_path / "biased"), specb)
        assert clean["rpc_biases_px"] == {}
        assert set(biased["rpc_biases_px"]) == set(biased["names"][:3])

        # pixels are identical: the bias lives in the metadata only
        from eonerf_code_tpu.io.geotiff import GeoTiffFile

        for name in clean["names"]:
            a = GeoTiffFile(f"{clean['img_dir']}/{name}.tif").read()
            b = GeoTiffFile(f"{biased['img_dir']}/{name}.tif").read()
            np.testing.assert_array_equal(a, b)

        # rays from the biased metadata are ground-shifted by ~bias*gsd
        ds_c = SatelliteDataset(clean["root_dir"], clean["img_dir"], split="train")
        ds_b = SatelliteDataset(biased["root_dir"], biased["img_dir"], split="train")
        n = 32 * 32
        gsd = spec0.extent / spec0.img_size
        zero = np.zeros(n)
        for i, name in enumerate(clean["names"][:3]):
            dc, dr = biased["rpc_biases_px"][name]
            expected_m = np.hypot(dc, dr) * gsd
            sl = slice(i * n, (i + 1) * n)
            ec, nc, _ = ds_c.utmalt_from_depth(ds_c.all_rays[sl], zero)
            eb, nb, _ = ds_b.utmalt_from_depth(ds_b.all_rays[sl], zero)
            shift = np.hypot(eb - ec, nb - nc)
            # origins live on the max_alt plane; the horizontal shift there
            # matches the image-space bias to ~20% (RPC fit + obliquity)
            np.testing.assert_allclose(np.median(shift), expected_m, rtol=0.2)

        # test views keep clean RPCs (identical metadata)
        import json

        tname = clean["names"][3]
        with open(f"{clean['root_dir']}/{tname}.json") as f:
            mc = json.load(f)
        with open(f"{biased['root_dir']}/{tname}.json") as f:
            mb = json.load(f)
        assert mb["rpc"] == mc["rpc"]


class TestBATraining:
    def test_ba_learns_compensating_offsets(self, tmp_path):
        """Miscalibrated scene + rpc_correction: after a short training run
        the learned per-image offsets, exported to image space, must
        correlate with the injected biases (mean-centered: the common-mode
        part is gauge freedom absorbed by DSM registration)."""
        from eonerf_code_tpu.config import TrainConfig
        from eonerf_code_tpu.data.synthetic import SyntheticSceneSpec, generate_scene
        from eonerf_code_tpu.geo.bundle_adjust import rpc_offset_from_scene_offset
        from eonerf_code_tpu.train.loop import Trainer

        spec = SyntheticSceneSpec(n_views=5, n_test_views=1, img_size=64,
                                  dsm_resolution=2.0, rpc_bias_px=4.0, seed=3)
        scene = generate_scene(str(tmp_path / "scene"), spec)
        cfg = TrainConfig(
            root_dir=scene["root_dir"], img_dir=scene["img_dir"],
            gt_dir=scene["gt_dir"], logs_dir=str(tmp_path / "logs"),
            exp_name="ba", aoi_id=scene["aoi_id"],
            batch_size=512, max_train_steps=400, n_samples=32,
            net_depth=4, net_width=64, occ_enabled=False,
            rpc_correction=True, sampler="uniform",
            # coarse-to-fine annealing is what makes BA converge: without
            # it the 4 px bias exceeds the photometric basin and the field
            # absorbs the misalignment into blurry geometry instead
            # (measured: corr +0.99 / 96% magnitude with, +0.13 / 11%
            # without at this exact setup)
            freq_reg_start_step=0, freq_reg_end_step=600,
            lr_decay_steps=1500, first_shadow_step=10**9,
            first_beta_step=10**9, val_freq=10**9, chunk=2304, seed=0)
        trainer = Trainer(cfg)
        trainer.run(log_every=200)

        emb = np.asarray(
            trainer.params["params"]["ray_correction_enc"]["embedding"])
        assert np.abs(emb).max() > 1e-4, "BA offsets never moved"

        ds = trainer.train_ds
        zonestring = ds.scene.utm_zonestring
        south = zonestring[-1] < "N"
        inj, got = [], []
        for i, name in enumerate(scene["names"][:5]):
            dc, dr = scene["rpc_biases_px"][name]
            d_col, d_row = rpc_offset_from_scene_offset(
                ds.all_rpcs[i], emb[i], ds.scene.scene_scale,
                ds.scene.scene_offset, zonestring, south=south)
            inj.append([dc, dr])
            got.append([d_col, d_row])
        inj = np.array(inj) - np.mean(inj, axis=0)
        got = np.array(got) - np.mean(got, axis=0)
        corr = float(np.sum(inj * got)
                     / (np.linalg.norm(inj) * np.linalg.norm(got) + 1e-12))
        relmag = float(np.linalg.norm(got) / (np.linalg.norm(inj) + 1e-12))
        # measured at this setup/horizon: corr +0.97, relmag 0.96
        assert corr > 0.8, f"learned offsets off-direction: corr={corr}"
        assert 0.5 < relmag < 1.5, f"learned offsets off-magnitude: {relmag}"
