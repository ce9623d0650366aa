"""Tests for the long-tail parity components: DNeRF, view sorting,
InfoNeRF entropy, patch index algebra."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eonerf_code_tpu.data.satellite import SatelliteDataset
from eonerf_code_tpu.data.synthetic import SyntheticSceneSpec, generate_scene
from eonerf_code_tpu.data import views
from eonerf_code_tpu.models.dnerf import DNeRF
from eonerf_code_tpu.ops.volrend import ray_entropy


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("parity_scene"))
    return generate_scene(out, SyntheticSceneSpec(n_views=3, n_test_views=1, img_size=24))


class TestDNeRF:
    def test_forward_and_warp(self, rng):
        model = DNeRF(warp_depth=2, warp_width=16)
        x = jnp.asarray(rng.uniform(-1, 1, (4, 5, 3)).astype(np.float32))
        t = jnp.full((4, 5, 1), 0.3)
        v = jnp.asarray(rng.standard_normal((4, 1, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x, t, v)
        rgb, sigma = model.apply(params, x, t, v)
        assert rgb.shape == (4, 5, 3) and sigma.shape == (4, 5)
        # density differs at different times (warp is time-conditioned)
        d1 = model.apply(params, x, jnp.zeros_like(t), method="density")
        d2 = model.apply(params, x, jnp.ones_like(t), method="density")
        assert not np.allclose(np.asarray(d1), np.asarray(d2))


class TestViewSorting:
    def test_incidence_order(self, scene):
        ordered = views.sort_by_increasing_view_incidence_angle(scene["root_dir"])
        assert len(ordered) == 4
        # zenith angles per generator: 10/24/38 cycling -> first is a 10-deg view
        from eonerf_code_tpu.geo import RPCModel

        with open(ordered[0]) as f:
            d = json.load(f)
        zen, _ = RPCModel(d["rpc"]).incidence_angles(*d["geojson"]["center"], z=0.0)
        assert zen < 15.0

    def test_solar_and_date_orders(self, scene):
        sol = views.sort_by_increasing_solar_incidence_angle(scene["root_dir"])
        dates = views.sort_by_acquisition_date(scene["root_dir"])
        doy = views.sort_by_day_of_the_year(scene["root_dir"])
        assert len(sol) == len(dates) == len(doy) == 4

    def test_shadow_sorting(self):
        masks = [np.array([0, 0, 0, 1]), np.array([1, 1, 1, 1]), np.array([0, 1, 1, 1])]
        order = views.sort_from_more_shadows_to_less_shadows(masks)
        assert order[0] == 0 and order[-1] == 1


class TestRayEntropy:
    def test_uniform_vs_peaked(self):
        k = 16
        uniform = jnp.full((1, k), 0.5)
        peaked = jnp.zeros((1, k)).at[0, 3].set(0.9)
        h_u = float(ray_entropy(uniform)[0])
        h_p = float(ray_entropy(peaked)[0])
        assert h_u > h_p
        np.testing.assert_allclose(h_u, np.log10(k), atol=1e-3)
        np.testing.assert_allclose(h_p, 0.0, atol=1e-6)


class TestPatchIndices:
    def test_roundtrip_and_patch(self, scene):
        ds = SatelliteDataset(scene["root_dir"], scene["img_dir"], split="train")
        # col/row <-> ray index round trip for image 1
        idx = ds.ray_index_from_colrow(np.array([5]), np.array([7]), np.array([1]))
        col, row, img = ds.colrow_from_ray_index(idx)
        assert (col[0], row[0], img[0]) == (5, 7, 1)
        # 3x3 patch has 9 unique in-image indices
        p = ds.patch_indices(int(idx[0]), patch_size=3)
        assert len(np.unique(p)) == 9
        cols, rows, imgs = ds.colrow_from_ray_index(p)
        assert set(imgs) == {1}
        assert cols.max() - cols.min() == 2 and rows.max() - rows.min() == 2
        # border clamp
        corner = ds.ray_index_from_colrow(np.array([0]), np.array([0]), np.array([0]))
        p2 = ds.patch_indices(int(corner[0]), patch_size=3)
        c2, r2, _ = ds.colrow_from_ray_index(p2)
        assert c2.min() == 0 and r2.min() == 0 and len(np.unique(p2)) == 9
