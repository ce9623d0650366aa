"""Scene-parallel (multi-AOI) training over a ("scene", "data") mesh on the
8-virtual-device CPU topology: 2 scenes x 4-way data parallelism."""

import jax
import numpy as np
import pytest

from eonerf_code_tpu.data.satellite import SatelliteDataset
from eonerf_code_tpu.data.synthetic import SyntheticSceneSpec, generate_scene
from eonerf_code_tpu.parallel.mesh import make_mesh
from eonerf_code_tpu.parallel.multi_aoi import MultiAOITrainer, stack_params, unstack_params


@pytest.fixture(scope="module")
def two_scenes(tmp_path_factory):
    datasets = []
    for i, (box_h, aoi) in enumerate([(20.0, "SYN_100"), (10.0, "SYN_200")]):
        out = str(tmp_path_factory.mktemp(f"aoi{i}"))
        spec = SyntheticSceneSpec(n_views=3, n_test_views=1, img_size=32,
                                  box_height=box_h, seed=i)
        info = generate_scene(out, spec, aoi_id=aoi)
        datasets.append(SatelliteDataset(info["root_dir"], info["img_dir"], split="train"))
    return datasets


class TestMultiAOI:
    def test_stack_unstack_roundtrip(self, rng):
        import jax.numpy as jnp

        trees = [{"a": jnp.asarray(rng.random((3, 2)).astype(np.float32))} for _ in range(2)]
        stacked = stack_params(trees)
        assert stacked["a"].shape == (2, 3, 2)
        back = unstack_params(stacked, 2)
        np.testing.assert_array_equal(np.asarray(back[1]["a"]), np.asarray(trees[1]["a"]))

    def test_scene_parallel_steps(self, two_scenes):
        mesh = make_mesh(n_data=4, n_scene=2)
        tr = MultiAOITrainer(two_scenes, mesh, n_samples=16, batch_size=64,
                             net_depth=2, net_width=32)
        # parameters start distinct per scene (different init keys)
        p0 = np.asarray(tr.scene_params(0)["params"]["trunk"]["hidden_0"]["kernel"])
        p1 = np.asarray(tr.scene_params(1)["params"]["trunk"]["hidden_0"]["kernel"])
        assert not np.allclose(p0, p1)

        losses = tr.train_steps(3, shadows=False)
        assert losses.shape == (2,)
        assert np.all(np.isfinite(np.asarray(losses)))

        # scenes evolve independently
        q0 = np.asarray(tr.scene_params(0)["params"]["trunk"]["hidden_0"]["kernel"])
        q1 = np.asarray(tr.scene_params(1)["params"]["trunk"]["hidden_0"]["kernel"])
        assert not np.allclose(q0, p0)
        assert not np.allclose(q1, p1)

    def test_params_sharded_over_scene_axis(self, two_scenes):
        mesh = make_mesh(n_data=4, n_scene=2)
        tr = MultiAOITrainer(two_scenes, mesh, n_samples=16, batch_size=64,
                             net_depth=2, net_width=32)
        kernel = tr.params["params"]["trunk"]["hidden_0"]["kernel"]
        devs = {s.device for s in kernel.addressable_shards}
        assert len(devs) == 8 or len(devs) == 2  # replicated within data groups
        shard_shape = kernel.addressable_shards[0].data.shape
        assert shard_shape[0] == 1  # one scene per scene-group
