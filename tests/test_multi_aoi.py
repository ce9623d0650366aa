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

    def test_freq_reg_masks_and_matches_when_off(self, two_scenes):
        """freq_reg threads through the scene-parallel step: an annealing
        run executes, and freq_reg OFF is bit-identical to the pre-freq_reg
        behavior (the always-applied mask is exactly ones)."""
        import jax.numpy as jnp

        mesh = make_mesh(n_data=4, n_scene=2)
        kw = dict(n_samples=16, batch_size=64, net_depth=2, net_width=32)
        tr_off = MultiAOITrainer(two_scenes, mesh, **kw)
        np.testing.assert_array_equal(np.asarray(tr_off._pe_mask(0)), 1.0)
        l_off = np.asarray(tr_off.train_steps(2, shadows=False))

        tr_on = MultiAOITrainer(two_scenes, mesh, freq_reg_start_step=0,
                                freq_reg_end_step=10, **kw)
        m0 = np.asarray(tr_on._pe_mask(0))
        np.testing.assert_array_equal(m0[3:], 0.0)  # bands off at step 0
        l_on = np.asarray(tr_on.train_steps(2, shadows=False))
        assert np.all(np.isfinite(l_on))
        # same seeds, different effective encoding -> different trajectory
        assert not np.allclose(l_on, l_off)
        # past the ramp the mask is exactly all-ones again
        np.testing.assert_array_equal(np.asarray(tr_on._pe_mask(10)), 1.0)

    def test_params_sharded_over_scene_axis(self, two_scenes):
        mesh = make_mesh(n_data=4, n_scene=2)
        tr = MultiAOITrainer(two_scenes, mesh, n_samples=16, batch_size=64,
                             net_depth=2, net_width=32)
        kernel = tr.params["params"]["trunk"]["hidden_0"]["kernel"]
        devs = {s.device for s in kernel.addressable_shards}
        assert len(devs) == 8 or len(devs) == 2  # replicated within data groups
        shard_shape = kernel.addressable_shards[0].data.shape
        assert shard_shape[0] == 1  # one scene per scene-group


class TestMultiAOIPallas:
    """The pod production composition: shard_map over ("scene","data") with
    per-shard vmapped scenes and PLAIN pallas kernels (an opaque vmapped
    pallas call cannot be GSPMD-partitioned over the scene axis)."""

    def test_pallas_trajectory_matches_xla(self, two_scenes):
        mesh = make_mesh(n_data=4, n_scene=2)
        # perturb=False: deterministic midpoint sampling, because the
        # pallas path draws stratified jitter per data shard (local batch
        # shape) while the XLA path draws it globally — statistically
        # equivalent, not bit-matching
        kw = dict(n_samples=8, batch_size=32, net_depth=8, net_width=256,
                  seed=5, perturb=False)
        tr_x = MultiAOITrainer(two_scenes, mesh, **kw)
        tr_p = MultiAOITrainer(two_scenes, mesh, use_pallas=True, **kw)
        from eonerf_code_tpu.models.fused import PallasField

        assert isinstance(tr_p.render_field, PallasField)
        # step 1: losses computed from IDENTICAL initial params — only
        # kernel-vs-flax fp ordering differs (same init, same keys, and
        # pmean == the mean GSPMD inserts on the XLA path)
        lx = np.asarray(tr_x.train_steps(1, shadows=True))
        lp = np.asarray(tr_p.train_steps(1, shadows=True))
        np.testing.assert_allclose(lp, lx, rtol=1e-4, atol=1e-6)
        # step 2: adam's eps-normalized updates amplify eps-level grad
        # differences, so the trajectory tolerance is looser
        lx = np.asarray(tr_x.train_steps(1, shadows=True))
        lp = np.asarray(tr_p.train_steps(1, shadows=True))
        np.testing.assert_allclose(lp, lx, rtol=5e-3, atol=1e-5)
        a = np.asarray(tr_p.scene_params(0)["params"]["trunk"]["hidden_0"]["kernel"])
        b = np.asarray(tr_x.scene_params(0)["params"]["trunk"]["hidden_0"]["kernel"])
        rel = np.linalg.norm(a - b) / np.linalg.norm(b)
        assert rel < 5e-3, f"param divergence {rel}"

    def test_pallas_saved_acts_runs(self, two_scenes):
        mesh = make_mesh(n_data=4, n_scene=2)
        tr = MultiAOITrainer(two_scenes, mesh, n_samples=8, batch_size=32,
                             net_depth=8, net_width=256, use_pallas=True,
                             bwd_acts="saved")
        losses = tr.train_steps(1, shadows=True)
        assert np.all(np.isfinite(np.asarray(losses)))


class TestUnequalScenes:
    @pytest.fixture(scope="class")
    def unequal_scenes(self, tmp_path_factory):
        datasets = []
        # different image sizes -> different ray-pool lengths
        for i, (size, aoi) in enumerate([(32, "SYN_300"), (24, "SYN_400")]):
            out = str(tmp_path_factory.mktemp(f"uaoi{i}"))
            spec = SyntheticSceneSpec(n_views=3, n_test_views=1, img_size=size,
                                      seed=10 + i)
            info = generate_scene(out, spec, aoi_id=aoi)
            datasets.append(SatelliteDataset(info["root_dir"], info["img_dir"],
                                             split="train"))
        return datasets

    def test_zero_rays_lost(self, unequal_scenes):
        """Round-1 weakness: pools were truncated to the SMALLEST scene.
        Now every scene keeps its full pool (padded, padding never drawn)."""
        mesh = make_mesh(n_data=4, n_scene=2)
        tr = MultiAOITrainer(unequal_scenes, mesh, n_samples=16, batch_size=64,
                             net_depth=2, net_width=32)
        n0 = unequal_scenes[0].all_rays.shape[0]
        n1 = unequal_scenes[1].all_rays.shape[0]
        assert n0 != n1
        np.testing.assert_array_equal(tr.n_rays_per_scene, [n0, n1])
        # the stacked pool holds the LARGEST scene in full
        assert tr.data["rays"].shape[1] == max(n0, n1)
        # the big scene's tail rays (beyond the old n_min cut) are present
        big = 0 if n0 > n1 else 1
        np.testing.assert_allclose(
            np.asarray(tr.data["rays"][big, max(n0, n1) - 1]),
            np.asarray(unequal_scenes[big].all_rays[max(n0, n1) - 1]), rtol=1e-6)

    def test_indices_cover_full_pool_but_not_padding(self, unequal_scenes):
        import jax.numpy as jnp

        mesh = make_mesh(n_data=4, n_scene=2)
        tr = MultiAOITrainer(unequal_scenes, mesh, n_samples=16, batch_size=64,
                             net_depth=2, net_width=32)
        n_scene = jnp.asarray(tr.n_rays_per_scene)[:, None]
        u = jax.random.uniform(jax.random.PRNGKey(0), (tr.n_scenes, 20000))
        idx = np.asarray(jnp.minimum((u * n_scene).astype(jnp.int32), n_scene - 1))
        for s in range(2):
            n = tr.n_rays_per_scene[s]
            assert idx[s].max() < n          # padding never sampled
            assert idx[s].max() > 0.99 * n   # full pool actually covered
            assert idx[s].min() >= 0

    def test_training_step_runs(self, unequal_scenes):
        mesh = make_mesh(n_data=4, n_scene=2)
        tr = MultiAOITrainer(unequal_scenes, mesh, n_samples=16, batch_size=64,
                             net_depth=2, net_width=32)
        losses = tr.train_steps(2, shadows=False)
        assert np.all(np.isfinite(np.asarray(losses)))
