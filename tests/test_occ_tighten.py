"""Occupancy-informed per-ray sample tightening (VERDICT round-1 item 3):
the grid the reference maintains but never samples from
(train_eonerf.py:112-119; sampler commented at sat_rendering.py:234,257)
here tightens each camera ray's [t_lo, t_hi] to its occupied span."""

import jax
import jax.numpy as jnp
import numpy as np

from eonerf_code_tpu.ops.occupancy import OccupancyGrid
from eonerf_code_tpu.render.satellite import RenderConfig, render_rays
from tests.test_render import _SlabField, make_rays


def grid_with_slab(res=32, z_lo=-0.2, z_hi=0.1):
    """Grid occupied only inside the horizontal slab z in [z_lo, z_hi]."""
    g = OccupancyGrid.create(res)
    centers = (jnp.arange(res) + 0.5) * g.cell_size() + g.aabb_min
    occ_z = (centers >= z_lo) & (centers <= z_hi)
    binaries = jnp.broadcast_to(occ_z[None, None, :], (res, res, res))
    return g.replace(binaries=binaries)


class TestRaySpan:
    def test_span_covers_occupied_slab(self):
        g = grid_with_slab(z_lo=-0.2, z_hi=0.1)
        n = 16
        o = np.zeros((n, 3), np.float32)
        o[:, 0] = np.linspace(-0.8, 0.8, n)
        o[:, 2] = 0.999
        d = np.tile(np.array([0.0, 0.0, -1.0], np.float32), (n, 1))
        near = np.zeros(n, np.float32)
        t_lo, t_hi = g.ray_span(jnp.asarray(o), jnp.asarray(d),
                                jnp.asarray(near), 2.0)
        # nadir ray from z=0.999: slab top z=0.1 -> t=0.899, bottom -> t=1.199
        dt = 2.0 / 64
        assert np.all(np.asarray(t_lo) <= 0.899 + 1e-3)
        assert np.all(np.asarray(t_lo) >= 0.899 - 3.5 * dt)  # probe + margin
        assert np.all(np.asarray(t_hi) >= 1.199 - 1e-3)
        assert np.all(np.asarray(t_hi) <= 1.199 + 3.5 * dt)

    def test_empty_grid_falls_back_to_full_range(self):
        g = OccupancyGrid.create(16)  # all-empty
        o = jnp.asarray(np.array([[0.0, 0.0, 0.999]], np.float32))
        d = jnp.asarray(np.array([[0.0, 0.0, -1.0]], np.float32))
        t_lo, t_hi = g.ray_span(o, d, jnp.zeros(1), 2.0)
        assert float(t_lo[0]) == 0.0
        assert float(t_hi[0]) == 2.0

    def test_fully_occupied_grid_keeps_full_range(self):
        g = OccupancyGrid.create(16)
        g = g.replace(binaries=jnp.ones((16, 16, 16), bool))
        o = jnp.asarray(np.array([[0.0, 0.0, 0.999]], np.float32))
        d = jnp.asarray(np.array([[0.0, 0.0, -1.0]], np.float32))
        t_lo, t_hi = g.ray_span(o, d, jnp.zeros(1), 2.0)
        assert float(t_lo[0]) == 0.0
        assert abs(float(t_hi[0]) - 2.0) < 1e-6


class TestTightenedRendering:
    def test_fully_occupied_grid_is_bitwise_identical(self, rng):
        """A fully occupied grid tightens to the full range -> the render is
        bit-identical to no grid at all (same keys, same z construction)."""
        field = _SlabField(sigma0=200.0, z_top=0.0)
        rays = make_rays(rng, 16)
        cfg = RenderConfig(n_samples=32, sc_n_samples=32, occ_tighten=True)
        g = OccupancyGrid.create(16)
        g = g.replace(binaries=jnp.ones((16, 16, 16), bool))
        out_t = render_rays(field, None, rays, jax.random.PRNGKey(1), cfg,
                            shadows=False, occ_grid=g)
        cfg0 = RenderConfig(n_samples=32, sc_n_samples=32)
        out_0 = render_rays(field, None, rays, jax.random.PRNGKey(1), cfg0,
                            shadows=False)
        np.testing.assert_array_equal(np.asarray(out_t["depth"]),
                                      np.asarray(out_0["depth"]))
        np.testing.assert_array_equal(np.asarray(out_t["rgb"]),
                                      np.asarray(out_0["rgb"]))

    def test_tightening_cuts_depth_error_at_low_sample_count(self, rng):
        """The A/B that justifies the feature: on a slab scene with a correct
        grid, 16 tightened samples resolve the surface better than 16
        uniform samples over the full [0, 2] span."""
        field = _SlabField(sigma0=400.0, z_top=0.0)
        rays = make_rays(rng, 64)
        true_depth = 0.999  # origin z .999, surface z=0, nadir

        errs = {}
        for tighten in (False, True):
            cfg = RenderConfig(n_samples=16, sc_n_samples=16,
                               occ_tighten=tighten)
            g = grid_with_slab(z_lo=-0.25, z_hi=0.05) if tighten else None
            out = render_rays(field, None, rays, jax.random.PRNGKey(2), cfg,
                              shadows=False, occ_grid=g)
            errs[tighten] = float(np.mean(np.abs(
                np.asarray(out["depth"])[:, 0] - true_depth)))
        assert errs[True] < 0.5 * errs[False], errs

    def test_trainer_wiring_warmup_gate(self, tmp_path, rng):
        """Trainer hands the sampler no grid before occ_tighten_start_step
        and the real grid after."""
        from eonerf_code_tpu.config import preset
        from eonerf_code_tpu.train.loop import Trainer
        from eonerf_code_tpu.data.synthetic import SyntheticSceneSpec, generate_scene

        info = generate_scene(str(tmp_path / "scene"),
                              SyntheticSceneSpec(n_views=2, n_test_views=1,
                                                 img_size=24))
        cfg = preset("synthetic", root_dir=info["root_dir"],
                     img_dir=info["img_dir"], logs_dir=str(tmp_path / "logs"),
                     max_train_steps=4, batch_size=64, n_samples=8,
                     net_width=32, occ_enabled=True, n_grid=16,
                     occ_tighten=True, occ_tighten_start_step=2,
                     steps_per_call=4)
        tr = Trainer(cfg)
        assert tr._occ_for_sampling(step=0) is None
        # stability gate: a fixed step count alone does NOT enable tightening
        assert tr._occ_for_sampling(step=2) is None
        tr._occ_frac_hist = [0.30, 0.31, 0.30, 0.30, 0.30]  # converged grid
        assert tr._occ_for_sampling(step=2) is tr.occ_grid
        tr._occ_frac_hist = [0.50, 0.45, 0.40, 0.35, 0.30]  # still drifting
        assert tr._occ_for_sampling(step=2) is None
        tr._occ_frac_hist = []
        # the block scheduler may not cross the start step mid-block
        assert tr._block_size(0, 100, 100) <= 2
        tr.run(max_steps=4)  # smoke: the tightened megastep compiles + runs


class TestShadowTightening:
    def test_full_grid_shadow_tightening_tracks_dense_reference(self, rng):
        """Even a fully occupied grid tightens the shadow march to the
        in-cube segment (shadow rays exit the cube early), concentrating
        samples where transmittance can change — the result must be at
        least as close to a dense reference as the uniform march."""
        field = _SlabField(sigma0=200.0, z_top=0.0)
        rays = make_rays(rng, 32)
        g = OccupancyGrid.create(16)
        g = g.replace(binaries=jnp.ones((16, 16, 16), bool))

        def shadows(sc_n, tighten, grid):
            cfg = RenderConfig(n_samples=128, sc_n_samples=sc_n,
                               occ_tighten_shadows=tighten, perturb=False)
            out = render_rays(field, None, rays, jax.random.PRNGKey(3), cfg,
                              shadows=True, occ_grid=grid)
            return np.asarray(out["geo_shadows"])[:, 0]

        ref = shadows(512, False, None)
        err_u = np.abs(shadows(32, False, None) - ref).mean()
        err_t = np.abs(shadows(32, True, g) - ref).mean()
        assert err_t <= err_u + 1e-3, (err_t, err_u)

    def test_tightened_shadow_march_is_transmittance_exact(self, rng):
        """With a correct grid, a 32-sample tightened shadow march must be at
        least as close to the 256-sample reference as the 32-sample uniform
        march (sigma is zero outside occupied cells)."""
        field = _SlabField(sigma0=100.0, z_top=-0.5)
        rays = make_rays(rng, 64)
        g = grid_with_slab(z_lo=-1.0, z_hi=-0.45)

        def shadows(sc_n, tighten, grid):
            cfg = RenderConfig(n_samples=128, sc_n_samples=sc_n,
                               occ_tighten_shadows=tighten, perturb=False)
            out = render_rays(field, None, rays, jax.random.PRNGKey(4), cfg,
                              shadows=True, occ_grid=grid)
            return np.asarray(out["geo_shadows"])[:, 0]

        ref = shadows(256, False, None)
        err_u = np.abs(shadows(32, False, None) - ref).mean()
        err_t = np.abs(shadows(32, True, g) - ref).mean()
        assert err_t <= err_u + 1e-4, (err_t, err_u)


def test_eval_restores_checkpointed_grid(tmp_path):
    """load_occ_grid returns the trained grid for occ_tighten runs (eval
    samples the same way training did) and None when tightening is off."""
    from eonerf_code_tpu.config import preset
    from eonerf_code_tpu.eval.run import load_occ_grid
    from eonerf_code_tpu.train.loop import Trainer
    from eonerf_code_tpu.data.synthetic import SyntheticSceneSpec, generate_scene

    info = generate_scene(str(tmp_path / "scene"),
                          SyntheticSceneSpec(n_views=2, n_test_views=1,
                                             img_size=24))
    cfg = preset("synthetic", root_dir=info["root_dir"],
                 img_dir=info["img_dir"], logs_dir=str(tmp_path / "logs"),
                 max_train_steps=2, batch_size=64, n_samples=8,
                 net_width=32, occ_enabled=True, n_grid=16,
                 occ_tighten=True, occ_tighten_start_step=1,
                 steps_per_call=2)
    tr = Trainer(cfg)
    tr.run(max_steps=2)
    # the stability gate never opened in 2 steps -> this checkpoint trained
    # UNtightened, so eval must not tighten either (advisor round-2 finding)
    assert load_occ_grid(tr.log_dir, cfg) is None
    # once the gate is open at save time, eval restores the grid
    tr._occ_frac_hist = [0.5] * 6
    assert tr._occ_for_sampling() is not None
    tr.save()
    grid = load_occ_grid(tr.log_dir, cfg)
    assert grid is not None and grid.resolution == 16
    np.testing.assert_array_equal(np.asarray(grid.occs),
                                  np.asarray(tr.occ_grid.occs))
    cfg_off = preset("synthetic", root_dir=info["root_dir"],
                     img_dir=info["img_dir"], logs_dir=str(tmp_path / "logs"),
                     occ_tighten=False)
    assert load_occ_grid(tr.log_dir, cfg_off) is None

    # resume is behavior-transparent: the gate history survives restore, so
    # a resumed run samples tightened exactly like the uninterrupted one
    import dataclasses

    from eonerf_code_tpu.train import checkpoints as ckpt_lib

    cfg_resume = dataclasses.replace(
        cfg, ckpt_path=ckpt_lib.latest_checkpoint(tr.log_dir),
        exp_name="resumed")
    tr2 = Trainer(cfg_resume)
    assert tr2._occ_frac_hist == [0.5] * 6
    assert tr2._occ_for_sampling() is not None


def test_gate_state_is_self_contained_in_checkpoint(tmp_path):
    """The checkpoint pytree carries the tightening-gate tail (round-3
    verdict: sampling behavior must not depend on a file outside the
    checkpoint) — deleting occ_sampling.json changes nothing: resume
    samples tightened and eval restores the grid from the pytree alone;
    a gate-CLOSED checkpoint without its sidecar stays untightened."""
    import dataclasses
    import os

    from eonerf_code_tpu.config import preset
    from eonerf_code_tpu.eval.run import load_occ_grid
    from eonerf_code_tpu.train import checkpoints as ckpt_lib
    from eonerf_code_tpu.train.loop import Trainer
    from eonerf_code_tpu.data.synthetic import SyntheticSceneSpec, generate_scene

    info = generate_scene(str(tmp_path / "scene"),
                          SyntheticSceneSpec(n_views=2, n_test_views=1,
                                             img_size=24))
    cfg = preset("synthetic", root_dir=info["root_dir"],
                 img_dir=info["img_dir"], logs_dir=str(tmp_path / "logs"),
                 max_train_steps=2, batch_size=64, n_samples=8,
                 net_width=32, occ_enabled=True, n_grid=16,
                 occ_tighten=True, occ_tighten_start_step=1,
                 steps_per_call=2)
    tr = Trainer(cfg)
    tr.run(max_steps=2)

    # gate CLOSED at save time, sidecar lost -> still untightened
    path = tr.save()
    os.remove(os.path.join(path, "occ_sampling.json"))
    assert load_occ_grid(tr.log_dir, cfg) is None

    # gate OPEN at save time, history longer than the ring, sidecar lost
    # (dyadic values: the ring stores f32, the assert compares exactly)
    tr._occ_frac_hist = [0.9375, 0.875, 0.75] + [0.5] * 6  # 9 > ring of 8
    tr._entropy_hist = [0.25]
    assert tr._occ_for_sampling() is not None
    path = tr.save(epoch_tag="gateopen")
    os.remove(os.path.join(path, "occ_sampling.json"))

    cfg_resume = dataclasses.replace(cfg, ckpt_path=path,
                                     exp_name="resumed_noside")
    tr2 = Trainer(cfg_resume)
    # tail ring reconstructs the last 8 entries; the gate (window 5) sees
    # the identical tail, so sampling decisions match the original run
    assert tr2._occ_frac_hist == [0.875, 0.75] + [0.5] * 6
    assert tr2._entropy_hist == [0.25]
    assert tr2._occ_for_sampling() is not None

    # eval restores the grid from the pytree gate verdict alone
    grid = load_occ_grid(tr.log_dir, cfg, epoch_nb="gateopen")
    assert grid is not None and grid.resolution == 16

    # pre-gate checkpoint (old format, no "gate" subtree): restore falls
    # back to the old template and the sidecar
    old_state = tr._state_pytree()
    old_state.pop("gate")
    old_path = ckpt_lib.save_checkpoint(tr.log_dir, "oldfmt", old_state)
    import json

    with open(os.path.join(old_path, "occ_sampling.json"), "w") as f:
        json.dump({"frac_hist": [0.5] * 6, "entropy_hist": [],
                   "tighten_active": True}, f)
    tr3 = Trainer(dataclasses.replace(cfg, ckpt_path=old_path,
                                      exp_name="resumed_oldfmt"))
    assert tr3._occ_frac_hist == [0.5] * 6
    assert tr3._occ_for_sampling() is not None
