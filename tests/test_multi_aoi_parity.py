"""Multi-AOI trainer feature parity with the single-AOI trainer (VERDICT
round-3 item 4): RPC bundle adjustment per scene, the auto sampler's
worst-scene envelope rule, per-scene occupancy tightening with the
all-scenes stability gate, and sharded eval of a multi-AOI run — all on the
virtual CPU mesh (conftest pins 8 devices).

Reference context: the reference has no multi-AOI mode at all (one process
per AOI, /root/reference/opt.py:36-37); this matrix is internal consistency
of the framework's own pod-scale flagship, not reference parity.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eonerf_code_tpu.data.synthetic import SyntheticSceneSpec, generate_scene
from eonerf_code_tpu.train.multi import main_multi_train


@pytest.fixture(scope="module")
def biased_scene_dirs(tmp_path_factory):
    """Two scenes rendered with the TRUE cameras but published with RPCs
    biased by per-view pixel offsets (data/synthetic.py rpc_bias_px) — the
    2-scene bundle-adjustment fixture."""
    infos = []
    for i, aoi in enumerate(["SYN_310", "SYN_311"]):
        out = str(tmp_path_factory.mktemp(f"ba_aoi{i}"))
        spec = SyntheticSceneSpec(n_views=4, n_test_views=1, img_size=48,
                                  rpc_bias_px=3.0, seed=20 + i)
        infos.append(generate_scene(out, spec, aoi_id=aoi))
    return infos


class TestMultiAOIBundleAdjust:
    def test_rpc_correction_converges_on_biased_scenes(self, biased_scene_dirs,
                                                       tmp_path):
        """--rpc_correction --freq_reg_end_step N on the 2-scene biased-RPC
        fixture: every scene's learned per-image offsets must move toward
        its OWN injected biases (mean-centered, sign-matched correlation —
        BA can only fix the inconsistent part; the common mode is gauge
        freedom, see scripts/ab_bundle_adjust.py)."""
        infos = biased_scene_dirs
        steps = 120
        argv = ["--root_dirs", ",".join(i["root_dir"] for i in infos),
                "--img_dirs", ",".join(i["img_dir"] for i in infos),
                "--gt_dirs", ",".join(i["gt_dir"] for i in infos),
                "--aoi_ids", "SYN_310,SYN_311",
                "--logs_dir", str(tmp_path), "--exp_name", "pod_ba",
                "--scene_axis", "2", "--data_axis", "4",
                "--max_train_steps", str(steps), "--batch_size", "256",
                "--n_samples", "16", "--fc_layers", "2", "--fc_units", "32",
                "--lr", "2e-3",
                "--rpc_correction", "--freq_reg_end_step", str(steps // 2),
                "--first_shadow_step", str(10**9), "--log_every", "40"]
        stats = main_multi_train(argv)
        assert stats["steps"] == steps

        from eonerf_code_tpu.data.satellite import SatelliteDataset
        from eonerf_code_tpu.eval.run import load_run
        from eonerf_code_tpu.geo.bundle_adjust import rpc_offset_from_scene_offset

        for info, aoi in zip(infos, ("SYN_310", "SYN_311")):
            run_dir = os.path.join(str(tmp_path), "pod_ba", aoi)
            cfg, field, params = load_run(run_dir)
            assert cfg.rpc_correction is True
            emb = np.asarray(params["params"]["ray_correction_enc"]["embedding"])
            assert emb.shape[0] >= len(info["names"]) - 1
            # offsets trained (received gradient, moved off init)
            assert np.abs(emb).max() > 0
            ds = SatelliteDataset(info["root_dir"], info["img_dir"],
                                  split="train")
            zone = ds.scene.utm_zonestring
            inj, got = [], []
            for i, name in enumerate(info["names"]):
                if name not in info["rpc_biases_px"] or i >= emb.shape[0]:
                    continue
                dc_i, dr_i = info["rpc_biases_px"][name]
                dc_g, dr_g = rpc_offset_from_scene_offset(
                    ds.all_rpcs[i], emb[i], ds.scene.scene_scale,
                    ds.scene.scene_offset, zone, south=zone[-1] < "N")
                inj.append([dc_i, dr_i])
                got.append([dc_g, dr_g])
            inj = np.array(inj) - np.mean(inj, axis=0)
            got = np.array(got) - np.mean(got, axis=0)
            # sign-matched correlation (the learned shift may oppose the
            # injected camera bias); 120 CPU steps on a toy scene gives a
            # directional signal, not the production +0.99
            corr = np.sum(inj * got) / max(
                np.linalg.norm(inj) * np.linalg.norm(got), 1e-9)
            assert abs(corr) > 0.3, \
                f"{aoi}: learned offsets uncorrelated with injected bias " \
                f"(corr {corr:+.2f})"


@pytest.fixture(scope="module")
def compact_scene_dirs(tmp_path_factory):
    infos = []
    for i, aoi in enumerate(["SYN_320", "SYN_321"]):
        out = str(tmp_path_factory.mktemp(f"occ_aoi{i}"))
        spec = SyntheticSceneSpec(n_views=3, n_test_views=1, img_size=32,
                                  seed=30 + i)
        infos.append(generate_scene(out, spec, aoi_id=aoi))
    return infos


class TestMultiAOISampler:
    def test_auto_resolves_tighten_on_compact_scenes(self, compact_scene_dirs,
                                                     tmp_path, capsys):
        """sampler=auto on two compact-envelope scenes -> tightening: grids
        update, opts.json records the RESOLVED flags, and the checkpoint
        carries per-scene occ state + the tighten_active sidecar."""
        infos = compact_scene_dirs
        argv = ["--root_dirs", ",".join(i["root_dir"] for i in infos),
                "--img_dirs", ",".join(i["img_dir"] for i in infos),
                "--aoi_ids", "SYN_320,SYN_321",
                "--logs_dir", str(tmp_path), "--exp_name", "pod_occ",
                "--scene_axis", "2", "--data_axis", "4",
                "--max_train_steps", "4", "--batch_size", "64",
                "--n_samples", "12", "--fc_layers", "2", "--fc_units", "32",
                "--n_grid", "16",
                "--first_shadow_step", str(10**9), "--log_every", "2"]
        main_multi_train(argv)
        out = capsys.readouterr().out
        assert "sampler=auto -> tighten" in out
        from eonerf_code_tpu.config import TrainConfig
        from eonerf_code_tpu.eval.run import load_occ_grid
        from eonerf_code_tpu.train.checkpoints import (
            latest_checkpoint,
            restore_checkpoint,
        )

        for aoi in ("SYN_320", "SYN_321"):
            run_dir = os.path.join(str(tmp_path), "pod_occ", aoi)
            cfg = TrainConfig.load(os.path.join(run_dir, "opts.json"))
            assert cfg.sampler == "tighten" and cfg.occ_tighten
            assert cfg.n_grid == 16
            ck = latest_checkpoint(run_dir)
            occ = restore_checkpoint(ck)["occ"]
            assert occ["occs"].shape == (16**3,)
            assert occ["binaries"].shape == (16, 16, 16)
            with open(os.path.join(ck, "occ_sampling.json")) as f:
                sidecar = json.load(f)
            # 4 steps, start_step 2000: the gate never opened; eval must
            # therefore sample UNTIGHTENED (single-AOI sidecar semantics)
            assert sidecar["tighten_active"] is False
            # SAME schema as train/loop.py's sidecar ("frac_hist"), so
            # train_eonerf.py --ckpt_path can continue the scene
            assert "frac_hist" in sidecar
            assert all(isinstance(x, float) for x in sidecar["frac_hist"])
            assert load_occ_grid(run_dir, cfg) is None

    def test_hierarchical_forced_and_shape_rule(self, compact_scene_dirs,
                                                tmp_path):
        infos = compact_scene_dirs
        argv = ["--root_dirs", ",".join(i["root_dir"] for i in infos),
                "--img_dirs", ",".join(i["img_dir"] for i in infos),
                "--aoi_ids", "SYN_320,SYN_321",
                "--logs_dir", str(tmp_path), "--exp_name", "pod_hier",
                "--scene_axis", "2", "--data_axis", "4",
                "--sampler", "hierarchical",
                "--max_train_steps", "2", "--batch_size", "64",
                "--n_samples", "16", "--fc_layers", "2", "--fc_units", "32",
                "--first_shadow_step", str(10**9), "--log_every", "2"]
        main_multi_train(argv)
        from eonerf_code_tpu.config import TrainConfig

        cfg = TrainConfig.load(os.path.join(
            str(tmp_path), "pod_hier", "SYN_320", "opts.json"))
        # the validated 3/4-coarse + half-fine shape (train/loop.py rule)
        assert cfg.n_samples == 12 and cfg.n_importance == 6
        assert cfg.sampler == "hierarchical" and not cfg.occ_tighten

    def test_explicit_n_importance_wins_over_sampler_string(
            self, compact_scene_dirs, tmp_path):
        """--sampler uniform --n_importance 4: the explicit flag wins (the
        single-AOI resolver's precedence) and the RECORDED sampler names
        what the program actually runs — opts.json must never say "uniform"
        while training performs importance resampling."""
        infos = compact_scene_dirs
        argv = ["--root_dirs", ",".join(i["root_dir"] for i in infos),
                "--img_dirs", ",".join(i["img_dir"] for i in infos),
                "--aoi_ids", "SYN_320,SYN_321",
                "--logs_dir", str(tmp_path), "--exp_name", "pod_imp",
                "--scene_axis", "2", "--data_axis", "4",
                "--sampler", "uniform", "--n_importance", "4",
                "--max_train_steps", "2", "--batch_size", "64",
                "--n_samples", "16", "--fc_layers", "2", "--fc_units", "32",
                "--first_shadow_step", str(10**9), "--log_every", "2"]
        main_multi_train(argv)
        from eonerf_code_tpu.config import TrainConfig

        cfg = TrainConfig.load(os.path.join(
            str(tmp_path), "pod_imp", "SYN_320", "opts.json"))
        assert cfg.sampler == "hierarchical" and cfg.n_importance == 4
        # explicit shape: the 3/4+half reshape must NOT apply
        assert cfg.n_samples == 16

    def test_gate_opens_when_all_scenes_stable(self, compact_scene_dirs,
                                               tmp_path):
        """The all-scenes stability gate: stable histories on every scene
        open it; one drifting scene holds it closed for ALL (the sampling
        branch is shared by the vmapped program)."""
        from eonerf_code_tpu.data.satellite import SatelliteDataset
        from eonerf_code_tpu.parallel.mesh import make_mesh
        from eonerf_code_tpu.parallel.multi_aoi import MultiAOITrainer

        infos = compact_scene_dirs
        datasets = [SatelliteDataset(i["root_dir"], i["img_dir"],
                                     split="train") for i in infos]
        mesh = make_mesh(n_data=4, n_scene=2)
        tr = MultiAOITrainer(datasets, mesh, n_samples=8, batch_size=32,
                             net_depth=2, net_width=32,
                             occ_enabled=True, occ_tighten=True,
                             occ_tighten_start_step=0, n_grid=8)
        stable = np.array([0.20, 0.30])
        tr._occ_frac_hist = [stable] * 5
        tr.step = 10
        assert tr.occ_gate_open()
        # scene 1 drifts monotonically -> gate stays closed for all
        drift = [np.array([0.20, 0.30 * (1.0 + 0.01 * k)]) for k in range(5)]
        tr._occ_frac_hist = drift
        assert not tr.occ_gate_open()
        # tightened steps execute once the gate is open (grid threaded
        # through the vmapped step)
        tr._occ_frac_hist = [stable] * 5
        losses = tr.train_steps(2)
        assert np.isfinite(np.asarray(losses)).all()


class TestMultiAOIPriors:
    def test_mixed_scene_priors_train_and_record(self, compact_scene_dirs,
                                                 tmp_path):
        """Depth + shadow priors on scene 0 only (scene 1 has none): mixed
        scenes share one static program — the prior-less scene sees neutral
        sentinels (depth -1 masked invalid, shadow 1.0 all-lit) — and each
        scene's opts.json records its OWN prior paths."""
        from PIL import Image

        from eonerf_code_tpu.config import TrainConfig
        from eonerf_code_tpu.data.satellite import SatelliteDataset
        from eonerf_code_tpu.parallel.mesh import make_mesh
        from eonerf_code_tpu.parallel.multi_aoi import MultiAOITrainer

        infos = compact_scene_dirs
        gt_dsm = os.path.join(infos[0]["gt_dir"], "SYN_320_DSM.tif")
        mask_dir = str(tmp_path / "masks")
        os.makedirs(mask_dir)
        for name in infos[0]["names"]:
            with open(os.path.join(infos[0]["root_dir"],
                                   name + ".json")) as f:
                meta = json.load(f)
            Image.fromarray(np.full((32, 32), 255, np.uint8)).save(
                os.path.join(mask_dir, meta["img"].replace(".tif", ".png")))

        # engine-level: sentinels + finite losses with both terms live
        datasets = [
            SatelliteDataset(infos[0]["root_dir"], infos[0]["img_dir"],
                             split="train", prior_dsm_path=gt_dsm,
                             shadow_masks_dir=mask_dir),
            SatelliteDataset(infos[1]["root_dir"], infos[1]["img_dir"],
                             split="train"),
        ]
        assert datasets[0].prior_depths is not None
        mesh = make_mesh(n_data=4, n_scene=2)
        tr = MultiAOITrainer(datasets, mesh, n_samples=12, batch_size=64,
                             net_depth=2, net_width=32)
        n1 = datasets[1].all_rays.shape[0]
        assert np.all(np.asarray(tr.data["depth_prior"][1][:n1]) == -1.0)
        assert np.all(np.asarray(tr.data["shadow_prior"][1][:n1]) == 1.0)
        losses = tr.train_steps(2, shadows=True)  # both prior terms active
        assert np.isfinite(np.asarray(losses)).all()

        # CLI surface: empty-slot syntax + per-scene opts.json record
        argv = ["--root_dirs", ",".join(i["root_dir"] for i in infos),
                "--img_dirs", ",".join(i["img_dir"] for i in infos),
                "--aoi_ids", "SYN_320,SYN_321",
                "--logs_dir", str(tmp_path), "--exp_name", "pod_pri",
                "--scene_axis", "2", "--data_axis", "4",
                "--max_train_steps", "4", "--batch_size", "64",
                "--n_samples", "12", "--fc_layers", "2", "--fc_units", "32",
                "--init_dsm_paths", f"{gt_dsm},",
                "--shadow_masks_dirs", f"{mask_dir},",
                "--first_shadow_step", "2", "--log_every", "2"]
        stats = main_multi_train(argv)
        assert stats["steps"] == 4
        cfg0 = TrainConfig.load(os.path.join(
            str(tmp_path), "pod_pri", "SYN_320", "opts.json"))
        cfg1 = TrainConfig.load(os.path.join(
            str(tmp_path), "pod_pri", "SYN_321", "opts.json"))
        assert cfg0.init_dsm_path == gt_dsm
        assert cfg0.shadow_masks_dir == mask_dir
        assert cfg1.init_dsm_path is None and cfg1.shadow_masks_dir is None


class TestMultiAOILrSchedule:
    def test_step_lr_schedule(self, compact_scene_dirs):
        """--lr_decay_steps engages the single-AOI StepLR rule
        (lr * 0.9^(step // N)); the schedule count rides opt_state so pod
        resume keeps it."""
        from eonerf_code_tpu.data.satellite import SatelliteDataset
        from eonerf_code_tpu.parallel.mesh import make_mesh
        from eonerf_code_tpu.parallel.multi_aoi import MultiAOITrainer

        infos = compact_scene_dirs
        datasets = [SatelliteDataset(i["root_dir"], i["img_dir"],
                                     split="train") for i in infos]
        mesh = make_mesh(n_data=4, n_scene=2)
        tr = MultiAOITrainer(datasets, mesh, n_samples=8, batch_size=32,
                             net_depth=2, net_width=32, lr=1e-3,
                             lr_decay_steps=2)
        assert tr.lr_at(0) == pytest.approx(1e-3)
        assert tr.lr_at(2) == pytest.approx(9e-4)
        assert tr.lr_at(5) == pytest.approx(8.1e-4)
        losses = tr.train_steps(3)
        assert np.isfinite(np.asarray(losses)).all()
        # default: constant lr (previous behavior)
        tr2 = MultiAOITrainer(datasets, mesh, n_samples=8, batch_size=32,
                              net_depth=2, net_width=32, lr=1e-3)
        assert tr2.lr_at(10_000) == pytest.approx(1e-3)


class TestMultiAOIResume:
    def test_resume_bit_exact_vs_uninterrupted(self, compact_scene_dirs,
                                               tmp_path):
        """Pod resume (--resume + --save_freq): a run killed at step 4 and
        resumed to step 8 must produce BIT-IDENTICAL per-scene parameters to
        an uninterrupted 8-step run — RNG keys derive from (seed, step), and
        the pod checkpoint carries stacked params + opt state + occ state +
        the gate-history sidecar."""
        infos = compact_scene_dirs
        base = ["--root_dirs", ",".join(i["root_dir"] for i in infos),
                "--img_dirs", ",".join(i["img_dir"] for i in infos),
                "--aoi_ids", "SYN_320,SYN_321",
                "--logs_dir", str(tmp_path),
                "--scene_axis", "2", "--data_axis", "4",
                "--batch_size", "64",
                "--n_samples", "12", "--fc_layers", "2", "--fc_units", "32",
                "--n_grid", "16",
                "--first_shadow_step", str(10**9), "--log_every", "2"]
        # uninterrupted 8-step run
        main_multi_train(base + ["--exp_name", "pod_full",
                                 "--max_train_steps", "8"])
        # interrupted: 4 steps (final pod ckpt lands at step 4), then resume
        main_multi_train(base + ["--exp_name", "pod_res",
                                 "--max_train_steps", "4",
                                 "--save_freq", "4"])
        pod_dir = os.path.join(str(tmp_path), "pod_res", "_pod")
        assert os.path.isdir(os.path.join(pod_dir, "ckpts", "epoch=4"))
        stats_res = main_multi_train(base + ["--exp_name", "pod_res",
                                             "--max_train_steps", "8",
                                             "--resume"])
        # throughput accounting covers only the resumed segment (4 of 8
        # steps) — resumed runs must not inflate rays_per_sec
        assert stats_res["steps"] == 8 and stats_res["steps_run"] == 4
        # resuming an ALREADY-COMPLETE run trains nothing and reports 0
        stats_done = main_multi_train(base + ["--exp_name", "pod_res",
                                              "--max_train_steps", "8",
                                              "--resume"])
        assert stats_done["steps_run"] == 0
        assert stats_done["rays_per_sec"] == 0.0

        from eonerf_code_tpu.train.checkpoints import (
            latest_checkpoint,
            restore_checkpoint,
        )

        assert os.path.isdir(os.path.join(pod_dir, "ckpts", "epoch=8"))
        for aoi in ("SYN_320", "SYN_321"):
            full = restore_checkpoint(latest_checkpoint(
                os.path.join(str(tmp_path), "pod_full", aoi)))
            res = restore_checkpoint(latest_checkpoint(
                os.path.join(str(tmp_path), "pod_res", aoi)))
            assert int(res["step"]) == 8
            leaves_f = jax.tree_util.tree_leaves(full["params"])
            leaves_r = jax.tree_util.tree_leaves(res["params"])
            assert len(leaves_f) == len(leaves_r)
            for lf, lr in zip(leaves_f, leaves_r):
                np.testing.assert_array_equal(np.asarray(lf), np.asarray(lr))

    def test_pod_gate_state_is_self_contained(self, compact_scene_dirs,
                                              tmp_path):
        """The pod checkpoint pytree carries the per-scene gate tail ring
        (same self-containment contract as the single-AOI trainer): losing
        pod_occ_sampling.json changes nothing the gate can observe, and a
        pre-gate pod checkpoint (no "gate" subtree) still restores."""
        from eonerf_code_tpu.data.satellite import SatelliteDataset
        from eonerf_code_tpu.parallel.mesh import make_mesh
        from eonerf_code_tpu.parallel.multi_aoi import MultiAOITrainer
        from eonerf_code_tpu.train.checkpoints import save_checkpoint

        infos = compact_scene_dirs
        datasets = [SatelliteDataset(i["root_dir"], i["img_dir"],
                                     split="train") for i in infos]
        mesh = make_mesh(n_data=4, n_scene=2)

        def make():
            return MultiAOITrainer(datasets, mesh, n_samples=8,
                                   batch_size=32, net_depth=2, net_width=32,
                                   occ_enabled=True, occ_tighten=True,
                                   occ_tighten_start_step=0, n_grid=16)

        tr = make()
        tr.step = 4
        # 7 updates, last 5 stable per scene (dyadic: ring stores f32)
        tr._occ_frac_hist = [np.full(2, v, np.float32)
                             for v in (0.875, 0.75, 0.5, 0.5, 0.5, 0.5, 0.5)]
        assert tr.occ_gate_open()
        path = tr.save_pod(str(tmp_path / "_pod"))
        os.remove(os.path.join(path, "pod_occ_sampling.json"))

        tr2 = make()
        tr2.restore_pod(path)
        assert tr2.step == 4
        got = np.stack(tr2._occ_frac_hist)
        np.testing.assert_array_equal(got, np.stack(tr._occ_frac_hist))
        assert tr2.occ_gate_open()

        # pre-gate pod checkpoint: restore falls back to the old template
        old_state = tr.state_pytree()
        old_state.pop("gate")
        old_path = save_checkpoint(str(tmp_path / "_pod_old"), "old",
                                   old_state)
        tr3 = make()
        tr3.restore_pod(old_path)
        assert tr3.step == 4 and tr3._occ_frac_hist == []

    def test_resume_flag_without_checkpoint_starts_fresh(
            self, compact_scene_dirs, tmp_path):
        """--resume with no pod checkpoint is a fresh start (safe to pass
        unconditionally under supervise.py restarts)."""
        infos = compact_scene_dirs
        stats = main_multi_train(
            ["--root_dirs", ",".join(i["root_dir"] for i in infos),
             "--img_dirs", ",".join(i["img_dir"] for i in infos),
             "--aoi_ids", "SYN_320,SYN_321",
             "--logs_dir", str(tmp_path), "--exp_name", "pod_fresh",
             "--scene_axis", "2", "--data_axis", "4",
             "--max_train_steps", "2", "--batch_size", "64",
             "--n_samples", "12", "--fc_layers", "2", "--fc_units", "32",
             "--first_shadow_step", str(10**9), "--log_every", "2",
             "--resume"])
        assert stats["steps"] == 2


class TestMultiAOIShardedEval:
    def test_sharded_eval_of_multi_aoi_run(self, compact_scene_dirs, tmp_path):
        """A scene trained by the multi-AOI trainer evaluates through the
        single-AOI eval stack with --data_axis sharding on the virtual mesh
        (VERDICT r3 item 4's third leg)."""
        infos = compact_scene_dirs
        argv = ["--root_dirs", ",".join(i["root_dir"] for i in infos),
                "--img_dirs", ",".join(i["img_dir"] for i in infos),
                "--gt_dirs", ",".join(i["gt_dir"] for i in infos),
                "--aoi_ids", "SYN_320,SYN_321",
                "--logs_dir", str(tmp_path), "--exp_name", "pod_ev",
                "--scene_axis", "2", "--data_axis", "4",
                "--max_train_steps", "4", "--batch_size", "64",
                "--n_samples", "12", "--fc_layers", "2", "--fc_units", "32",
                "--first_shadow_step", str(10**9), "--log_every", "2"]
        main_multi_train(argv)
        from eonerf_code_tpu.eval.run import eval_eonerf

        out = eval_eonerf("pod_ev/SYN_320",
                          str(tmp_path), str(tmp_path / "eval"), dsm=True,
                          gt_dir=infos[0]["gt_dir"], dsm_resolution=2.0,
                          data_axis=4)
        assert os.path.exists(out["dsm_path"])
        assert np.isfinite(out["mae"])
