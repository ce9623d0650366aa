"""Trainer with an explicit device mesh: the ray pool shards over the data
axis and a short run produces finite, synchronized parameters."""

import jax
import numpy as np
import pytest

from eonerf_code_tpu.config import TrainConfig
from eonerf_code_tpu.data.synthetic import SyntheticSceneSpec, generate_scene
from eonerf_code_tpu.parallel.mesh import make_mesh
from eonerf_code_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mesh_scene"))
    return generate_scene(out, SyntheticSceneSpec(n_views=2, n_test_views=1, img_size=24))


def test_trainer_runs_on_mesh(scene, tmp_path):
    mesh = make_mesh(n_data=8)
    cfg = TrainConfig(root_dir=scene["root_dir"], img_dir=scene["img_dir"],
                      logs_dir=str(tmp_path), exp_name="mesh",
                      batch_size=128, max_train_steps=6, n_samples=16,
                      net_depth=2, net_width=32, occ_enabled=False,
                      val_freq=10**9, steps_per_call=3)
    tr = Trainer(cfg, mesh=mesh)
    # ray pool actually sharded over the 8 devices
    shards = {s.device for s in tr.device_data["rays"].addressable_shards}
    assert len(shards) == 8
    stats = tr.run(log_every=3)
    assert stats["steps"] == 6
    leaves = jax.tree_util.tree_leaves(tr.params)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)


def test_weak_scaling_loss_trajectory(scene, tmp_path):
    """Same seed, same global batch: the 8-device mesh run must follow the
    single-device loss trajectory (GSPMD psum vs local sum only differs by
    fp reduction order)."""
    import json
    import os

    def run(mesh, name):
        cfg = TrainConfig(root_dir=scene["root_dir"], img_dir=scene["img_dir"],
                          logs_dir=str(tmp_path), exp_name=name,
                          batch_size=128, max_train_steps=8, n_samples=16,
                          net_depth=2, net_width=32, occ_enabled=False,
                          val_freq=10**9, steps_per_call=4, seed=3)
        tr = Trainer(cfg, mesh=mesh)
        tr.run(log_every=1)
        losses = {}
        with open(os.path.join(tr.log_dir, "metrics.jsonl")) as f:
            for line in f:
                d = json.loads(line)
                if d["tag"] == "train/loss":
                    losses[d["step"]] = d["value"]
        return losses

    single = run(None, "ws_single")
    mesh8 = run(make_mesh(n_data=8), "ws_mesh8")
    assert set(single) == set(mesh8) and len(single) >= 2
    for s in single:
        np.testing.assert_allclose(mesh8[s], single[s], rtol=2e-3, atol=1e-5)


def test_trainer_mesh_pallas_saved_acts(scene, tmp_path):
    """The production multi-chip composition with the saved-activations
    backward: Trainer megastep jitted over the 8-device mesh with the
    shard_map'ed Pallas kernels (interpret) and bwd_acts='saved' — the
    activation stream is one more per-point operand through shard_map, and
    this asserts the full composition (sampling glue + custom_vjp residuals
    + scan) executes, not just the kernel-level parity test."""
    from eonerf_code_tpu.models.fused import PallasField

    mesh = make_mesh(n_data=8)
    cfg = TrainConfig(root_dir=scene["root_dir"], img_dir=scene["img_dir"],
                      logs_dir=str(tmp_path), exp_name="mesh_saved",
                      batch_size=64, max_train_steps=2, n_samples=9,
                      net_depth=8, net_width=256, occ_enabled=False,
                      val_freq=10**9, steps_per_call=2, first_shadow_step=1,
                      use_pallas=True, bwd_acts="saved")
    tr = Trainer(cfg, mesh=mesh)
    assert isinstance(tr.render_field, PallasField)
    stats = tr.run()
    assert stats["steps"] == 2
    leaves = jax.tree_util.tree_leaves(tr.params)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)


def test_data_axis_flag_builds_mesh(scene, tmp_path):
    """The user surface: `--data_axis 8` alone (no programmatic mesh) must
    shard the run over 8 devices — cfg flag -> CLI parse -> Trainer builds
    the mesh itself."""
    from eonerf_code_tpu.cli import config_from_args

    argv = ["--root_dir", scene["root_dir"], "--img_dir", scene["img_dir"],
            "--logs_dir", str(tmp_path), "--exp_name", "flag_mesh",
            "--batch_size", "128", "--max_train_steps", "4",
            "--n_samples", "16", "--fc_layers", "2", "--fc_units", "32",
            "--data_axis", "8", "--steps_per_call", "2",
            "--val_freq", str(10**9)]
    cfg = config_from_args(argv)
    assert cfg.data_axis == 8
    cfg.occ_enabled = False
    tr = Trainer(cfg)
    assert tr.mesh is not None and tr.mesh.shape["data"] == 8
    shards = {s.device for s in tr.device_data["rays"].addressable_shards}
    assert len(shards) == 8
    stats = tr.run(log_every=2)
    assert stats["steps"] == 4
    leaves = jax.tree_util.tree_leaves(tr.params)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)


def test_data_axis_all_devices(scene, tmp_path):
    cfg = TrainConfig(root_dir=scene["root_dir"], img_dir=scene["img_dir"],
                      logs_dir=str(tmp_path), exp_name="axis_auto",
                      batch_size=128, max_train_steps=2, n_samples=8,
                      net_depth=2, net_width=32, occ_enabled=False,
                      val_freq=10**9, data_axis=-1)
    tr = Trainer(cfg)
    assert tr.mesh is not None
    assert tr.mesh.shape["data"] == len(jax.devices())


def test_trainer_mesh_with_pallas_kernels(scene, tmp_path):
    """Mesh + fused Pallas kernels (shard_map'ed, interpret on CPU): one
    megastep block runs and produces finite params. Uses the full 8x256
    architecture (the kernels are specialized to it)."""
    mesh = make_mesh(n_data=8)
    cfg = TrainConfig(root_dir=scene["root_dir"], img_dir=scene["img_dir"],
                      logs_dir=str(tmp_path), exp_name="mesh_pallas",
                      batch_size=64, max_train_steps=2, n_samples=8,
                      occ_enabled=False, use_pallas=True,
                      compute_dtype="bfloat16",
                      val_freq=10**9, steps_per_call=2)
    tr = Trainer(cfg, mesh=mesh)
    stats = tr.run(log_every=1)
    assert stats["steps"] == 2
    leaves = jax.tree_util.tree_leaves(tr.params)
    assert all(np.isfinite(np.asarray(x, np.float32)).all() for x in leaves)
