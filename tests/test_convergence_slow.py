"""Strict geometry-recovery test (the 'flat plane + box -> DSM MAE' proof,
SURVEY §4). Excluded from the default suite (pytest -m slow to run; ~3 min
on one TPU chip, HOURS on CPU — prefer `scripts/run_synthetic_e2e.py` on
device). Validated on TPU v5e: with a step-based schedule (the per-epoch
reference schedule collapses the lr on tiny scenes) the registered altitude
MAE reaches 0.93 m at 2000 steps on a 2 m-GSD synthetic scene with a 20 m
building."""

import numpy as np
import pytest

from eonerf_code_tpu.config import TrainConfig
from eonerf_code_tpu.data.synthetic import SyntheticSceneSpec, generate_scene
from eonerf_code_tpu.train.loop import Trainer


@pytest.mark.slow
def test_dsm_mae_converges(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("conv_scene"))
    spec = SyntheticSceneSpec(n_views=5, n_test_views=1, img_size=64,
                              dsm_resolution=2.0)
    scene = generate_scene(out, spec)
    cfg = TrainConfig(
        root_dir=scene["root_dir"], img_dir=scene["img_dir"], gt_dir=scene["gt_dir"],
        logs_dir=str(tmp_path_factory.mktemp("conv_logs")), exp_name="conv",
        aoi_id=scene["aoi_id"], batch_size=2048, max_train_steps=2000,
        n_samples=64, net_depth=8, net_width=128, occ_enabled=False,
        lr_decay_steps=1000, first_shadow_step=1500, first_beta_step=10**9,
        val_freq=10**9, chunk=4096, seed=0)
    trainer = Trainer(cfg)
    trainer.run(log_every=10**9)
    sample = trainer.val_ds.get_val_sample(0)
    pred = trainer.render_view(sample, depth_only=True)
    mae = trainer._val_mae(sample, pred)
    assert mae < 1.5, f"converged DSM altitude MAE too high: {mae:.2f} m"
