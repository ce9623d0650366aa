#!/usr/bin/env python
"""Long-horizon validation of the WIDE-ENVELOPE (IARPA-like) regime.

The long-horizon runs so far (100k/300k steps, BASELINE.md) all used the
compact-envelope scene where sampler=auto resolves to occupancy TIGHTENING.
This runs the OTHER auto branch at scale: the 222 m-envelope scene (80 m
buildings, [-2, 220] m altitude range — the IARPA-style shape where
tightening reproducibly diverges and auto resolves to HIERARCHICAL
sampling, scripts/ab_occ_tighten.py --tall) for a reference-scale step
count (run_IARPA.sh:14 budgets 500k steps for the IARPA AOIs; pass the
step count to taste). Runs the config-default sample budget (n=128 ->
hierarchical 96+48), the winning arm of the round-5 quality A/B
(docs/ab/round5_tall_quality.json). Auto-resumes from the newest
checkpoint so it can run under scripts/supervise.py.

    python scripts/run_tall_scale.py [workdir] [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eonerf_code_tpu.config import TrainConfig  # noqa: E402
from eonerf_code_tpu.data.synthetic import SyntheticSceneSpec, generate_scene  # noqa: E402
from eonerf_code_tpu.train.loop import Trainer  # noqa: E402


def main(workdir="/tmp/eonerf_tall", steps=100000):
    # the ab_occ_tighten.py --tall scene, verbatim (seed 11)
    spec = SyntheticSceneSpec(
        n_views=10, n_test_views=2, img_size=320, extent=400.0,
        n_buildings=9, box_size=60.0, box_height=80.0,
        min_alt=-2.0, max_alt=220.0,
        dsm_resolution=1.0, radiometric_jitter=0.08, seed=11)
    t0 = time.time()
    scene = generate_scene(os.path.join(workdir, "scene"), spec)
    print(f"scene generated in {time.time()-t0:.0f}s", flush=True)

    cfg = TrainConfig(
        root_dir=scene["root_dir"], img_dir=scene["img_dir"],
        gt_dir=scene["gt_dir"],
        logs_dir=os.path.join(workdir, "logs"), exp_name="tall",
        aoi_id=scene["aoi_id"], cache_dir=os.path.join(workdir, "cache"),
        # n_samples left at the config default (128 -> hierarchical 96+48):
        # the round-5 3-arm 50k-step A/B (scripts/ab_tall_quality.py,
        # docs/ab/round5_tall_quality.json) measured the n=64 budget this
        # script previously hardcoded at 0.3 m WORSE nadir MAE at every
        # milestone (2.05 vs 1.73 m @ 50k) — the round-4 "2.3 m tall-scene
        # floor" was that budget limit, not the sampler.
        batch_size=4096, max_train_steps=int(steps),
        net_depth=8, net_width=256,
        # sampler left at the default "auto" — the point of this run is to
        # validate what a user gets on a wide envelope with no flags
        lr_decay_steps=3000, first_shadow_step=6000, first_beta_step=12000,
        val_freq=10**9, chunk=8192, steps_per_call=50, save_freq=5000,
        compute_dtype="bfloat16")
    from eonerf_code_tpu.train.checkpoints import latest_checkpoint
    ckpt = latest_checkpoint(os.path.join(cfg.logs_dir, cfg.exp_name))
    if ckpt:
        print(f"resuming from {ckpt}", flush=True)
        cfg.ckpt_path = ckpt
    trainer = Trainer(cfg)
    print(f"dataset: {trainer.n_rays:,} rays, {trainer.n_images} images; "
          f"resolved sampler={cfg.sampler} n={cfg.n_samples}+{cfg.n_importance}",
          flush=True)

    mae = None
    milestones = sorted({int(steps) // 3, 2 * int(steps) // 3, int(steps)})
    for target in milestones:
        if target <= trainer.step:
            continue
        stats = trainer.run(max_steps=target, log_every=2000)
        sample = trainer.val_ds.get_val_sample(0)
        pred = trainer.render_view(sample, depth_only=True)
        mae = trainer._val_mae(sample, pred)
        print(f"step {target}: MAE={mae:.3f} m  rays/s={stats['rays_per_sec']:,.0f}",
              flush=True)
    if mae is None:
        sample = trainer.val_ds.get_val_sample(0)
        mae = trainer._val_mae(sample,
                               trainer.render_view(sample, depth_only=True))
        print(f"step {trainer.step}: MAE={mae:.3f} m (restored)", flush=True)

    from eonerf_code_tpu.utils import metrics as M
    import jax.numpy as jnp

    sample = trainer.val_ds.get_val_sample(1)
    out = trainer.render_view(sample)
    psnr = float(M.psnr(jnp.asarray(sample["rgbs"]), out["rgb"]))
    print(f"held-out view PSNR: {psnr:.2f} dB", flush=True)
    return mae


if __name__ == "__main__":
    main(*(sys.argv[1:3] or []))
