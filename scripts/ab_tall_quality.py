#!/usr/bin/env python
"""Wide-envelope (IARPA-like) quality floor: long-horizon A/B over the
hierarchical shape + a uniform control, with MULTI-VIEW + nadir-DSM eval.

Round-4 verdict weak #2: the tall scene's 100k-step run drifted 2.16 ->
2.31 m on a single val view and the repo could not say whether that is
val-view noise or sampler-limited quality. This script runs the competing
sampling shapes for >=50k steps each on the SAME tall scene
(run_tall_scale.py's spec, seed 11) and, at each milestone, reports:

  - per-view registered MAE on THREE views (train-probe + both held-out
    test views) — multi-view kills/confirms the single-view-noise story
  - the nadir-sweep DSM MAE (eval_eonerf dsm=True) — the view-independent
    headline metric

Arms:
  hier48+24   n_samples=64, sampler auto -> hierarchical 48 coarse + 24
              fine (the production default on wide envelopes)
  hier96+48   n_samples=128 -> 96 + 48 (same rule, 2x the sample budget)
  uniform128  sampler uniform, 128 samples (no importance; the reference's
              own configuration)

    python scripts/ab_tall_quality.py [workdir] [steps] [arm ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eonerf_code_tpu.config import TrainConfig  # noqa: E402
from eonerf_code_tpu.data.synthetic import SyntheticSceneSpec, generate_scene  # noqa: E402
from eonerf_code_tpu.train.loop import Trainer  # noqa: E402

ARMS = {
    "hier48+24": dict(n_samples=64, sampler="auto"),
    "hier96+48": dict(n_samples=128, sampler="auto"),
    "uniform128": dict(n_samples=128, sampler="uniform"),
    # diagnostic arm for the late-horizon nadir creep (round-5 §2 finding
    # 2): identical to hier96+48 but the shadow phase never starts — if
    # the creep vanishes here, it is shadow-phase geometry tension, not
    # the lr tail / beta loss
    "hier96+48_noshadow": dict(n_samples=128, sampler="auto",
                               first_shadow_step=10**9),
}


def tall_spec():
    # run_tall_scale.py's scene, verbatim (seed 11)
    return SyntheticSceneSpec(
        n_views=10, n_test_views=2, img_size=320, extent=400.0,
        n_buildings=9, box_size=60.0, box_height=80.0,
        min_alt=-2.0, max_alt=220.0,
        dsm_resolution=1.0, radiometric_jitter=0.08, seed=11)


def eval_milestone(trainer, cfg, workdir, arm, step):
    """Multi-view + nadir-DSM evaluation at a training milestone."""
    from eonerf_code_tpu.eval.run import eval_eonerf

    row = {"arm": arm, "step": step, "view_mae": {}}
    for i in range(min(3, len(trainer.val_ds.json_files))):
        sample = trainer.val_ds.get_val_sample(i)
        pred = trainer.render_view(sample, depth_only=True)
        row["view_mae"][sample["src_id"]] = round(trainer._val_mae(sample, pred), 3)
    trainer.save()  # make the current state visible to eval_eonerf
    out = eval_eonerf(cfg.exp_name, cfg.logs_dir,
                      os.path.join(workdir, "eval", arm, str(step)),
                      gt_dir=cfg.gt_dir, dsm=True, dsm_resolution=1.0)
    row["nadir_dsm_mae"] = round(out["mae"], 3)
    return row


def run_arm(workdir, scene, arm, steps):
    params = {**dict(lr_decay_steps=3000, first_shadow_step=6000,
                     first_beta_step=12000),
              **ARMS[arm]}  # an arm may override any schedule default
    cfg = TrainConfig(
        root_dir=scene["root_dir"], img_dir=scene["img_dir"],
        gt_dir=scene["gt_dir"],
        logs_dir=os.path.join(workdir, "logs"), exp_name=f"tall_{arm}",
        aoi_id=scene["aoi_id"], cache_dir=os.path.join(workdir, "cache"),
        batch_size=4096, max_train_steps=int(steps),
        net_depth=8, net_width=256,
        val_freq=10**9, chunk=8192, steps_per_call=50, save_freq=10**9,
        compute_dtype="bfloat16", **params)
    from eonerf_code_tpu.train.checkpoints import latest_checkpoint
    ckpt = latest_checkpoint(cfg.log_dir())
    if ckpt:
        print(f"[{arm}] resuming from {ckpt}", flush=True)
        cfg.ckpt_path = ckpt
    trainer = Trainer(cfg)
    print(f"[{arm}] sampler={cfg.sampler} n={cfg.n_samples}+{cfg.n_importance} "
          f"sc={cfg.resolve_sc_n_samples()}", flush=True)
    rows = []
    milestones = sorted({int(steps) // 3, 2 * int(steps) // 3, int(steps)})
    for target in milestones:
        if target <= trainer.step:
            continue
        t0 = time.time()
        stats = trainer.run(max_steps=target, log_every=5000)
        row = eval_milestone(trainer, cfg, workdir, arm, target)
        row["rays_per_sec"] = round(stats["rays_per_sec"])
        rows.append(row)
        print(f"[{arm}] step {target}: views={row['view_mae']} "
              f"nadir={row['nadir_dsm_mae']} m  "
              f"({stats['rays_per_sec']:,.0f} rays/s, {time.time()-t0:.0f}s)",
              flush=True)
    return rows


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/eonerf_tall_ab"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    arms = sys.argv[3:] or list(ARMS)
    t0 = time.time()
    scene = generate_scene(os.path.join(workdir, "scene"), tall_spec())
    print(f"scene generated in {time.time()-t0:.0f}s", flush=True)
    all_rows = []
    for arm in arms:
        all_rows += run_arm(workdir, scene, arm, steps)
        with open(os.path.join(workdir, "results.json"), "w") as f:
            json.dump(all_rows, f, indent=2)
    print(json.dumps(all_rows, indent=2), flush=True)


if __name__ == "__main__":
    main()
