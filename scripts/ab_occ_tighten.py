#!/usr/bin/env python
"""A/B: occupancy-informed sample tightening on the production-scale
synthetic scene (VERDICT round-1 item 3 'done' criterion).

Arms (same schedule as run_production_scale.py, shorter horizon):
  base96    — 96 uniform samples over [near, near+2] (production default)
  tight48   — 48 samples concentrated on each ray's occupied span
  tight96   — 96 samples concentrated (better-MAE-at-equal-cost probe)

    python scripts/ab_occ_tighten.py [workdir] [steps] [arm ...]

Pass --tall to run the WIDE-ENVELOPE (IARPA-like) scene instead: 80 m
buildings in a [-2, 220] m altitude envelope. Round-2 findings there
(reproducible): uniform64 2.5-3.2 m; hierarchical imp48+32 2.28 m (best);
tight64 22-30 m — the grid<->sampler feedback loop amplifies floaters while
geometry is unresolved, and neither per-ray exploration, the occupied-
fraction stability gate, nor a late start (8000) rescues it. Tightening is
a COMPACT-ENVELOPE tool; use n_importance on wide envelopes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eonerf_code_tpu.config import TrainConfig  # noqa: E402
from eonerf_code_tpu.data.synthetic import SyntheticSceneSpec, generate_scene  # noqa: E402
from eonerf_code_tpu.train.loop import Trainer  # noqa: E402

ARMS = {
    "base96": dict(n_samples=96, occ_enabled=False, sampler="uniform"),
    "tight48": dict(n_samples=48, occ_enabled=True, occ_tighten=True),
    "tight96": dict(n_samples=96, occ_enabled=True, occ_tighten=True),
    # DEFAULT config (sampler="auto"): resolves per scene envelope —
    # tighten on the compact scene, hierarchical on --tall
    "auto96": dict(n_samples=96),
    "auto64": dict(n_samples=64),
    # wide-envelope (--tall) arms
    "uniform64": dict(n_samples=64, occ_enabled=False, sampler="uniform"),
    "tight64": dict(n_samples=64, occ_enabled=True, occ_tighten=True),
    "imp48+32": dict(n_samples=48, n_importance=32, occ_enabled=False),
    # entropy-gated tightening (geometry-quality gate): instrument with a
    # permissive threshold to OBSERVE the entropy trajectory, or gate for
    # real at the calibrated value
    "tight64+H": dict(n_samples=64, occ_enabled=True, occ_tighten=True,
                      occ_entropy_max=0.60),
    "tight96+H": dict(n_samples=96, occ_enabled=True, occ_tighten=True,
                      occ_entropy_max=0.60),
    "tight64+H99": dict(n_samples=64, occ_enabled=True, occ_tighten=True,
                        occ_entropy_max=0.99),  # gate-open probe: logs H
}


def run_arm(scene, workdir, name, steps):
    overrides = ARMS[name]
    cfg = TrainConfig(
        root_dir=scene["root_dir"], img_dir=scene["img_dir"], gt_dir=scene["gt_dir"],
        logs_dir=os.path.join(workdir, "logs"), exp_name=f"ab_{name}",
        aoi_id=scene["aoi_id"], cache_dir=os.path.join(workdir, "cache"),
        batch_size=4096, max_train_steps=steps,
        net_depth=8, net_width=256,
        lr_decay_steps=3000, first_shadow_step=6000, first_beta_step=12000,
        occ_tighten_start_step=2000, n_grid=128,
        val_freq=10**9, chunk=8192, steps_per_call=50,
        compute_dtype="bfloat16", **overrides)
    trainer = Trainer(cfg)
    t0 = time.time()
    stats = trainer.run(max_steps=steps, log_every=2000)
    sample = trainer.val_ds.get_val_sample(0)
    pred = trainer.render_view(sample, depth_only=True)
    mae = trainer._val_mae(sample, pred)
    print(f"ARM {name}: MAE={mae:.3f} m  rays/s={stats['rays_per_sec']:,.0f}  "
          f"wall={time.time()-t0:.0f}s  [resolved sampler={cfg.sampler} "
          f"n={cfg.n_samples}+{cfg.n_importance} tighten={cfg.occ_tighten}]",
          flush=True)
    if trainer._entropy_hist:
        h = trainer._entropy_hist
        qs = [h[0], h[len(h) // 4], h[len(h) // 2], h[3 * len(h) // 4], h[-1]]
        print(f"  weight-entropy trajectory (0/25/50/75/100%): "
              + " ".join(f"{x:.3f}" for x in qs)
              + f"  gate_open={trainer._entropy_ok()}", flush=True)
    return mae


def main(workdir="/tmp/eonerf_ab_occ", steps="10000", *arms):
    steps = int(steps)
    arms = list(arms)
    tall = "--tall" in arms
    arms = [a for a in arms if a != "--tall"]
    if not arms:
        arms = (["uniform64", "auto64", "imp48+32"] if tall
                else ["base96", "auto96", "tight96"])
    if tall:
        spec = SyntheticSceneSpec(
            n_views=10, n_test_views=2, img_size=320, extent=400.0,
            n_buildings=9, box_size=60.0, box_height=80.0,
            min_alt=-2.0, max_alt=220.0,
            dsm_resolution=1.0, radiometric_jitter=0.08, seed=11)
    else:
        spec = SyntheticSceneSpec(
            n_views=10, n_test_views=2, img_size=320, extent=400.0,
            n_buildings=9, box_size=60.0, box_height=24.0,
            dsm_resolution=1.0, radiometric_jitter=0.08, seed=7)
    scene = generate_scene(os.path.join(workdir, "scene"), spec)
    results = {}
    for name in arms:
        results[name] = run_arm(scene, workdir, name, steps)
    print("RESULTS", results, flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
