#!/usr/bin/env python
"""A/B: RPC bundle adjustment recovers accuracy under camera miscalibration.

The reference declares --rpc_correction but never implements it (SURVEY §2
#12; opt.py:80, sat_utils.py:365-450 are orphaned building blocks). This
framework implements it for real — learnable per-image ray-bundle offsets
(models/eonerf.py `ray_correction_enc`) trained jointly with the field, and
running through the fused Pallas kernels' d_origin path at full production
speed.

The demo: the synthetic factory renders every image with the TRUE camera but
publishes RPCs whose row/col offsets carry a per-view bias (rpc_bias_px), the
real-world condition where vendor RPCs are off by a few pixels. Arms:

  clean     — unbiased RPCs, no BA           (accuracy ceiling)
  biased    — biased RPCs, rpc_correction=0  (what miscalibration costs)
  biased+ba — biased RPCs, rpc_correction=1  (how much BA recovers)

    python scripts/ab_bundle_adjust.py [workdir] [steps] [bias_px] [arm ...]

After the biased+ba arm, the learned offsets are exported back to image
space (geo/bundle_adjust.py) and printed next to the injected biases.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from eonerf_code_tpu.config import TrainConfig  # noqa: E402
from eonerf_code_tpu.data.synthetic import SyntheticSceneSpec, generate_scene  # noqa: E402
from eonerf_code_tpu.train.loop import Trainer  # noqa: E402

ARMS = {
    "clean": dict(biased=False, rpc_correction=False),
    "biased": dict(biased=True, rpc_correction=False),
    # BARF-style coarse-to-fine PE annealing is the standard companion of
    # joint camera refinement: it widens the photometric basin so the
    # offsets converge before high-frequency detail locks the geometry in
    # the miscalibrated configuration (models/freq_reg.py)
    "biased+ba": dict(biased=True, rpc_correction=True,
                      freq_reg_end_step=4000),
    "biased+ba-noanneal": dict(biased=True, rpc_correction=True),
}


def run_arm(scenes, workdir, name, steps, small=False):
    overrides = dict(ARMS[name])
    scene = scenes["biased" if overrides.pop("biased") else "clean"]
    if small:  # CPU smoke: same code path, toy sizes
        size = dict(batch_size=256, n_samples=16, net_depth=2, net_width=32,
                    occ_enabled=False, chunk=1024, steps_per_call=10,
                    compute_dtype="float32",
                    lr_decay_steps=max(steps, 1),
                    first_shadow_step=10**9, first_beta_step=10**9)
        if overrides.get("freq_reg_end_step"):
            overrides["freq_reg_end_step"] = max(steps // 2, 1)
    else:
        size = dict(batch_size=4096, n_samples=96, net_depth=8, net_width=256,
                    occ_enabled=True, occ_tighten=True,
                    occ_tighten_start_step=2000, chunk=8192, steps_per_call=50,
                    compute_dtype="bfloat16",
                    lr_decay_steps=3000, first_shadow_step=6000,
                    first_beta_step=12000)
    cfg = TrainConfig(
        root_dir=scene["root_dir"], img_dir=scene["img_dir"], gt_dir=scene["gt_dir"],
        logs_dir=os.path.join(workdir, "logs"), exp_name=f"ba_{name}",
        aoi_id=scene["aoi_id"],
        cache_dir=os.path.join(workdir, f"cache_{os.path.basename(scene['root_dir'])}"),
        max_train_steps=steps, val_freq=10**9, **size, **overrides)
    trainer = Trainer(cfg)
    t0 = time.time()
    stats = trainer.run(max_steps=steps, log_every=2000)
    sample = trainer.val_ds.get_val_sample(0)
    pred = trainer.render_view(sample, depth_only=True)
    mae = trainer._val_mae(sample, pred)
    print(f"ARM {name}: MAE={mae:.3f} m  rays/s={stats['rays_per_sec']:,.0f}  "
          f"wall={time.time()-t0:.0f}s", flush=True)

    if cfg.rpc_correction and scene.get("rpc_biases_px"):
        report_learned_offsets(trainer, scene)
    return mae


def report_learned_offsets(trainer, scene):
    """Export the learned scene-frame offsets to image space and print them
    against the injected biases. BA can only fix the INCONSISTENT part of
    the miscalibration — a common-mode shift is gauge freedom the DSM
    registration absorbs — so compare deviations from each arm's mean."""
    from eonerf_code_tpu.geo.bundle_adjust import rpc_offset_from_scene_offset

    ds = trainer.train_ds
    emb = np.asarray(trainer.params["params"]["ray_correction_enc"]["embedding"])
    zonestring = ds.scene.utm_zonestring
    south = zonestring[-1] < "N"
    rows = []
    for i, name in enumerate(scene["names"][: emb.shape[0]]):
        if name not in scene["rpc_biases_px"]:
            continue
        dc_inj, dr_inj = scene["rpc_biases_px"][name]
        d_col, d_row = rpc_offset_from_scene_offset(
            ds.all_rpcs[i], emb[i], ds.scene.scene_scale,
            ds.scene.scene_offset, zonestring, south=south)
        rows.append((name, dc_inj, dr_inj, d_col, d_row))
    inj = np.array([[r[1], r[2]] for r in rows])
    got = np.array([[r[3], r[4]] for r in rows])
    # the learned shift moves the rays; the injected bias moved the camera
    # the opposite way — compare mean-centered, sign-matched
    inj_c = inj - inj.mean(0)
    got_c = got - got.mean(0)
    sign = -1.0 if np.sum(inj_c * got_c) < 0 else 1.0
    resid = np.hypot(*(inj_c - sign * got_c).T)
    print("  learned vs injected RPC offsets (mean-centered px):", flush=True)
    for (name, dci, dri, dcg, drg), r in zip(rows, resid):
        print(f"    {name}: injected=({dci:+.2f},{dri:+.2f})  "
              f"learned=({sign*dcg:+.2f},{sign*drg:+.2f})  resid={r:.2f}px",
              flush=True)
    print(f"  median |resid| = {np.median(resid):.2f} px "
          f"(mean |injected|, centered: {np.hypot(*inj_c.T).mean():.2f} px)",
          flush=True)


def main(workdir="/tmp/eonerf_ab_ba", steps="10000", bias_px="3.0", *arms):
    steps, bias_px = int(steps), float(bias_px)
    arms = list(arms)
    small = "--small" in arms
    arms = [a for a in arms if a != "--small"]
    arms = arms or ["clean", "biased", "biased+ba", "biased+ba-noanneal"]
    if small:
        base = dict(n_views=5, n_test_views=1, img_size=64, dsm_resolution=2.0,
                    seed=3)
    else:
        base = dict(n_views=10, n_test_views=2, img_size=320, extent=400.0,
                    n_buildings=9, box_size=60.0, box_height=24.0,
                    dsm_resolution=1.0, radiometric_jitter=0.08, seed=7)
    spec_c = SyntheticSceneSpec(**base)
    spec_b = SyntheticSceneSpec(rpc_bias_px=bias_px, **base)
    needed = {"biased" if ARMS[a]["biased"] else "clean" for a in arms}
    scenes = {}
    if "clean" in needed:
        scenes["clean"] = generate_scene(os.path.join(workdir, "scene_clean"), spec_c)
    if "biased" in needed:
        scenes["biased"] = generate_scene(os.path.join(workdir, "scene_biased"), spec_b)
    results = {}
    for name in arms:
        results[name] = run_arm(scenes, workdir, name, steps, small=small)
    print("RESULTS", results, flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
