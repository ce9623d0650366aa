"""Multi-AOI training CLI: S independent AOI scenes in ONE jit program.

The reference trains one AOI per process (`/root/reference/train_eonerf.py`
+ one `run_*.sh` invocation per AOI). Pod-scale multi-AOI batched training
is this framework's own feature (BASELINE.json configs[4]); the engine
lives in `parallel/multi_aoi.py` (scene-sharded parameter stacks over a
("scene", "data") mesh). This module is its USER SURFACE:

    python train_multi_aoi.py \
        --root_dirs sceneA,sceneB --img_dirs imgsA,imgsB \
        --gt_dirs gtA,gtB --logs_dir logs --exp_name pod0 \
        --scene_axis 2 --data_axis 4 --max_train_steps 20000

Each scene lands in its own run directory
``logs_dir/exp_name/<aoi_id>/`` with an opts.json and an orbax checkpoint
in the SAME contract the single-AOI trainer writes — so the existing eval
CLI consumes every scene directly:

    python eval_eonerf.py pod0/<aoi_id> --logs_dir logs --dsm

Scope notes (documented, not hidden): this path trains with uniform
sampling (no occupancy grid). The fused Pallas kernels are available
(`--use_pallas`, auto on for bf16+TPU+8x256) via the shard_map'ed step in
`parallel/multi_aoi.py`; whichever backend trains is recorded in each
scene's opts.json (occ_enabled=False, use_pallas=<as-trained>), so eval
renders through the same backend and sampler the run trained with — the
one-backend-per-run invariant holds here too.
"""

import argparse
import json
import os
import time


def _split(s):
    return [x for x in (s or "").split(",") if x]


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="TPU-native EO-NeRF: multi-AOI scene-parallel training")
    p.add_argument("--root_dirs", type=str, required=True,
                   help="comma-separated per-AOI metadata dirs")
    p.add_argument("--img_dirs", type=str, required=True,
                   help="comma-separated per-AOI image dirs")
    p.add_argument("--gt_dirs", type=str, default="",
                   help="comma-separated per-AOI lidar GT dirs (optional; "
                        "recorded in each scene's opts.json for eval)")
    p.add_argument("--aoi_ids", type=str, default="",
                   help="comma-separated AOI ids, one per scene — recorded "
                        "in each scene's opts.json (GT rasters resolve as "
                        "<aoi_id>_DSM.tif) and used as the run-dir names "
                        "(default: basename of each root_dir, aoi_id "
                        "inferred by eval)")
    p.add_argument("--logs_dir", type=str, default="logs")
    p.add_argument("--exp_name", type=str, required=True)
    p.add_argument("--scene_axis", type=int, default=0,
                   help="devices on the scene mesh axis (0 = auto: the "
                        "scene count when it divides the device count, "
                        "else 1)")
    p.add_argument("--data_axis", type=int, default=0,
                   help="devices on the data mesh axis per scene group "
                        "(0 = all remaining devices)")
    p.add_argument("--max_train_steps", type=int, default=20000)
    p.add_argument("--batch_size", type=int, default=1024,
                   help="rays per step PER SCENE")
    p.add_argument("--n_samples", type=int, default=64)
    p.add_argument("--sc_n_samples", type=int, default=0,
                   help="shadow-march samples per solar ray (0 = follow "
                        "--n_samples)")
    p.add_argument("--fc_layers", type=int, default=8)
    p.add_argument("--fc_units", type=int, default=256)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--first_shadow_step", type=int, default=None,
                   help="step at which the geometric shadow pass turns on "
                        "(default: the single-AOI trainer's epoch-2 "
                        "equivalent; pass 0 to enable from the start)")
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--use_pallas", type=str, default="auto",
                   choices=["auto", "true", "false"],
                   help="fused Pallas kernels (shard_map'ed step; auto = on "
                        "for bf16 on TPU with the 8x256 architecture)")
    p.add_argument("--bwd_acts", type=str, default="recompute",
                   choices=["recompute", "saved"],
                   help="fused-kernel backward mode (see train_eonerf.py)")
    p.add_argument("--freq_reg_end_step", type=int, default=0,
                   help="BARF-style coarse-to-fine PE annealing ramp end "
                        "(0 = off; see train_eonerf.py)")
    p.add_argument("--freq_reg_start_step", type=int, default=0)
    return p.parse_args(argv)


def main_multi_train(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from eonerf_code_tpu.config import TrainConfig
    from eonerf_code_tpu.data.satellite import SatelliteDataset
    from eonerf_code_tpu.parallel.mesh import make_mesh
    from eonerf_code_tpu.parallel.multi_aoi import MultiAOITrainer
    from eonerf_code_tpu.train.checkpoints import save_checkpoint
    from eonerf_code_tpu.utils.tb import MetricsLogger

    roots, imgs = _split(args.root_dirs), _split(args.img_dirs)
    gts = _split(args.gt_dirs)
    if len(imgs) != len(roots):
        raise SystemExit("error: --img_dirs count must match --root_dirs")
    if gts and len(gts) != len(roots):
        raise SystemExit("error: --gt_dirs count must match --root_dirs")
    explicit_aois = _split(args.aoi_ids)
    if explicit_aois and len(explicit_aois) != len(roots):
        raise SystemExit("error: --aoi_ids count must match --root_dirs")
    aois = explicit_aois or [
        os.path.basename(os.path.normpath(r)) for r in roots]
    if len(set(aois)) != len(aois):
        raise SystemExit(f"error: duplicate AOI run names {aois}; "
                         "disambiguate with --aoi_ids")

    datasets = [SatelliteDataset(r, i, split="train")
                for r, i in zip(roots, imgs)]
    n_scenes = len(datasets)

    n_dev = len(jax.devices())
    scene_ax = args.scene_axis or (n_scenes if n_dev % n_scenes == 0 else 1)
    data_ax = args.data_axis or max(n_dev // scene_ax, 1)
    mesh = make_mesh(n_data=data_ax, n_scene=scene_ax)
    print(f"mesh: scene={scene_ax} x data={data_ax} over {n_dev} devices; "
          f"{n_scenes} scenes", flush=True)

    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    if args.use_pallas == "auto":
        use_pallas = (args.compute_dtype == "bfloat16"
                      and jax.default_backend() == "tpu"
                      and args.fc_layers == 8 and args.fc_units == 256)
    else:
        use_pallas = args.use_pallas == "true"
    tr = MultiAOITrainer(datasets, mesh, n_samples=args.n_samples,
                         sc_n_samples=args.sc_n_samples,
                         batch_size=args.batch_size, lr=args.lr,
                         net_depth=args.fc_layers, net_width=args.fc_units,
                         seed=args.seed, compute_dtype=dtype,
                         use_pallas=use_pallas, bwd_acts=args.bwd_acts,
                         freq_reg_start_step=args.freq_reg_start_step,
                         freq_reg_end_step=args.freq_reg_end_step)

    # shadow gating: mirror the single-AOI trainer's epoch-2 rule
    # (reference sat_rendering.py:269-274) on the flat ray pool
    if args.first_shadow_step is None:
        steps_per_epoch = max(int(tr.n_rays_per_scene.min()) // args.batch_size, 1)
        first_shadow = 2 * steps_per_epoch
    else:
        first_shadow = args.first_shadow_step

    exp_dir = os.path.join(args.logs_dir, args.exp_name)
    loggers = [MetricsLogger(os.path.join(exp_dir, a)) for a in aois]

    t0 = time.time()
    done = 0
    while done < args.max_train_steps:
        shadows = done >= first_shadow
        until = args.max_train_steps if shadows else min(
            first_shadow, args.max_train_steps)
        n = min(args.log_every, until - done)
        losses = tr.train_steps(n, shadows=shadows)
        done += n
        vals = np.asarray(losses)
        for lg, v in zip(loggers, vals):
            lg.scalar("train/loss", float(v), done)
        print(f"step {done}/{args.max_train_steps} shadows={shadows} "
              f"losses={[round(float(v), 4) for v in vals]}", flush=True)

    elapsed = time.time() - t0
    # one run dir per scene, in the single-AOI contract: opts.json +
    # ckpts/epoch=<steps>/{params, step} -> eval_eonerf.py works per scene
    for i, (aoi, root, img) in enumerate(zip(aois, roots, imgs)):
        cfg = TrainConfig(
            root_dir=root, img_dir=img, gt_dir=(gts[i] if gts else None),
            # explicit --aoi_ids are the DATA AOI ids (eval resolves GT as
            # <aoi_id>_DSM.tif); without them, leave None so eval infers
            # from the metadata as in a single-AOI run
            logs_dir=exp_dir, exp_name=aoi,
            aoi_id=(aoi if explicit_aois else None),
            batch_size=args.batch_size, max_train_steps=args.max_train_steps,
            n_samples=args.n_samples, net_depth=args.fc_layers,
            net_width=args.fc_units, lr=args.lr, seed=args.seed,
            compute_dtype=args.compute_dtype,
            occ_enabled=False, occ_tighten=False, use_pallas=use_pallas,
            bwd_acts=args.bwd_acts)
        run_dir = cfg.log_dir()
        cfg.save(os.path.join(run_dir, "opts.json"))
        save_checkpoint(run_dir, args.max_train_steps,
                        {"params": jax.device_get(tr.scene_params(i)),
                         "step": args.max_train_steps})
        loggers[i].close()

    rays = n_scenes * args.batch_size * args.max_train_steps
    stats = {"steps": args.max_train_steps, "scenes": n_scenes,
             "elapsed_s": elapsed, "rays_per_sec": rays / max(elapsed, 1e-9),
             "run_dirs": [os.path.join(exp_dir, a) for a in aois]}
    print(stats)
    return stats
