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

Feature parity with the single-AOI trainer (round-4): `--rpc_correction`
(per-scene learnable ray offsets + PE annealing), `--sampler auto`
(worst-scene envelope rule: tighten only when EVERY scene is compact,
hierarchical otherwise — one static sampling branch serves the vmapped
scene program), per-scene occupancy grids with the all-scenes stability
gate, the `sc_n_samples`/`bwd_acts` production defaults, depth/shadow
priors (`--init_dsm_paths`/`--shadow_masks_dirs`, per-scene with empty
slots allowed — prior-less scenes see neutral sentinels in one static
program), and pod resume (`--resume` + `--save_freq`, bit-exact vs an
uninterrupted run). The fused
Pallas kernels are available (`--use_pallas`, auto on for bf16+TPU+8x256)
via the shard_map'ed step in `parallel/multi_aoi.py`; the RESOLVED
configuration (sampler, occ flags, sc count, backend) is recorded in each
scene's opts.json and the occupancy state + tighten_active sidecar in each
scene's checkpoint, so eval renders through the same backend and sampler
the run trained with — the one-backend-per-run invariant holds here too.
"""

import argparse
import json
import os
import time


def _split(s):
    return [x for x in (s or "").split(",") if x]


def _split_keep(s, n, flag):
    """Comma-split preserving EMPTY slots (scene without this input), e.g.
    --init_dsm_paths dsmA.tif,,dsmC.tif for 3 scenes. Returns [None]*n when
    the flag is unset."""
    if not s:
        return [None] * n
    out = [x.strip() or None for x in s.split(",")]
    if len(out) != n:
        raise SystemExit(f"error: {flag} must have one (possibly empty) "
                         f"entry per scene ({len(out)} given, {n} scenes)")
    return out


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
    p.add_argument("--sc_n_samples", type=int, default=-1,
                   help="shadow-march samples per solar ray (-1 = auto: "
                        "min(n, max(n//2, 64)), the on-chip A/B point; "
                        "0 = follow --n_samples)")
    p.add_argument("--n_importance", type=int, default=0,
                   help="hierarchical fine samples per ray (sampler="
                        "hierarchical sets the validated shape itself)")
    p.add_argument("--sampler", type=str, default="auto",
                   choices=["auto", "uniform", "tighten", "hierarchical"],
                   help="camera sampling mode. auto resolves from the WORST "
                        "scene's altitude envelope (every scene compact -> "
                        "occupancy tightening, any wide scene -> "
                        "hierarchical for ALL — one static sampling branch "
                        "serves the vmapped scene program)")
    p.add_argument("--occ_tighten_start_step", type=int, default=2000)
    p.add_argument("--n_grid", type=int, default=64,
                   help="occupancy grid resolution per scene")
    p.add_argument("--rpc_correction", action="store_true", default=False,
                   help="learnable per-image ray-bundle offsets per scene "
                        "(RPC bundle adjustment; combine with "
                        "--freq_reg_end_step for convergence)")
    p.add_argument("--init_dsm_paths", type=str, default="",
                   help="comma-separated per-scene external DSMs for the "
                        "depth-prior loss; leave a slot EMPTY for scenes "
                        "without one (e.g. a.tif,,c.tif) — mixed scenes "
                        "train in one program, prior-less scenes see "
                        "neutral sentinels")
    p.add_argument("--init_conf_paths", type=str, default="",
                   help="comma-separated per-scene SGM confidence rasters "
                        "(optional, same empty-slot rule)")
    p.add_argument("--shadow_masks_dirs", type=str, default="",
                   help="comma-separated per-scene shadow-mask dirs for the "
                        "shadow-prior loss (same empty-slot rule)")
    p.add_argument("--fc_layers", type=int, default=8)
    p.add_argument("--fc_units", type=int, default=256)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--lr_decay_steps", type=int, default=None,
                   help="StepLR decay interval (lr *= 0.9 every N steps — "
                        "the single-AOI schedule; default: constant lr)")
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
    p.add_argument("--bwd_acts", type=str, default="saved",
                   choices=["recompute", "saved"],
                   help="fused-kernel backward mode (see train_eonerf.py; "
                        "saved is the measured-faster production default)")
    p.add_argument("--freq_reg_end_step", type=int, default=0,
                   help="BARF-style coarse-to-fine PE annealing ramp end "
                        "(0 = off; see train_eonerf.py)")
    p.add_argument("--freq_reg_start_step", type=int, default=0)
    p.add_argument("--save_freq", type=int, default=0,
                   help="pod-checkpoint every N steps into "
                        "<logs>/<exp>/_pod/ckpts (stacked params + opt + "
                        "occ + step; 0 = final checkpoint only). Per-scene "
                        "eval-contract run dirs are always written at the "
                        "end of the run")
    p.add_argument("--resume", action="store_true", default=False,
                   help="resume from the latest pod checkpoint under "
                        "<logs>/<exp>/_pod if one exists (fresh start "
                        "otherwise — safe to pass unconditionally, e.g. "
                        "under scripts/supervise.py restarts). RNG keys "
                        "derive from (seed, step), so a resumed run is "
                        "bit-identical to an uninterrupted one")
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

    n_scenes = len(roots)
    dsm_paths = _split_keep(args.init_dsm_paths, n_scenes, "--init_dsm_paths")
    conf_paths = _split_keep(args.init_conf_paths, n_scenes,
                             "--init_conf_paths")
    mask_dirs = _split_keep(args.shadow_masks_dirs, n_scenes,
                            "--shadow_masks_dirs")
    datasets = [SatelliteDataset(r, i, split="train",
                                 prior_dsm_path=dp, prior_conf_path=cp,
                                 shadow_masks_dir=md)
                for r, i, dp, cp, md in zip(roots, imgs, dsm_paths,
                                            conf_paths, mask_dirs)]

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

    # ---- sampler resolution (single-AOI semantics, worst-scene rule) ----
    # One static sampling branch serves the whole vmapped scene program, so
    # `auto` resolves from the WORST scene's altitude envelope: tightening
    # only when EVERY scene is compact (it reproducibly diverges on wide
    # envelopes — STATUS.md round 2), hierarchical for all otherwise.
    # Explicit --n_importance forces hierarchical, matching the single-AOI
    # resolver's explicit-flags-win rule (train/loop.py _resolve_sampler).
    sampler = args.sampler
    n_samples, n_importance = args.n_samples, args.n_importance
    if n_importance > 0:
        # explicit flag wins over any sampler string, exactly as the
        # single-AOI resolver orders it — the recorded sampler must always
        # name what the program actually runs
        sampler = "hierarchical"
    elif sampler == "auto":
        envelopes = [d.alt_envelope() for d in datasets]
        widest = max(hi - lo for lo, hi in envelopes)
        env_max = TrainConfig().occ_tighten_max_envelope_m  # shared policy
        sampler = "tighten" if widest <= env_max else "hierarchical"
        print(f"sampler=auto -> {sampler} (widest envelope {widest:.0f} m "
              f"over {n_scenes} scenes)", flush=True)
    if sampler == "hierarchical" and n_importance == 0:
        # the validated wide-envelope shape: 3/4 coarse + half-of-coarse fine
        n_samples = max((3 * n_samples) // 4, 8)
        n_importance = max(n_samples // 2, 4)
    occ_tighten = sampler == "tighten"
    sc_n = TrainConfig(n_samples=n_samples,
                       sc_n_samples=args.sc_n_samples).resolve_sc_n_samples()
    if args.rpc_correction and args.freq_reg_end_step <= 0:
        import sys

        print("warning: --rpc_correction without --freq_reg_end_step — "
              "joint camera refinement usually needs coarse-to-fine PE "
              "annealing to converge (see train_eonerf.py's warning)",
              file=sys.stderr)

    tr = MultiAOITrainer(datasets, mesh, n_samples=n_samples,
                         sc_n_samples=sc_n,
                         n_importance=n_importance,
                         occ_enabled=occ_tighten, occ_tighten=occ_tighten,
                         occ_tighten_start_step=args.occ_tighten_start_step,
                         n_grid=args.n_grid,
                         rpc_correction=args.rpc_correction,
                         batch_size=args.batch_size, lr=args.lr,
                         lr_decay_steps=args.lr_decay_steps,
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
    pod_dir = os.path.join(exp_dir, "_pod")
    if args.resume:
        from eonerf_code_tpu.train.checkpoints import latest_checkpoint

        latest = latest_checkpoint(pod_dir)
        if latest is not None:
            tr.restore_pod(latest)
            print(f"resumed pod from {latest} (step {tr.step})", flush=True)
    loggers = [MetricsLogger(os.path.join(exp_dir, a)) for a in aois]

    t0 = time.time()
    done = tr.step
    start_step = done
    while done < args.max_train_steps:
        shadows = done >= first_shadow
        until = args.max_train_steps if shadows else min(
            first_shadow, args.max_train_steps)
        n = min(args.log_every, until - done)
        if args.save_freq > 0:
            r = done % args.save_freq
            n = min(n, args.save_freq - r if r else args.save_freq)
        losses = tr.train_steps(n, shadows=shadows)
        done += n
        if args.save_freq > 0 and done % args.save_freq == 0 \
                and done < args.max_train_steps:
            tr.save_pod(pod_dir)
        vals = np.asarray(losses)
        for lg, v in zip(loggers, vals):
            lg.scalar("train/loss", float(v), done)
        print(f"step {done}/{args.max_train_steps} shadows={shadows} "
              f"losses={[round(float(v), 4) for v in vals]}", flush=True)

    elapsed = time.time() - t0
    # final pod checkpoint: a later --resume with a larger --max_train_steps
    # extends the run from here (and supervise.py restarts land here too)
    tr.save_pod(pod_dir)
    # one run dir per scene, in the single-AOI contract: opts.json +
    # ckpts/epoch=<steps>/{params, step} -> eval_eonerf.py works per scene
    tighten_active = tr.occ_gate_open()
    for i, (aoi, root, img) in enumerate(zip(aois, roots, imgs)):
        cfg = TrainConfig(
            root_dir=root, img_dir=img, gt_dir=(gts[i] if gts else None),
            # explicit --aoi_ids are the DATA AOI ids (eval resolves GT as
            # <aoi_id>_DSM.tif); without them, leave None so eval infers
            # from the metadata as in a single-AOI run
            logs_dir=exp_dir, exp_name=aoi,
            aoi_id=(aoi if explicit_aois else None),
            batch_size=args.batch_size, max_train_steps=args.max_train_steps,
            n_samples=n_samples, n_importance=n_importance,
            sc_n_samples=sc_n, sampler=sampler,
            net_depth=args.fc_layers,
            net_width=args.fc_units, lr=args.lr,
            lr_decay_steps=args.lr_decay_steps, seed=args.seed,
            compute_dtype=args.compute_dtype,
            rpc_correction=args.rpc_correction,
            init_dsm_path=dsm_paths[i], init_conf_path=conf_paths[i],
            shadow_masks_dir=mask_dirs[i],
            freq_reg_start_step=args.freq_reg_start_step,
            freq_reg_end_step=args.freq_reg_end_step,
            occ_enabled=occ_tighten, occ_tighten=occ_tighten,
            occ_tighten_start_step=args.occ_tighten_start_step,
            n_grid=args.n_grid, use_pallas=use_pallas,
            bwd_acts=args.bwd_acts)
        run_dir = cfg.log_dir()
        cfg.save(os.path.join(run_dir, "opts.json"))
        state = {"params": jax.device_get(tr.scene_params(i)),
                 "step": args.max_train_steps}
        occ_state = tr.scene_occ_state(i)
        if occ_state is not None:
            state["occ"] = occ_state
        ckpt_path = save_checkpoint(run_dir, args.max_train_steps, state)
        if occ_tighten:
            # single-AOI sidecar contract (train/loop.py save/restore):
            # SAME keys ("frac_hist", "tighten_active"), so eval knows
            # whether tightened sampling was ACTIVE at this checkpoint and
            # train_eonerf.py --ckpt_path can continue the scene without
            # re-arming the gate
            with open(os.path.join(ckpt_path, "occ_sampling.json"), "w") as f:
                json.dump({"tighten_active": tighten_active,
                           "frac_hist": [float(h[i])
                                         for h in tr._occ_frac_hist]}, f)
        loggers[i].close()

    # throughput over the steps THIS process ran: a resumed run's elapsed
    # covers only its own segment (0.0 when the run was already complete)
    steps_run = done - start_step
    rays = n_scenes * args.batch_size * steps_run
    stats = {"steps": args.max_train_steps, "steps_run": steps_run,
             "scenes": n_scenes, "elapsed_s": elapsed,
             "rays_per_sec": (rays / max(elapsed, 1e-9)) if steps_run else 0.0,
             "run_dirs": [os.path.join(exp_dir, a) for a in aois]}
    print(stats)
    return stats
