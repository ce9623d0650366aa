"""Command-line interface mirroring the reference's entry points.

Flag names follow the reference's opt.py so users can switch with their
existing commands; flags the reference declared but never read are either
implemented for real (--ckpt_path resume, --rpc_correction) or accepted and
ignored with a warning (listed in IGNORED_FLAGS).
"""

import argparse
import os
import sys

from eonerf_code_tpu.config import TrainConfig

IGNORED_FLAGS = ["noise_std", "sc_lambda", "ds_lambda", "ds_drop",
                 "t_embbeding_tau", "t_embbeding_vocab"]


def build_parser():
    p = argparse.ArgumentParser(description="TPU-native EO-NeRF")
    p.add_argument("--root_dir", type=str, required=True)
    p.add_argument("--img_dir", type=str, default=None)
    p.add_argument("--logs_dir", type=str, default="logs")
    p.add_argument("--gt_dir", type=str, default=None)
    p.add_argument("--cache_dir", type=str, default=None)
    p.add_argument("--ckpt_path", type=str, default=None,
                   help="checkpoint to RESUME training from (implemented here)")
    p.add_argument("--exp_name", type=str, default="eo-nerf")
    p.add_argument("--aoi_id", type=str, default=None)
    p.add_argument("--model", type=str, default="eo-nerf",
                   choices=["eo-nerf", "sat-nerf"])
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--img_downscale", type=float, default=1.0)
    p.add_argument("--max_train_steps", type=int, default=300000)
    p.add_argument("--fc_units", type=int, default=256, dest="net_width")
    p.add_argument("--fc_layers", type=int, default=8, dest="net_depth")
    p.add_argument("--n_samples", type=int, default=128)
    p.add_argument("--n_importance", type=int, default=0,
                   help="hierarchical fine samples (dead in the reference; real here)")
    p.add_argument("--sc_n_samples", type=int, default=-1,
                   help="shadow-march samples per solar ray. -1 (default) = "
                        "auto: min(n_samples, max(n_samples//2, 64)) — the "
                        "on-chip A/B point, quality parity at +25% step "
                        "speed; 0 = follow --n_samples (the reference's "
                        "rule); explicit >0 wins")
    p.add_argument("--chunk", type=int, default=1024)
    p.add_argument("--geometric_shadows", action="store_true", default=True)
    p.add_argument("--no_geometric_shadows", dest="geometric_shadows", action="store_false")
    p.add_argument("--radiometric_normalization", action="store_true", default=False)
    p.add_argument("--rpc_correction", action="store_true", default=False)
    p.add_argument("--ecef", action="store_true", default=False)
    p.add_argument("--n_grid", type=int, default=128)
    p.add_argument("--init_dsm_path", type=str, default=None)
    p.add_argument("--init_conf_path", type=str, default=None)
    p.add_argument("--shadow_masks_dir", type=str, default=None)
    p.add_argument("--subset_Nviews", type=int, default=None, dest="subset_n_views")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--seed", type=int, default=42)
    # --- framework extensions beyond the reference flag surface ---
    g = p.add_argument_group("tpu-native extensions")
    g.add_argument("--occ_tighten", action="store_true", default=False,
                   help="concentrate samples on each ray's occupied span "
                        "(better MAE at ~1.5x speed on the production scene)")
    g.add_argument("--no_occ_tighten_shadows", dest="occ_tighten_shadows",
                   action="store_false", default=None,
                   help="keep the shadow march uniform even with --occ_tighten")
    g.add_argument("--occ_tighten_start_step", type=int, default=2000)
    g.add_argument("--occ_entropy_max", type=float, default=None,
                   help="tighten only while probe-ray weight entropy is <= "
                        "this. WARNING: A/B-REFUTED as a divergence gate — "
                        "a stabilized floater field looks 'peaked', so "
                        "entropy FALLS during divergence and the gate opens "
                        "at ~0.57 regardless of threshold (STATUS.md); the "
                        "occ/weight_entropy scalar is useful telemetry, this "
                        "gate is not. Prefer sampler=auto's envelope "
                        "routing. (default: disabled)")
    def _strict_bool(v):
        if v.lower() in ("true", "false"):
            return v.lower() == "true"
        raise argparse.ArgumentTypeError(f"expected true/false, got {v!r}")

    g.add_argument("--use_pallas", type=_strict_bool,
                   default=None, metavar="{true,false}",
                   help="fused Pallas field kernels (default: auto — on for "
                        "bf16 on TPU backends)")
    g.add_argument("--trunk_quant", type=str, default="none",
                   choices=["none", "int8", "int8_full"],
                   help="int8 trunk matmuls inside the fused kernels (v5e "
                        "MXU int8 = 2x bf16; straight-through gradients); "
                        "int8_full also quantizes the trunk dgrad/wgrad "
                        "cotangent matmuls")
    g.add_argument("--bwd_acts", type=str, default="saved",
                   choices=["recompute", "saved"],
                   help="fused-kernel backward: stream saved trunk "
                        "activations through HBM and skip the backward's "
                        "recompute pass (default; +13.5%% on-chip, auto-"
                        "falls back to recompute above the HBM cap) or "
                        "recompute the trunk in-kernel")
    g.add_argument("--freq_reg_end_step", type=int, default=0,
                   help="BARF-style coarse-to-fine PE annealing: ramp to "
                        "full bandwidth by this step (recommended with "
                        "--rpc_correction; 0 = off)")
    g.add_argument("--freq_reg_start_step", type=int, default=0,
                   help="annealing ramp start (must be < --freq_reg_end_step;"
                        " annealing is enabled by the END step)")
    g.add_argument("--data_axis", type=int, default=1,
                   help="devices on the ray-batch mesh axis: N>1 shards the "
                        "ray pool + every batch over N chips (gradient psum "
                        "over ICI); -1 = all visible devices; 1 = single chip")
    g.add_argument("--lr_decay_steps", type=int, default=None,
                   help="decay lr per N steps instead of per epoch")
    g.add_argument("--first_shadow_step", type=int, default=None)
    g.add_argument("--first_beta_step", type=int, default=None)
    g.add_argument("--steps_per_call", type=int, default=25,
                   help="train steps scanned inside one jit dispatch")
    g.add_argument("--val_freq", type=int, default=None)
    g.add_argument("--save_freq", type=int, default=None)
    g.add_argument("--device_eval", action="store_true", default=None,
                   help="force the registered DSM MAE fully on device "
                        "(failures raise). Default: auto — in-training "
                        "validation uses the device path with a host "
                        "fallback; final eval artifacts stay host-side")
    g.add_argument("--no_device_eval", dest="device_eval",
                   action="store_false",
                   help="force the host GeoTIFF MAE path everywhere")
    return p


def config_from_args(argv=None):
    args, unknown = build_parser().parse_known_args(argv)
    # group "--flag value" pairs so each dead flag warns once
    i = 0
    while i < len(unknown):
        tok = unknown[i]
        val = ""
        if tok.startswith("--") and i + 1 < len(unknown) and not unknown[i + 1].startswith("--"):
            val = " " + unknown[i + 1]
            i += 1
        why = ("dead in the reference too, deliberately not implemented"
               if tok.lstrip("-") in IGNORED_FLAGS else "unknown flag")
        print(f"warning: ignoring flag {tok}{val} ({why})", file=sys.stderr)
        i += 1
    d = vars(args)
    known = {f.name for f in __import__("dataclasses").fields(TrainConfig)}
    return TrainConfig(**{k: v for k, v in d.items() if k in known})


def main_train(argv=None):
    from eonerf_code_tpu.train.loop import Trainer

    cfg = config_from_args(argv)
    stats = Trainer(cfg).run()
    print(stats)
    return stats


def eval_cli(argv=None):
    p = argparse.ArgumentParser(description="TPU-native EO-NeRF evaluation")
    p.add_argument("run_id")
    p.add_argument("--logs_dir", type=str, default="logs")
    p.add_argument("--output_dir", type=str, default="eval_out")
    p.add_argument("--epoch_nb", type=int, default=None)
    p.add_argument("--root_dir", type=str, default=None)
    p.add_argument("--img_dir", type=str, default=None)
    p.add_argument("--gt_dir", type=str, default=None)
    p.add_argument("--dsm", action="store_true")
    p.add_argument("--pinhole", action="store_true",
                   help="virtual pinhole camera for the DSM sweep (the "
                        "reference's dormant branch; default: orthographic)")
    p.add_argument("--chunk", type=int, default=4096)
    p.add_argument("--dsm_resolution", type=float, default=None)
    p.add_argument("--data_axis", type=int, default=0,
                   help="shard eval rendering over N devices (-1 = all; "
                        "0/1 = single device)")
    p.add_argument("--export_rpc", action="store_true",
                   help="write bundle-adjusted per-view RPC metadata "
                        "(requires a run trained with --rpc_correction)")
    args = p.parse_args(argv)
    from eonerf_code_tpu.eval.run import eval_eonerf

    out = eval_eonerf(args.run_id, args.logs_dir, args.output_dir,
                      epoch_nb=args.epoch_nb, root_dir=args.root_dir,
                      img_dir=args.img_dir, gt_dir=args.gt_dir, dsm=args.dsm,
                      chunk=args.chunk, dsm_resolution=args.dsm_resolution,
                      pinhole=args.pinhole, data_axis=args.data_axis)
    if args.export_rpc:
        from eonerf_code_tpu.eval.export import export_adjusted_rpcs

        rpc_dir = os.path.join(args.output_dir, args.run_id, "rpc_adjusted")
        exported = export_adjusted_rpcs(
            os.path.join(args.logs_dir, args.run_id), rpc_dir,
            epoch_nb=args.epoch_nb, root_dir=args.root_dir,
            img_dir=args.img_dir)
        # eval_eonerf returns a dict (dsm mode) or a per-view list
        out = dict(out) if isinstance(out, dict) else {"report": out}
        out["rpc_adjusted_dir"] = rpc_dir
        out["rpc_adjusted_views"] = len(exported)
    print(out)
    return out
