"""Import a reference (PyTorch) training run into this framework.

``import_reference_run`` converts a reference log directory — opts.json
(opt.py:105-107) + ``ckpts/epoch={e}.ckpt`` (train_eonerf.py:182-191) —
into a run directory our ``eval_eonerf`` / serving stack consumes
directly: the weight transplant from ref_params plus a TrainConfig
mapped from the reference's flag surface.

This is the migration path for users switching from the reference: bring
a trained torch checkpoint, evaluate/serve it on TPU unchanged. It is
also the eval side of the converged head-to-head
(scripts/run_reference_head_to_head.py): both stacks' models flow
through the IDENTICAL eval pipeline.
"""

import json
import os

from eonerf_code_tpu.config import TrainConfig
from eonerf_code_tpu.interop.ref_params import load_reference_checkpoint
from eonerf_code_tpu.train import checkpoints as ckpt_lib


def config_from_reference_opts(opts, **overrides):
    """Reference opt.py namespace dict -> TrainConfig (flags share names
    by design; the reference's dead flags are dropped)."""
    cfg = TrainConfig(
        root_dir=opts.get("root_dir", ""),
        img_dir=opts.get("img_dir"),
        gt_dir=opts.get("gt_dir"),
        cache_dir=opts.get("cache_dir"),
        logs_dir=opts.get("logs_dir", "logs"),
        exp_name=opts.get("exp_name", "imported"),
        model=opts.get("model", "eo-nerf"),
        img_downscale=float(opts.get("img_downscale", 1.0)),
        ecef=bool(opts.get("ecef", False)),
        lr=float(opts.get("lr", 5e-4)),
        batch_size=int(opts.get("batch_size", 1024)),
        n_samples=int(opts.get("n_samples", 128)),
        sc_n_samples=0,  # the reference marches shadows at n_samples
        chunk=int(opts.get("chunk", 1024)),
        radiometric_normalization=bool(opts.get("radiometric_normalization", True)),
        # the reference's grid never drives sampling (SURVEY §2 #3); an
        # imported run evals with plain uniform sampling like it trained
        occ_enabled=False, occ_tighten=False,
        use_pallas=False,
    )
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return cfg


def import_reference_run(ref_log_dir, out_run_dir, ckpt_path=None, **cfg_overrides):
    """Convert a reference training run into an our-format run directory.

    Returns (cfg, params). After this, ``eval_eonerf(run_id=...,
    logs_dir=...)`` works on the imported run unchanged.
    """
    opts_path = os.path.join(ref_log_dir, "opts.json")
    with open(opts_path) as f:
        opts = json.load(f)

    if ckpt_path is None:
        from eonerf_code_tpu.interop.ref_runner import latest_reference_checkpoint

        ckpt_path = latest_reference_checkpoint(ref_log_dir)
    params, kwargs, raw = load_reference_checkpoint(ckpt_path)

    cfg = config_from_reference_opts(
        opts,
        net_depth=kwargs["net_depth"], net_width=kwargs["net_width"],
        radiometric_normalization=kwargs["radiometric_normalization"],
        **cfg_overrides)

    os.makedirs(out_run_dir, exist_ok=True)
    cfg.exp_name = os.path.basename(os.path.normpath(out_run_dir))
    cfg.logs_dir = os.path.dirname(os.path.normpath(out_run_dir))
    cfg.save(os.path.join(out_run_dir, "opts.json"))
    epoch = int(raw.get("epoch", 0)) if isinstance(raw, dict) else 0
    ckpt_lib.save_checkpoint(out_run_dir, epoch,
                             {"params": params, "step": epoch, "epoch": epoch})
    return cfg, params
