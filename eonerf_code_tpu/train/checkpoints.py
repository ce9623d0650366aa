"""Checkpoint save/restore via orbax.

Same logical contents as the reference's torch.save dict (train_eonerf.py:
182-191): {step, epoch, occupancy grid, model params, optimizer state} —
plus real training resume, which the reference declares (--ckpt_path,
opt.py:26-27) but never implements.
"""

import os

import orbax.checkpoint as ocp


def _ckpt_dir(log_dir, epoch):
    return os.path.abspath(os.path.join(log_dir, "ckpts", f"epoch={epoch}"))


def save_checkpoint(log_dir, epoch, state, overwrite=None):
    """state: any pytree (params, opt_state, occ arrays, step, epoch...).

    Integer-tagged checkpoints are IDEMPOTENT: if the finalized directory
    already exists, the save is skipped. Overwriting deletes the existing
    directory first (orbax force), so a kill/wedge mid-save would destroy
    the only good copy — observed when a resumed run's end-of-segment save
    re-targeted the exact checkpoint it restored from. Named tags ("best")
    keep overwrite semantics."""
    path = _ckpt_dir(log_dir, epoch)
    if overwrite is None:
        overwrite = not isinstance(epoch, int)
    if not overwrite and os.path.isdir(path):
        return path
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, state, force=True)
    return path


def latest_checkpoint(log_dir):
    d = os.path.join(log_dir, "ckpts")
    if not os.path.isdir(d):
        return None
    epochs = []
    for name in os.listdir(d):
        if name.startswith("epoch="):
            try:
                epochs.append(int(name.split("=")[1]))
            except ValueError:
                pass
    if not epochs:
        return None
    return _ckpt_dir(log_dir, max(epochs))


def restore_checkpoint(path, template=None):
    """Restore a checkpoint pytree. With a template, the ENTIRE saved tree
    must match its structure; pass template=None to restore whatever was
    saved (subsets are then extracted by the caller)."""
    ckptr = ocp.PyTreeCheckpointer()
    if template is None:
        return ckptr.restore(os.path.abspath(path))
    return ckptr.restore(os.path.abspath(path), item=template)
