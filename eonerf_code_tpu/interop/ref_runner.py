"""Run the reference's own training entry point on CPU.

``run_reference_training`` executes ``/root/reference/train_eonerf.py``
unmodified (via runpy) against a scene directory in the reference's
expected on-disk format — which our synthetic factory
(data/synthetic.py) already emits — with:

- the stub kit from ref_stubs (rasterio/rpcm/pyproj/utm/plyflatten/
  nerfacc/... backed by this framework's own components), and
- a torch patch that maps every 'cuda*' device request to CPU
  (train_eonerf.py:40 hardcodes `cuda:{gpu_id}`).

This is the harness behind the converged head-to-head: the reference
trains its own EONerfMLP through its own render_image/sampling/loss
schedule; only the three nerfacc CUDA kernels are replaced by the exact
pure-torch equivalents in nerfacc_torch.
"""

import contextlib
import os
import runpy
import sys

from eonerf_code_tpu.interop.ref_stubs import REF_DIR, reference_environment


@contextlib.contextmanager
def torch_cuda_as_cpu():
    """Patch torch so device='cuda*' requests land on CPU (reversibly)."""
    import torch

    def _map(a):
        if isinstance(a, str) and a.startswith("cuda"):
            return "cpu"
        if isinstance(a, torch.device) and a.type == "cuda":
            return torch.device("cpu")
        return a

    orig_tensor_to = torch.Tensor.to
    orig_module_to = torch.nn.Module.to
    orig_tensor = torch.tensor

    def tensor_to(self, *args, **kw):
        args = tuple(_map(a) for a in args)
        if "device" in kw:
            kw["device"] = _map(kw["device"])
        return orig_tensor_to(self, *args, **kw)

    def module_to(self, *args, **kw):
        args = tuple(_map(a) for a in args)
        if "device" in kw:
            kw["device"] = _map(kw["device"])
        return orig_module_to(self, *args, **kw)

    def tensor(*args, **kw):
        if "device" in kw:
            kw["device"] = _map(kw["device"])
        return orig_tensor(*args, **kw)

    torch.Tensor.to = tensor_to
    torch.nn.Module.to = module_to
    torch.tensor = tensor
    try:
        yield
    finally:
        torch.Tensor.to = orig_tensor_to
        torch.nn.Module.to = orig_module_to
        torch.tensor = orig_tensor


def run_reference_training(scene_dir, logs_dir, exp_name, *, batch_size=256,
                           n_samples=64, max_steps=2000, chunk=1024,
                           img_dir=None, gt_dir=None, cache_dir=None,
                           extra_argv=(), ref_dir=REF_DIR):
    """Train the reference EO-NeRF on ``scene_dir``; returns the log dir.

    Checkpoints land in ``<logs_dir>/<exp_name>/ckpts/epoch={e}.ckpt``
    (train_eonerf.py:182-191; save cadence = every 4 epochs' worth of
    steps). Choose max_steps as a multiple of 4 * (n_rays // batch_size)
    so the final step checkpoints before the hard exit()."""
    # Ensure scene.loc_utm exists: the reference's init_scaling_params
    # (datasets/satellite.py:377-404) crashes on this numpy/json combo
    # (json.dump of np.float32 scalars); it prefers an existing file
    # (:300), and our SatelliteScene writes the identical 8-corner-ray
    # normalization (tests/test_head_to_head.py::TestDatasetParity).
    if not os.path.exists(os.path.join(str(scene_dir), "scene.loc_utm")):
        from eonerf_code_tpu.data.satellite import SatelliteScene

        SatelliteScene(str(scene_dir))

    argv = [
        os.path.join(ref_dir, "train_eonerf.py"),
        "--root_dir", str(scene_dir),
        "--img_dir", str(img_dir if img_dir is not None else
                         os.path.join(scene_dir, "images")),
        "--logs_dir", str(logs_dir),
        "--exp_name", str(exp_name),
        "--model", "eo-nerf",
        "--batch_size", str(batch_size),
        "--n_samples", str(n_samples),
        "--max_train_steps", str(max_steps),
        "--chunk", str(chunk),
        "--geometric_shadows",
        "--radiometric_normalization",
    ]
    if gt_dir is not None:
        argv += ["--gt_dir", str(gt_dir)]
    if cache_dir is not None:
        argv += ["--cache_dir", str(cache_dir)]
    argv += list(extra_argv)

    old_argv = sys.argv
    with reference_environment(ref_dir):
        with torch_cuda_as_cpu():
            sys.argv = argv
            try:
                runpy.run_path(argv[0], run_name="__main__")
            except SystemExit:  # train_eonerf.py:300 hard exit at max_steps
                pass
            finally:
                sys.argv = old_argv
    return os.path.join(str(logs_dir), str(exp_name))


def latest_reference_checkpoint(log_dir):
    """Path of the newest epoch={e}.ckpt under log_dir/ckpts (the rule
    eval_eonerf.py:259-264 uses)."""
    ckpt_dir = os.path.join(log_dir, "ckpts")
    cands = [f for f in os.listdir(ckpt_dir) if f.endswith(".ckpt")]
    if not cands:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    epoch = max(int(f.split("=")[1].split(".")[0]) for f in cands)
    return os.path.join(ckpt_dir, f"epoch={epoch}.ckpt")
