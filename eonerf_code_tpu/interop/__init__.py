"""Interoperability with the PyTorch reference implementation.

This package makes the reference's own code runnable and its checkpoints
loadable, so the north-star comparison ("DSM MAE within 2 cm of the
reference, bit-matching renderings") can be MEASURED instead of argued
component-by-component:

- ``nerfacc_torch``: pure-torch CPU shims for the three nerfacc CUDA
  kernels the reference calls (the only hard native dependency of its
  hot path).
- ``ref_params``: loss-free weight transplant in BOTH directions between
  our flax ``EONerfField`` and the reference's ``EONerfMLP``.
- ``ref_stubs``: stub modules (rasterio / rpcm / pyproj / utm /
  plyflatten / affine / torchvision / numba / nerfacc) backed by this
  framework's own from-scratch equivalents, sufficient to import and RUN
  the reference's training entry point on CPU.
- ``ref_runner``: drives ``/root/reference/train_eonerf.py`` end-to-end
  on a scene directory (our synthetic factory already writes the
  reference's exact on-disk format).
"""

from eonerf_code_tpu.interop.ref_params import (  # noqa: F401
    load_reference_checkpoint,
    params_to_reference_state_dict,
    reference_state_dict_to_params,
)
