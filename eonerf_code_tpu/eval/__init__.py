"""Evaluation stack: DSM registration + altitude-MAE against lidar GT."""

from eonerf_code_tpu.eval.registration import compute_shift, apply_shift, recursive_ncc
from eonerf_code_tpu.eval.dsm import dsm_pointwise_diff, compute_mae_and_save_dsm_diff

__all__ = [
    "compute_shift",
    "apply_shift",
    "recursive_ncc",
    "dsm_pointwise_diff",
    "compute_mae_and_save_dsm_diff",
]
