"""Losses, metrics and misc utilities."""

from eonerf_code_tpu.utils.metrics import (
    uncertainty_aware_loss,
    depth_loss_l2,
    shadow_loss_l2,
    differentiable_thresholding,
    mse,
    psnr,
)

__all__ = [
    "uncertainty_aware_loss",
    "depth_loss_l2",
    "shadow_loss_l2",
    "differentiable_thresholding",
    "mse",
    "psnr",
]
