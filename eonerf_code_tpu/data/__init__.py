"""Datasets and ray factories."""

from eonerf_code_tpu.data.rays import SatRays, satrays_from_tensor, RAY_TENSOR_WIDTH

__all__ = ["SatRays", "satrays_from_tensor", "RAY_TENSOR_WIDTH"]
