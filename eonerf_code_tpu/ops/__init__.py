"""Compute primitives: sampling, volume rendering, occupancy, raster, NCC."""

from eonerf_code_tpu.ops.sampling import (
    stratified_z_vals,
    perturb_z_vals,
    intervals_from_z,
    cube_mask,
    set_last_valid,
)
from eonerf_code_tpu.ops.volrend import (
    render_weights,
    exit_transmittance,
    accumulate,
)
from eonerf_code_tpu.ops.occupancy import OccupancyGrid

__all__ = [
    "stratified_z_vals",
    "perturb_z_vals",
    "intervals_from_z",
    "cube_mask",
    "set_last_valid",
    "render_weights",
    "exit_transmittance",
    "accumulate",
    "OccupancyGrid",
]
