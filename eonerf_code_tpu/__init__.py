"""eonerf_code_tpu — a TPU-native framework for multi-date satellite NeRF.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the EO-NeRF
reference codebase ("Multi-Date Earth Observation NeRF: The Detail Is in the
Shadows", CVPR EarthVision 2023): digital surface modeling (DSM) and novel
view synthesis from multi-date satellite images with RPC cameras,
geometrically rendered shadows, per-image transient/uncertainty modeling and
radiometric normalization.

Subpackages
-----------
geo       WGS84 / UTM / RPC camera geodesy (pure numpy + differentiable JAX)
io        GeoTIFF + PNG raster I/O (no GDAL dependency)
data      satellite + synthetic datasets, the (N, 11) ray tensor factory
models    radiance fields (EO-NeRF, vanilla NeRF) as flax modules
ops       sampling, volume rendering, occupancy grids, rasterization, NCC
render    image renderers (satellite camera rays, nadir orthographic sweep)
train     training loops, schedules, checkpointing, logging
eval      DSM extraction, registration and altitude-MAE evaluation
parallel  device meshes and sharding helpers (GSPMD data parallelism)
utils     losses/metrics and misc helpers
"""

__version__ = "0.1.0"
