"""The (N, 11) satellite ray tensor and its structured view.

The ray-tensor layout is a load-bearing on-disk/in-memory contract shared
with the reference (datasets/satellite.py:412-417,21-26):

    columns 0:3   ray origin (scene-normalized)
    columns 3:6   unit direction vector
    column  6     near bound (t at origin; 0 after normalization)
    column  7     far bound (t at the min-altitude end)
    columns 8:11  unit sun direction

`SatRays` is a NamedTuple of arrays, so it is a jax pytree and can be
sharded / passed through jit directly.
"""

from typing import NamedTuple, Any

RAY_TENSOR_WIDTH = 11


class SatRays(NamedTuple):
    origins: Any  # (R, 3)
    viewdirs: Any  # (R, 3)
    sundirs: Any  # (R, 3)
    img_idx: Any  # (R,) int32
    t_near: Any  # (R,)
    t_far: Any  # (R,)

    @property
    def num_rays(self):
        return self.origins.shape[0]


def satrays_from_tensor(rays, ts):
    """(N, 11) float tensor + (N,) or (N, 1) image indices -> SatRays.

    Reference: datasets/satellite.py:23-26 (`define_satrays_from_tensors`).
    """
    ts = ts.reshape(-1).astype("int32") if hasattr(ts, "reshape") else ts
    return SatRays(
        origins=rays[:, 0:3],
        viewdirs=rays[:, 3:6],
        sundirs=rays[:, 8:11],
        img_idx=ts,
        t_near=rays[:, 6],
        t_far=rays[:, 7],
    )
