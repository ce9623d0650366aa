"""Point-cloud -> DSM rasterization (plyflatten-equivalent).

The reference rasterizes the NeRF point cloud with plyflatten's C backend
(datasets/satellite.py:580-587) using radius=1, sigma=inf: every point
contributes with uniform weight to all cells within a Chebyshev radius of 1
cell of its own, and each cell stores the mean of its contributors (NaN if
empty).

Two implementations: a host numpy version (np.add.at scatter) and a
device/jit version built on `jax.ops.segment_sum` for the on-device eval
sweep (SURVEY §7 decision 4).
"""

import numpy as np


def _cell_indices(easts, norths, xoff, yoff, resolution):
    cols = np.floor((np.asarray(easts) - xoff) / resolution).astype(np.int64)
    rows = np.floor((yoff - np.asarray(norths)) / resolution).astype(np.int64)
    return cols, rows


def rasterize_pointcloud(easts, norths, alts, xoff, yoff, resolution,
                         xsize, ysize, radius=1):
    """Mean-splat rasterization. Returns (ysize, xsize) float64 with NaNs."""
    cols, rows = _cell_indices(easts, norths, xoff, yoff, resolution)
    alts = np.asarray(alts, np.float64)
    acc = np.zeros((ysize, xsize), np.float64)
    cnt = np.zeros((ysize, xsize), np.int64)
    for dr in range(-radius, radius + 1):
        for dc in range(-radius, radius + 1):
            r = rows + dr
            c = cols + dc
            ok = (r >= 0) & (r < ysize) & (c >= 0) & (c < xsize)
            np.add.at(acc, (r[ok], c[ok]), alts[ok])
            np.add.at(cnt, (r[ok], c[ok]), 1)
    with np.errstate(invalid="ignore"):
        dsm = acc / cnt
    dsm[cnt == 0] = np.nan
    return dsm


def rasterize_pointcloud_jax(easts, norths, alts, xoff, yoff, resolution,
                             xsize, ysize, radius=1):
    """Device-side variant: scatter-mean via segment_sum over linearized cell
    indices. xsize/ysize/radius must be static under jit."""
    import jax.numpy as jnp
    from jax.ops import segment_sum

    cols = jnp.floor((easts - xoff) / resolution).astype(jnp.int32)
    rows = jnp.floor((yoff - norths) / resolution).astype(jnp.int32)
    n_cells = xsize * ysize
    acc = jnp.zeros((n_cells,), jnp.float64 if alts.dtype == jnp.float64 else jnp.float32)
    cnt = jnp.zeros((n_cells,), jnp.int32)
    for dr in range(-radius, radius + 1):
        for dc in range(-radius, radius + 1):
            r = rows + dr
            c = cols + dc
            ok = (r >= 0) & (r < ysize) & (c >= 0) & (c < xsize)
            lin = jnp.where(ok, r * xsize + c, 0)
            acc = acc + segment_sum(jnp.where(ok, alts, 0.0), lin, num_segments=n_cells)
            cnt = cnt + segment_sum(ok.astype(jnp.int32), lin, num_segments=n_cells)
    dsm = jnp.where(cnt > 0, acc / jnp.maximum(cnt, 1), jnp.nan)
    return dsm.reshape(ysize, xsize)
