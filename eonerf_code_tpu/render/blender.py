"""Occupancy-grid NeRF rendering for Blender scenes.

This is the working TPU-native version of the reference's broken
`render_image_with_occgrid` path (train_mlp_nerf.py:17 imports a module
that does not exist; utils.py:25 calls a long-gone nerfacc API — SURVEY §2
#10). Dense static-shape design: every ray carries `n_samples` uniform
stratified samples over [near, far]; the occupancy grid contributes an
empty-space MASK (zeroed density) rather than sample compaction, which is
the XLA-friendly equivalent of nerfacc's skipping.
"""

import dataclasses

import jax
import jax.numpy as jnp

from eonerf_code_tpu.ops.sampling import intervals_from_z
from eonerf_code_tpu.ops.volrend import accumulate, render_weights


@dataclasses.dataclass(frozen=True)
class BlenderRenderConfig:
    n_samples: int = 129          # -> 128 intervals
    near: float = 2.0
    far: float = 6.0
    perturb: bool = True


def render_blender_rays(model, params, rays_o, rays_d, color_bkgd, key,
                        cfg: BlenderRenderConfig, occ_grid=None, train=True):
    """Returns dict(rgb, opacity, depth, n_eff_samples)."""
    n = rays_o.shape[0]
    steps = jnp.linspace(0.0, 1.0, cfg.n_samples, dtype=rays_o.dtype)
    z = jnp.broadcast_to(cfg.near * (1 - steps) + cfg.far * steps, (n, cfg.n_samples))
    if cfg.perturb and train:
        from eonerf_code_tpu.ops.sampling import perturb_z_vals

        z = perturb_z_vals(key, z)
    t_starts, t_ends, z_mid, delta = intervals_from_z(z)
    pos = rays_o[:, None, :] + rays_d[:, None, :] * z_mid[..., None]

    mask = None
    if occ_grid is not None:
        inside = jnp.all(jnp.abs(pos) < occ_grid.aabb_max, axis=-1)
        mask = inside & occ_grid.query(pos)

    rgb, sigma = model.apply(params, pos, rays_d[:, None, :])
    weights, _, _ = render_weights(sigma, delta, mask)
    opacity = accumulate(weights)
    depth = accumulate(weights, z_mid)
    color = accumulate(weights, rgb) + (1.0 - opacity)[:, None] * color_bkgd
    n_eff = jnp.sum(mask) if mask is not None else jnp.asarray(weights.size)
    return {"rgb": color, "opacity": opacity[:, None], "depth": depth[:, None],
            "n_eff_samples": n_eff}
