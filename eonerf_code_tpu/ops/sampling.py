"""Ray sampling on dense (rays, samples) blocks.

The reference's production sampler is fixed-count uniform-in-depth
(sat_rendering.py:56-84, `satnerf_sampling`): every ray gets ``n_samples``
z values on [near, near+2], stratified-jittered, then flattened into
nerfacc's variable-length (n_pts,)+ray_indices format with out-of-cube
points REMOVED. On TPU we keep the dense static-shape layout and express
the removal as a validity MASK (zeroed density), which is algebraically
identical for transmittance/weights (SURVEY §7 decision 1).

Note a reference quirk we reproduce: `satnerf_sampling` ignores its
"stratified" argument — sampling is perturbed in BOTH train and eval
(sat_rendering.py:56,69). Callers can still disable it explicitly.
"""

import jax
import jax.numpy as jnp


def perturb_z_vals(key, z_vals, perturb=1.0):
    """Stratified jitter inside midpoint intervals (sat_rendering.py:46-54)."""
    mids = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
    upper = jnp.concatenate([mids, z_vals[:, -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[:, :1], mids], axis=-1)
    u = perturb * jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
    return lower + (upper - lower) * u


def stratified_z_vals(key, near, far, n_samples, perturb=True):
    """Uniform-in-depth z values: (R, n_samples) on [near, far] per ray.

    near/far: (R,) or (R, 1).
    """
    near = near.reshape(-1, 1)
    far = far.reshape(-1, 1)
    steps = jnp.linspace(0.0, 1.0, n_samples, dtype=near.dtype)
    z_vals = near * (1.0 - steps) + far * steps
    if perturb:
        z_vals = perturb_z_vals(key, z_vals)
    return z_vals


def intervals_from_z(z_vals):
    """z (R, S) -> (t_starts, t_ends, z_mid, delta), each (R, S-1).

    Matches satnerf_sampling's interval construction: t_start = z_i,
    t_end = z_{i+1}, sample position at the midpoint.
    """
    t_starts = z_vals[:, :-1]
    t_ends = z_vals[:, 1:]
    z_mid = 0.5 * (t_starts + t_ends)
    delta = t_ends - t_starts
    return t_starts, t_ends, z_mid, delta


def sample_pdf(key, bins, weights, n_importance, perturb=True, eps=1e-5):
    """Inverse-CDF sampling of ``n_importance`` z values per ray from a
    piecewise-constant PDF over ``bins``.

    This implements the hierarchical (importance) sampling the reference
    DECLARES but never wires (--n_importance, opt.py:56-57 — dead per
    SURVEY §2 #11): coarse-pass weights concentrate the fine samples near
    the surface, cutting the depth quantization that bounds DSM accuracy.

    bins: (R, K+1) interval edges (the coarse z values).
    weights: (R, K) coarse volume-rendering weights.
    Returns (R, n_importance) z values (unsorted).
    """
    weights = weights + eps  # avoid nans on empty rays
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.concatenate([jnp.zeros_like(pdf[:, :1]), jnp.cumsum(pdf, axis=-1)], axis=-1)

    r = bins.shape[0]
    if perturb:
        u = jax.random.uniform(key, (r, n_importance), dtype=bins.dtype)
    else:
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0 - 1e-6, n_importance,
                                          dtype=bins.dtype), (r, n_importance))

    # vectorized per-row searchsorted
    idx = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.clip(idx - 1, 0, cdf.shape[-1] - 1)
    above = jnp.clip(idx, 0, cdf.shape[-1] - 1)

    cdf_lo = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_hi = jnp.take_along_axis(cdf, above, axis=-1)
    bin_lo = jnp.take_along_axis(bins, jnp.clip(below, 0, bins.shape[-1] - 1), axis=-1)
    bin_hi = jnp.take_along_axis(bins, jnp.clip(above, 0, bins.shape[-1] - 1), axis=-1)

    denom = jnp.where(cdf_hi - cdf_lo < eps, 1.0, cdf_hi - cdf_lo)
    t = (u - cdf_lo) / denom
    return bin_lo + t * (bin_hi - bin_lo)


def cube_mask(xyz, bound=1.0):
    """Valid-sample mask: True where the point is strictly inside the
    [-bound, bound]^3 cube (sat_rendering.py:18-22)."""
    return jnp.all(jnp.abs(xyz) < bound, axis=-1)


def set_last_valid(delta, mask, value=1e10):
    """Set delta to ``value`` at the LAST valid sample of each ray.

    Reproduces the reference's `t_ends[last_pt_of_ray] = 1e10` mutation
    (eonerf.py:218-220): the final interval of every camera ray is treated
    as infinite so the ray's weights saturate at the last in-cube sample.
    Rays with no valid samples are untouched in effect (their density is
    masked to zero anyway).
    """
    k = mask.shape[-1]
    rev_argmax = jnp.argmax(mask[:, ::-1].astype(jnp.int32), axis=-1)
    last_idx = k - 1 - rev_argmax
    onehot = jax.nn.one_hot(last_idx, k, dtype=bool)
    return jnp.where(onehot, jnp.asarray(value, delta.dtype), delta)
