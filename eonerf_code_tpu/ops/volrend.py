"""Volume rendering over dense (rays, samples) blocks.

Replaces nerfacc's CUDA kernels (`render_weight_from_density`,
`render_transmittance_from_density`, `accumulate_along_rays` — reference:
radiance_fields/eonerf.py:229-242, sat_rendering.py:106-116) with fully
fusable XLA expressions: exclusive-cumsum transmittance and plain masked
reductions. Invalid (out-of-cube) samples carry zero density, which makes
the dense math exactly equal to the reference's point-removal scheme.
"""

import jax.numpy as jnp


def _exclusive_cumsum(x):
    """Shifted cumulative sum: out_i = sum_{j<i} x_j.

    Implemented by shifting (NOT as cumsum(x) - x, which catastrophically
    cancels in float32 when the sequence contains the 1e10 infinite-delta
    sentinel of the camera pass).
    """
    return jnp.concatenate([jnp.zeros_like(x[..., :1]), jnp.cumsum(x[..., :-1], axis=-1)], axis=-1)


def render_weights(sigma, delta, mask=None):
    """Compute (weights, transmittance, alphas), each (R, K).

    T_i = exp(-sum_{j<i} sigma_j * delta_j)   [exclusive]
    alpha_i = 1 - exp(-sigma_i * delta_i)
    w_i = T_i * alpha_i

    This is nerfacc's formulation (exp of a cumulative sum), which is more
    stable than a cumprod of (1 - alpha).
    """
    if mask is not None:
        sigma = jnp.where(mask, sigma, 0.0)
    sdelta = sigma * delta
    trans = jnp.exp(-_exclusive_cumsum(sdelta))
    alphas = 1.0 - jnp.exp(-sdelta)
    return trans * alphas, trans, alphas


def exit_transmittance(sigma, delta, mask=None):
    """Transmittance at the last valid sample of each ray, (R,).

    The geometric sun-visibility readout (sat_rendering.py:106-116): the
    reference takes the EXCLUSIVE transmittance at the final in-cube sample
    of each shadow ray. Rays with no valid samples return 1 (fully lit),
    matching the reference's ones-initialized geo_shadow buffer
    (sat_rendering.py:115-116).
    """
    if mask is None:
        mask = jnp.ones(sigma.shape, dtype=bool)
    sigma = jnp.where(mask, sigma, 0.0)
    sdelta = sigma * delta
    k = mask.shape[-1]
    last_idx = k - 1 - jnp.argmax(mask[:, ::-1].astype(jnp.int32), axis=-1)
    excl = _exclusive_cumsum(sdelta)
    return jnp.exp(-jnp.take_along_axis(excl, last_idx[:, None], axis=-1)[:, 0])


def ray_entropy(alphas, mask=None, eps=1e-10):
    """InfoNeRF per-ray opacity entropy (reference: eonerf.py:56-67,
    `entropy_from_alphas` — computed but disabled at :245-246).

    p_i = alpha_i / sum(alpha); H = -sum p_i log10(p_i + eps). Returns (R,).
    """
    if mask is not None:
        alphas = jnp.where(mask, alphas, 0.0)
    total = jnp.sum(alphas, axis=-1, keepdims=True) + eps
    probs = alphas / total
    return -jnp.sum(probs * jnp.log10(probs + eps), axis=-1)


def weight_entropy(weights, eps=1e-10):
    """Per-ray entropy of the NORMALIZED compositing weights, scaled to
    [0, 1] by log(K): ~0 when the ray's mass concentrates on one surface
    sample (resolved geometry), ~1 when it is spread uniformly (unresolved
    geometry or floaters). Used by the occupancy-tightening entropy gate
    (train/loop.py): the occupied FRACTION of a grid can be stable while
    the geometry it encodes is wrong, but the weight distribution along
    rays cannot look surface-like unless geometry has actually resolved.

    weights: (R, K). Returns (R,) in [0, 1]."""
    k = weights.shape[-1]
    total = jnp.sum(weights, axis=-1, keepdims=True) + eps
    p = weights / total
    return -jnp.sum(p * jnp.log(p + eps), axis=-1) / jnp.log(float(k))


def accumulate(weights, values=None):
    """Weighted reduction along samples.

    weights: (R, K). values: (R, K, C) or (R, K) or None (-> opacity).
    Returns (R, C) or (R,).
    """
    if values is None:
        return jnp.sum(weights, axis=-1)
    if values.ndim == weights.ndim:
        return jnp.sum(weights * values, axis=-1)
    return jnp.sum(weights[..., None] * values, axis=-2)
