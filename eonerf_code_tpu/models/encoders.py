"""Sinusoidal positional encoding (functional, fusion-friendly).

Matches the reference encoder exactly (radiance_fields/mlp.py:168-208):
frequencies 2^i for i in [min_deg, max_deg), degree-major layout, the full
latent is [identity | sin(x*2^i) | cos(x*2^i)] where the cosine block is
written as sin(xb + pi/2). The optional ``freq_mask`` reproduces the
frequency-regularization hook the reference allocates but leaves all-ones
(mlp.py:182,207).
"""

import numpy as np
import jax.numpy as jnp


def sinusoidal_latent_dim(x_dim, min_deg, max_deg, use_identity=True):
    return (int(use_identity) + (max_deg - min_deg) * 2) * x_dim


def sinusoidal_encode(x, min_deg, max_deg, use_identity=True, freq_mask=None):
    """Encode (..., x_dim) -> (..., latent_dim)."""
    if max_deg == min_deg:
        return x
    scales = jnp.asarray([2.0**i for i in range(min_deg, max_deg)], dtype=x.dtype)
    # (..., L, x_dim) -> (..., L*x_dim): degree-major, matching the reference
    xb = (x[..., None, :] * scales[:, None]).reshape(*x.shape[:-1], (max_deg - min_deg) * x.shape[-1])
    latent = jnp.sin(jnp.concatenate([xb, xb + 0.5 * np.pi], axis=-1))
    if use_identity:
        latent = jnp.concatenate([x, latent], axis=-1)
    if freq_mask is not None:
        latent = latent * freq_mask
    return latent
