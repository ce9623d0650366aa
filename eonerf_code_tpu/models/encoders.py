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


def barf_alpha(step, start_step, end_step, n_freqs):
    """Coarse-to-fine annealing progress (BARF, Lin et al. 2021): alpha
    ramps 0 -> n_freqs linearly over [start_step, end_step]."""
    t = (jnp.asarray(step, jnp.float32) - start_step) / max(end_step - start_step, 1)
    return jnp.clip(t, 0.0, 1.0) * n_freqs


def barf_freq_mask(alpha, x_dim, min_deg, max_deg, use_identity=True,
                   dtype=jnp.float32):
    """(latent_dim,) frequency-annealing mask for `sinusoidal_encode`'s
    layout [identity | sin (degree-major) | cos]. Band k in [0, L) gets
    weight 0.5*(1 - cos(pi*clip(alpha - k, 0, 1))): fully off above alpha,
    cosine-eased through the transition band, 1 below. Identity passes
    always. alpha may be a traced scalar (step-dependent under jit)."""
    L = max_deg - min_deg
    k = jnp.arange(L, dtype=jnp.float32)
    w = 0.5 * (1.0 - jnp.cos(jnp.pi * jnp.clip(alpha - k, 0.0, 1.0)))
    band = jnp.repeat(w, x_dim)                      # degree-major, x_dim each
    parts = ([jnp.ones(x_dim, jnp.float32)] if use_identity else []) + [band, band]
    return jnp.concatenate(parts).astype(dtype)
