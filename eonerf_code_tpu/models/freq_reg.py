"""Coarse-to-fine frequency regularization (BARF-style), in PARAMETER space.

The reference allocates a `freq_mask` hook on its encoder and leaves it
all-ones (radiance_fields/mlp.py:182,207 — never annealed). Here the hook is
implemented for real, as the literature prescribes for camera refinement
(BARF, Lin et al. 2021): high positional-encoding bands are eased in over
training so the photometric loss has a wide basin of attraction while the
per-image bundle-adjustment offsets (`--rpc_correction`) converge, then full
detail returns.

Instead of masking the encoder OUTPUT (which the fused Pallas kernels never
materialize — PE is built in-kernel), the mask is folded into the trunk
weights: trunk(pe * m) == trunk_with_masked_rows(pe), because the PE enters
the MLP only through layer 0 and the skip-concat layers. Masking those
kernel rows is algebraically identical for the XLA and Pallas backends, adds
one (latent, width) elementwise multiply per step, and keeps gradients
flowing to the RAW parameters (the mask is a constant per step).
"""

import jax.numpy as jnp


def mask_trunk_pe(params, freq_mask, trunk_name="trunk"):
    """Return a copy of `params` whose trunk kernels see a masked PE.

    Rows are matched by shape: a kernel whose input dim equals latent_dim
    (layer 0) is masked on all rows; a kernel whose input dim is
    width + latent_dim (the layer after a skip concat, layout
    [hidden | original input] — models/mlp.py) is masked on its LAST
    latent_dim rows. Other kernels and all biases pass through untouched.
    """
    latent = freq_mask.shape[-1]
    trunk = params["params"][trunk_name]
    w0 = trunk["hidden_0"]["kernel"]
    if w0.shape[0] != latent:
        raise ValueError(
            f"trunk layer 0 expects input dim {w0.shape[0]}, but the "
            f"frequency mask has {latent} entries — PE layout mismatch")
    width = w0.shape[1]
    new_trunk = {}
    for name, leaf in trunk.items():
        k = leaf["kernel"]
        if name == "hidden_0":
            k = k * freq_mask[:, None].astype(k.dtype)
        elif k.shape[0] == width + latent:
            # the layer after a skip concat: input layout [hidden | PE]
            m = jnp.concatenate([jnp.ones(width, k.dtype),
                                 freq_mask.astype(k.dtype)])
            k = k * m[:, None]
        new_trunk[name] = {**leaf, "kernel": k}
    return {**params,
            "params": {**params["params"], trunk_name: new_trunk}}
