"""D-NeRF: time-conditioned deformation NeRF.

Parity port of the reference's DNeRFRadianceField (radiance_fields/
mlp.py:253-288 — present in the reference model library but unused by any
entry point): a 4x64 warp MLP displaces each sample by a time-conditioned
offset before querying a vanilla NeRF."""

import flax.linen as nn
import jax.numpy as jnp

from eonerf_code_tpu.models.encoders import sinusoidal_encode
from eonerf_code_tpu.models.mlp import MLP
from eonerf_code_tpu.models.vanilla import VanillaNeRF


class DNeRF(nn.Module):
    warp_depth: int = 4
    warp_width: int = 64
    warp_skip: int = 2
    warp_enc_deg: int = 4
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.warp = MLP(output_dim=3, net_depth=self.warp_depth,
                        net_width=self.warp_width, skip_layer=self.warp_skip,
                        compute_dtype=self.compute_dtype, name="warp")
        self.nerf = VanillaNeRF(compute_dtype=self.compute_dtype, name="nerf")

    def _warped(self, x, t):
        pe_x = sinusoidal_encode(x, 0, self.warp_enc_deg)
        pe_t = sinusoidal_encode(t, 0, self.warp_enc_deg)
        pe_t = jnp.broadcast_to(pe_t, (*pe_x.shape[:-1], pe_t.shape[-1]))
        return x + self.warp(jnp.concatenate([pe_x, pe_t], axis=-1))

    def density(self, x, t):
        return self.nerf.density(self._warped(x, t))

    def __call__(self, x, t, viewdirs):
        """x: (..., 3), t: broadcastable (..., 1), viewdirs: (..., 3)."""
        return self.nerf(self._warped(x, t), viewdirs)
