"""Vanilla NeRF radiance field (Blender/nerf_synthetic path).

Spec from the reference (radiance_fields/mlp.py:114-250): 8x256 skip trunk,
raw sigma head (ReLU applied at the field level), bottleneck + view-dir
conditioned 1x128 rgb branch with sigmoid. This powers the framework's
working replacement for the reference's broken `train_mlp_nerf.py` entry
point (SURVEY §2 #10).
"""

import flax.linen as nn
import jax.numpy as jnp

from eonerf_code_tpu.models.encoders import sinusoidal_encode
from eonerf_code_tpu.models.mlp import MLP


class VanillaNeRF(nn.Module):
    net_depth: int = 8
    net_width: int = 256
    skip_layer: int = 4
    net_depth_condition: int = 1
    net_width_condition: int = 128
    pos_enc_deg: int = 10
    view_enc_deg: int = 4
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        cd = self.compute_dtype
        self.trunk = MLP(net_depth=self.net_depth, net_width=self.net_width,
                         skip_layer=self.skip_layer, compute_dtype=cd, name="trunk")
        self.sigma_head = MLP(output_dim=1, net_depth=0, compute_dtype=cd, name="sigma_head")
        self.bottleneck = MLP(output_dim=self.net_width, net_depth=0, compute_dtype=cd,
                              name="bottleneck")
        self.rgb_mlp = MLP(output_dim=3, net_depth=self.net_depth_condition,
                           net_width=self.net_width_condition, skip_layer=None,
                           compute_dtype=cd, name="rgb_mlp")

    def density(self, x):
        pe = sinusoidal_encode(x, 0, self.pos_enc_deg)
        return nn.relu(self.sigma_head(self.trunk(pe))[..., 0])

    def __call__(self, x, viewdirs):
        """x: (..., 3) positions; viewdirs: broadcastable (..., 3).
        Returns (rgb in [0,1], sigma >= 0)."""
        pe = sinusoidal_encode(x, 0, self.pos_enc_deg)
        h = self.trunk(pe)
        sigma = nn.relu(self.sigma_head(h)[..., 0])
        cond = sinusoidal_encode(viewdirs, 0, self.view_enc_deg)
        cond = jnp.broadcast_to(cond, (*h.shape[:-1], cond.shape[-1]))
        rgb = nn.sigmoid(self.rgb_mlp(jnp.concatenate([self.bottleneck(h), cond], axis=-1)))
        return rgb, sigma
