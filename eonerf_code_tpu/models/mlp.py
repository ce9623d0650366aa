"""Skip-connection MLP, the shared building block of all radiance fields.

Behavioral spec from the reference (radiance_fields/mlp.py:14-111): ReLU
hidden layers, Xavier-uniform kernels, zero biases, and an input skip that
concatenates the ORIGINAL input after the activation of every layer i with
i % skip_layer == 0 and i > 0. ``net_depth=0`` degenerates to a single dense
layer (the reference's DenseLayer).

The module optionally computes in a reduced dtype (bfloat16) while keeping
parameters in float32 — the standard TPU mixed-precision recipe.
"""

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp


class MLP(nn.Module):
    output_dim: Optional[int] = None
    net_depth: int = 8
    net_width: int = 256
    skip_layer: Optional[int] = 4
    hidden_activation: Callable = nn.relu
    output_activation: Optional[Callable] = None
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dense = lambda feat, name: nn.Dense(  # noqa: E731
            feat,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            name=name,
        )
        inputs = x.astype(self.compute_dtype)
        x = inputs
        for i in range(self.net_depth):
            x = dense(self.net_width, f"hidden_{i}")(x)
            x = self.hidden_activation(x)
            if self.skip_layer is not None and i % self.skip_layer == 0 and i > 0:
                x = jnp.concatenate([x, inputs], axis=-1)
        if self.output_dim is not None:
            x = dense(self.output_dim, "output")(x)
            if self.output_activation is not None:
                x = self.output_activation(x)
        return x
