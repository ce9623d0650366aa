"""Radiance-field models (flax) for the TPU-native EO-NeRF framework."""

from eonerf_code_tpu.models.encoders import sinusoidal_encode, sinusoidal_latent_dim
from eonerf_code_tpu.models.mlp import MLP
from eonerf_code_tpu.models.eonerf import EONerfField
from eonerf_code_tpu.models.vanilla import VanillaNeRF

__all__ = [
    "sinusoidal_encode",
    "sinusoidal_latent_dim",
    "MLP",
    "EONerfField",
    "VanillaNeRF",
]
