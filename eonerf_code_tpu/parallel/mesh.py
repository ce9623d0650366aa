"""GSPMD data parallelism over the ray megabatch.

The reference has no parallelism of any kind (single GPU, SURVEY §2c). The
TPU-native scaling story is: shard the (N, 11) ray tensor and per-ray
targets across chips on a 1-D "data" mesh axis with NamedSharding; under
jit, XLA inserts the psum over ICI that averages gradients, and the tiny
MLP + embedding parameters stay replicated. A second "scene" axis is
reserved for multi-AOI batched training (independent scene models = a form
of expert parallelism over AOIs).

No hand-written collectives: pick a mesh, annotate shardings, let the
compiler place psum/all-gather on the interconnect.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data=None, n_scene=1, devices=None):
    """1-D or 2-D mesh: ("scene", "data"). Defaults to all visible devices
    on the data axis."""
    devices = devices if devices is not None else jax.devices()
    n_data = n_data or (len(devices) // n_scene)
    dev = np.asarray(devices[: n_data * n_scene]).reshape(n_scene, n_data)
    return Mesh(dev, ("scene", "data"))


def data_sharding(mesh, ndim=2):
    """Shard the leading (ray) axis over "data", replicate the rest."""
    spec = P("data", *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicate(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch):
    """Place every array in a batch dict with its leading axis sharded over
    the data axis (works for (N,), (N, C) and nested dicts)."""

    def place(x):
        return jax.device_put(x, data_sharding(mesh, ndim=np.ndim(x)))

    return jax.tree_util.tree_map(place, batch)
