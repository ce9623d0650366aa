"""Multi-chip path of the fused Pallas kernels: shard_map over the data
axis (points sharded, weights replicated, weight grads psum'd). Verified
against the unsharded kernels on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from eonerf_code_tpu.models.eonerf import EONerfField
from eonerf_code_tpu.ops.pallas.fused_field import (
    make_fused_density,
    make_fused_field,
    pack_params,
)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), ("data",))


@pytest.fixture(scope="module")
def setup():
    field = EONerfField(n_images=6)
    params = field.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 3)),
                        jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32),
                        method="init_all")
    rng = np.random.default_rng(5)
    n = 64  # divisible by the 8-device axis
    pos = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    emb = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    return pack_params(params), pos, emb


def test_field_grads_match_unsharded(mesh, setup):
    w, pos, emb = setup
    kw = dict(compute_dtype=jnp.float32, tile=8, bwd_tile=8, interpret=True)
    fused = make_fused_field(**kw)
    fused_sh = make_fused_field(mesh=mesh, **kw)

    def loss(f):
        def fn(w, pos, emb):
            sigma, albedo, ts, tb = f(w, pos, emb)
            return jnp.sum(sigma * 0.1) + jnp.sum(albedo**2) + jnp.sum(ts + tb)
        return fn

    out = jax.jit(loss(fused_sh))(w, pos, emb)
    ref = loss(fused)(w, pos, emb)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-6)

    g = jax.jit(jax.grad(loss(fused_sh), argnums=(0, 1, 2)))(w, pos, emb)
    gr = jax.grad(loss(fused), argnums=(0, 1, 2))(w, pos, emb)
    for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_density_grads_match_unsharded(mesh, setup):
    w, pos, _ = setup
    kw = dict(compute_dtype=jnp.float32, tile=8, bwd_tile=8, interpret=True)
    dens = make_fused_density(**kw)
    dens_sh = make_fused_density(mesh=mesh, **kw)

    def loss(f):
        return lambda w, pos: jnp.sum(jnp.tanh(f(w, pos)))

    g = jax.jit(jax.grad(loss(dens_sh), argnums=(0, 1)))(w, pos)
    gr = jax.grad(loss(dens), argnums=(0, 1))(w, pos)
    for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
