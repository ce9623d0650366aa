"""Sharding tests on the forced 8-device CPU mesh: a data-parallel train
step must produce the same updated parameters as the single-device step
(GSPMD grad psum correctness), and the ray pool must actually be sharded."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from eonerf_code_tpu.data.rays import satrays_from_tensor
from eonerf_code_tpu.models.eonerf import EONerfField
from eonerf_code_tpu.parallel.mesh import data_sharding, make_mesh, replicate, shard_batch
from eonerf_code_tpu.render.satellite import RenderConfig, render_rays
from eonerf_code_tpu.utils import metrics as M


def tiny_setup(rng, n_rays=64):
    field = EONerfField(n_images=2, net_depth=2, net_width=32)
    params = field.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 3)),
                        jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32), method="init_all")
    o = np.zeros((n_rays, 3), np.float32)
    o[:, 0] = rng.uniform(-0.5, 0.5, n_rays)
    o[:, 1] = rng.uniform(-0.5, 0.5, n_rays)
    o[:, 2] = 0.99
    d = np.tile(np.array([0, 0, -1.0], np.float32), (n_rays, 1))
    sun = np.tile(np.array([0.3, 0.1, -0.9], np.float32), (n_rays, 1))
    sun /= np.linalg.norm(sun, axis=1, keepdims=True)
    rays = np.hstack([o, d, np.zeros((n_rays, 1), np.float32),
                      2 * np.ones((n_rays, 1), np.float32), sun]).astype(np.float32)
    batch = {
        "rays": rays,
        "ts": np.zeros((n_rays,), np.int32),
        "rgbs": rng.random((n_rays, 3)).astype(np.float32),
    }
    return field, params, batch


def make_step(field, optimizer):
    cfg = RenderConfig(n_samples=16, sc_n_samples=16)

    def step(params, opt_state, batch, key):
        def loss_fn(p):
            rays = satrays_from_tensor(batch["rays"], batch["ts"])
            out = render_rays(field, p, rays, key, cfg, shadows=True)
            return M.mse(out["rgb"], batch["rgbs"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


class TestDataParallel:
    def test_requires_multiple_devices(self):
        assert jax.device_count() >= 8, "conftest must force 8 CPU devices"

    def test_sharded_step_matches_single_device(self, rng):
        field, params, batch = tiny_setup(rng)
        optimizer = optax.adam(1e-3)
        opt_state = optimizer.init(params)
        key = jax.random.PRNGKey(7)
        step = make_step(field, optimizer)

        # single device reference
        p1, _, loss1 = jax.jit(step)(params, opt_state, batch, key)

        # 8-way data parallel
        mesh = make_mesh()
        sharded_batch = shard_batch(mesh, batch)
        rep = replicate(mesh)
        params_r = jax.device_put(params, rep)
        opt_r = jax.device_put(opt_state, rep)
        with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
            p8, _, loss8 = jax.jit(step)(params_r, opt_r, sharded_batch, key)

        np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)

    def test_batch_is_actually_sharded(self, rng):
        _, _, batch = tiny_setup(rng, n_rays=64)
        mesh = make_mesh()
        sb = shard_batch(mesh, batch)
        shard_devs = {s.device for s in sb["rays"].addressable_shards}
        assert len(shard_devs) == 8
        assert sb["rays"].addressable_shards[0].data.shape[0] == 64 // 8

    def test_mesh_axes(self):
        mesh = make_mesh(n_data=4, n_scene=2)
        assert mesh.devices.shape == (2, 4)
        assert mesh.axis_names == ("scene", "data")
