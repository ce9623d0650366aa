"""Sharded eval rendering: render_image_sharded fans the block loop out
over the ("scene","data") mesh and matches the single-device path exactly;
the eval CLI exposes it as --data_axis."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eonerf_code_tpu.data.rays import SatRays
from eonerf_code_tpu.models.eonerf import EONerfField
from eonerf_code_tpu.parallel.mesh import make_mesh
from eonerf_code_tpu.render.satellite import (RenderConfig, render_image,
                                              render_image_sharded)


def _rays(n, n_images=3, seed=0):
    rng = np.random.default_rng(seed)
    o = np.zeros((n, 3), np.float32)
    o[:, :2] = rng.uniform(-0.8, 0.8, (n, 2))
    o[:, 2] = 0.99
    d = np.tile(np.array([0.03, 0.01, -1.0], np.float32), (n, 1))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    sun = np.tile(np.array([0.25, 0.2, -0.95], np.float32), (n, 1))
    sun /= np.linalg.norm(sun, axis=1, keepdims=True)
    return SatRays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(sun),
                   jnp.asarray(rng.integers(0, n_images, n), jnp.int32),
                   jnp.zeros((n,), jnp.float32),
                   2.0 * jnp.ones((n,), jnp.float32))


@pytest.fixture(scope="module")
def field_and_params():
    field = EONerfField(n_images=3, net_depth=2, net_width=32)
    params = field.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 3)),
                        jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32),
                        method="init_all")
    return field, params


class TestShardedRender:
    def test_exact_parity_divisible(self, field_and_params):
        """Ray count divisible by chunk*n_data: same per-block keys, so the
        sharded output is bit-identical, perturb and all."""
        field, params = field_and_params
        mesh = make_mesh(n_data=8)
        cfg = RenderConfig(n_samples=8, sc_n_samples=8)
        rays = _rays(8 * 64)
        key = jax.random.PRNGKey(3)
        a = render_image(field, params, rays, key, cfg, shadows=True, chunk=64)
        b = render_image_sharded(field, params, rays, key, cfg, shadows=True,
                                 mesh=mesh, chunk=64)
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                          err_msg=k)

    def test_exact_parity_ragged_no_perturb(self, field_and_params):
        """Non-divisible ray count, perturb=False: no RNG consumed, so the
        padding difference cannot matter — still exact."""
        field, params = field_and_params
        mesh = make_mesh(n_data=8)
        cfg = RenderConfig(n_samples=8, sc_n_samples=8, perturb=False)
        rays = _rays(500)
        key = jax.random.PRNGKey(5)
        a = render_image(field, params, rays, key, cfg, shadows=True, chunk=64)
        b = render_image_sharded(field, params, rays, key, cfg, shadows=True,
                                 mesh=mesh, chunk=64)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                          err_msg=k)

    def test_depth_only(self, field_and_params):
        field, params = field_and_params
        mesh = make_mesh(n_data=4)
        cfg = RenderConfig(n_samples=8, sc_n_samples=8, perturb=False)
        rays = _rays(300)
        key = jax.random.PRNGKey(7)
        a = render_image(field, params, rays, key, cfg, shadows=False,
                         chunk=64, depth_only=True)
        b = render_image_sharded(field, params, rays, key, cfg, shadows=False,
                                 mesh=mesh, chunk=64, depth_only=True)
        np.testing.assert_array_equal(np.asarray(a["depth"]),
                                      np.asarray(b["depth"]))


def test_eval_cli_data_axis(tmp_path):
    """--data_axis 8 runs the DSM eval over the virtual mesh and lands at
    the same registered MAE as the single-device eval."""
    from eonerf_code_tpu.cli import eval_cli, main_train
    from eonerf_code_tpu.data.synthetic import SyntheticSceneSpec, generate_scene

    spec = SyntheticSceneSpec(n_views=3, n_test_views=1, img_size=32,
                              dsm_resolution=4.0, seed=9)
    scene = generate_scene(str(tmp_path / "scene"), spec)
    main_train([
        "--root_dir", scene["root_dir"], "--img_dir", scene["img_dir"],
        "--gt_dir", scene["gt_dir"], "--logs_dir", str(tmp_path / "logs"),
        "--exp_name", "ev", "--aoi_id", scene["aoi_id"],
        "--max_train_steps", "30", "--n_samples", "16", "--fc_layers", "2",
        "--fc_units", "32", "--batch_size", "128", "--chunk", "512",
        "--steps_per_call", "10", "--save_freq", "30", "--val_freq", str(10**9),
        "--cache_dir", str(tmp_path / "cache")])
    base = ["ev", "--logs_dir", str(tmp_path / "logs"),
            "--gt_dir", scene["gt_dir"], "--dsm", "--chunk", "512",
            "--dsm_resolution", "4.0"]
    single = eval_cli(base + ["--output_dir", str(tmp_path / "e1")])
    sharded = eval_cli(base + ["--output_dir", str(tmp_path / "e8"),
                               "--data_axis", "8"])
    assert np.isfinite(sharded["mae"])
    # perturbed sampling + different block padding -> not bit-identical,
    # but the registered MAE must agree to well under the GSD
    assert abs(sharded["mae"] - single["mae"]) < 0.3
