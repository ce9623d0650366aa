"""Vanilla-NeRF training on nerf_synthetic (the fixed train_mlp_nerf path).

Mirrors the intended behavior of the reference's broken entry point
(train_mlp_nerf.py): occupancy-grid NeRF on a Blender subject, smooth-L1
loss, Adam + staged LR decay at 1/2, 3/4, 9/10 of training
(train_mlp_nerf.py:82-109,130-131). The reference's dynamic ray-batch
resizing toward a 2^16 sample budget (:174-183) trades batch size against
occupancy sparsity — that is jit-hostile (dynamic shapes), so here the ray
batch is fixed and the occupancy grid zeroes empty samples instead; the
effective-sample count is logged for the same visibility.
"""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from eonerf_code_tpu.data.nerf_synthetic import BlenderDataset
from eonerf_code_tpu.models.vanilla import VanillaNeRF
from eonerf_code_tpu.ops.occupancy import OccupancyGrid
from eonerf_code_tpu.render.blender import BlenderRenderConfig, render_blender_rays
from eonerf_code_tpu.utils import metrics as M
from eonerf_code_tpu.utils.tb import MetricsLogger


def train_vanilla(subject_id="lego", root_fp="data/nerf_synthetic", logs_dir="logs",
                  max_steps=50000, batch_size=4096, lr=5e-4, n_samples=129,
                  grid_resolution=64, occ_every=16, log_every=100, seed=42,
                  net_depth=8, net_width=256, train_split="train"):
    ds = BlenderDataset(subject_id, root_fp, split=train_split, num_rays=batch_size, seed=seed)
    model = VanillaNeRF(net_depth=net_depth, net_width=net_width)
    key = jax.random.PRNGKey(seed)
    params = model.init(key, jnp.zeros((2, 3, 3)), jnp.zeros((2, 1, 3)))

    schedule = optax.piecewise_constant_schedule(
        lr, {max_steps // 2: 0.33, max_steps * 3 // 4: 0.33, max_steps * 9 // 10: 0.33})
    optimizer = optax.adam(schedule)
    opt_state = optimizer.init(params)

    # occupancy over the reference's [-1.5, 1.5]^3 aabb (train_mlp_nerf.py:96)
    grid = OccupancyGrid(
        occs=jnp.zeros((grid_resolution**3,), jnp.float32),
        binaries=jnp.ones((grid_resolution,) * 3, dtype=bool),
        resolution=grid_resolution, aabb_min=-1.5, aabb_max=1.5)
    rcfg = BlenderRenderConfig(n_samples=n_samples)
    render_step = (rcfg.far - rcfg.near) / (n_samples - 1)

    @jax.jit
    def train_step(params, opt_state, grid, batch, key):
        def loss_fn(p):
            out = render_blender_rays(model, p, batch["rays_o"], batch["rays_d"],
                                      batch["color_bkgd"], key, rcfg, occ_grid=grid)
            loss = optax.huber_loss(out["rgb"], batch["pixels"], delta=1.0).mean()
            return loss, out
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, out["n_eff_samples"]

    occ_update = jax.jit(lambda g, p, k: g.update(
        lambda x: model.apply(p, x, method="density"), k, render_step))

    logger = MetricsLogger(os.path.join(logs_dir, f"vanilla_{subject_id}"))
    tic = time.time()
    for step in range(max_steps):
        key, k1, k2 = jax.random.split(key, 3)
        if step % occ_every == 0:
            grid = occ_update(grid, params, k2)
        batch = {k: jnp.asarray(v) for k, v in ds.sample_batch().items()}
        params, opt_state, loss, n_eff = train_step(params, opt_state, grid, batch, k1)
        if step % log_every == 0:
            logger.scalar("train/loss", float(loss), step)
            logger.scalar("train/n_eff_samples", float(n_eff), step)
            logger.scalar("perf/rays_per_sec",
                          batch_size * (step + 1) / (time.time() - tic), step)
    logger.flush()
    return {"params": params, "grid": grid, "model": model, "rcfg": rcfg,
            "dataset": ds, "elapsed_s": time.time() - tic}


def eval_psnr(result, split="test", root_fp="data/nerf_synthetic", subject_id="lego",
              n_images=None, chunk=8192):
    """Test-set PSNR for a trained vanilla model."""
    ds = BlenderDataset(subject_id, root_fp, split=split)
    model, params, grid, rcfg = (result["model"], result["params"],
                                 result["grid"], result["rcfg"])
    psnrs = []
    fn = jax.jit(functools.partial(render_blender_rays, model, params,
                                   cfg=rcfg, occ_grid=grid, train=False))
    for i in range(n_images or len(ds)):
        s = ds.full_image(i)
        outs = []
        n = s["rays_o"].shape[0]
        for j in range(0, n, chunk):
            out = fn(rays_o=jnp.asarray(s["rays_o"][j:j + chunk]),
                     rays_d=jnp.asarray(s["rays_d"][j:j + chunk]),
                     color_bkgd=jnp.asarray(s["color_bkgd"]),
                     key=jax.random.PRNGKey(0))
            outs.append(np.asarray(out["rgb"]))
        rgb = np.concatenate(outs, 0)
        psnrs.append(float(M.psnr(jnp.asarray(rgb), jnp.asarray(s["pixels"]))))
    return float(np.mean(psnrs))
