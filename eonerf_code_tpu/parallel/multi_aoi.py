"""Multi-AOI batched training: independent scene models at pod scale.

BASELINE.json configs[4] calls for "multi-AOI batched training, 1M-ray
megabatches ... at pod scale". The reference trains one AOI per process;
here S independent AOI scenes train in ONE jit program over a
("scene", "data") mesh:

- every AOI has its own EONerfField parameter set; parameters are STACKED
  on a leading scene axis and sharded over the "scene" mesh axis (a form of
  expert parallelism over independent MLPs — no cross-scene collectives);
- each scene's ray megabatch is sharded over the "data" axis; gradient
  psums ride ICI within each scene's data group;
- the train step is a vmap of the single-scene step over the scene axis,
  so XLA partitions it as S fully parallel programs.

Scenes may have different image counts; embedding tables are padded to the
max image count (unused rows receive zero gradient).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from eonerf_code_tpu.data.rays import satrays_from_tensor
from eonerf_code_tpu.models.eonerf import EONerfField
from eonerf_code_tpu.render.satellite import RenderConfig, render_rays
from eonerf_code_tpu.utils import metrics as M


def stack_params(params_list):
    """List of per-scene param pytrees -> one pytree with leading scene axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *params_list)


def unstack_params(stacked, n_scenes):
    return [jax.tree_util.tree_map(lambda x: x[i], stacked) for i in range(n_scenes)]


class MultiAOITrainer:
    """Minimal scene-parallel trainer over device-resident per-scene ray
    pools. Pools are PADDED to the largest scene's length so batches stack
    into a dense (S, B, ...) block; per-scene batch indices are drawn
    uniformly over each scene's TRUE ray count, so unequal scenes lose zero
    rays and padding rows are never sampled."""

    def __init__(self, datasets, mesh, cfg=None, n_samples=64, batch_size=1024,
                 lr=5e-4, net_depth=8, net_width=256, seed=42,
                 compute_dtype=jnp.float32, use_pallas=False,
                 bwd_acts="recompute", interpret=None, perturb=True,
                 freq_reg_start_step=0, freq_reg_end_step=0,
                 sc_n_samples=0):
        self.mesh = mesh
        self.n_scenes = len(datasets)
        assert mesh.shape["scene"] == self.n_scenes or mesh.shape["scene"] == 1 or \
            self.n_scenes % mesh.shape["scene"] == 0, \
            "scene count must tile the scene mesh axis"
        self.batch_size = batch_size
        # NB: on the pallas path the stratified jitter is drawn per DATA
        # shard (same per-scene key, local batch shape) — statistically
        # equivalent to the XLA path's global draw, but not bit-matching;
        # perturb=False makes both paths deterministic (midpoint samples)
        self.rcfg = RenderConfig(n_samples=n_samples,
                                 sc_n_samples=sc_n_samples or n_samples,
                                 perturb=perturb)

        n_images = max(len(d.json_files) for d in datasets)
        self.field = EONerfField(n_images=n_images, net_depth=net_depth,
                                 net_width=net_width, compute_dtype=compute_dtype)
        # production kernels: an opaque (vmapped) pallas call cannot be
        # GSPMD-partitioned over the scene axis, so the pallas variant runs
        # the step inside shard_map (see multi_step below) with PLAIN
        # kernels per shard — scenes vmapped locally, data-axis grads
        # pmean'd explicitly
        self.use_pallas = use_pallas
        self.render_field = self.field
        if use_pallas:
            assert net_depth == 8 and net_width == 256, \
                "fused kernels implement the reference 8x256 architecture"
            from eonerf_code_tpu.models.fused import PallasField

            if interpret is None:
                interpret = jax.default_backend() == "cpu"
            self.render_field = PallasField(
                self.field, interpret=interpret,
                save_acts=(bwd_acts == "saved"))
        key = jax.random.PRNGKey(seed)
        params_list = [
            self.field.init(jax.random.fold_in(key, i), jnp.zeros((2, 3, 3)),
                            jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32),
                            method="init_all")
            for i in range(self.n_scenes)
        ]
        self.params = stack_params(params_list)
        self.optimizer = optax.adam(lr)
        self.opt_state = jax.vmap(self.optimizer.init)(self.params)

        n_max = max(d.all_rays.shape[0] for d in datasets)
        self.n_rays_per_scene = np.array([d.all_rays.shape[0] for d in datasets],
                                         np.int32)
        self.n_rays = n_max  # padded pool length

        def _pad(x):
            x = np.asarray(x)
            if x.shape[0] == n_max:
                return jnp.asarray(x)
            # wrap-pad: the fill is real data but is NEVER sampled (indices
            # are drawn modulo the scene's true length)
            reps = -(-n_max // x.shape[0])
            return jnp.asarray(np.concatenate([x] * reps, axis=0)[:n_max])

        self.data = {
            "rays": jnp.stack([_pad(d.all_rays) for d in datasets]),
            "rgbs": jnp.stack([_pad(d.all_rgbs) for d in datasets]),
            "ts": jnp.stack([_pad(d.all_ids_img[:, 0].astype(np.int32))
                             for d in datasets]),
        }

        # shardings: leading scene axis over "scene"; rays over "data"
        self.scene_sharding = NamedSharding(mesh, P("scene"))
        self.params = jax.device_put(self.params, self.scene_sharding)
        self.opt_state = jax.device_put(self.opt_state, self.scene_sharding)
        self.data = {k: jax.device_put(v, NamedSharding(mesh, P("scene", "data")))
                     for k, v in self.data.items()}

        field, rcfg, optimizer = self.render_field, self.rcfg, self.optimizer
        self._freq_reg = (freq_reg_start_step, freq_reg_end_step)

        def scene_loss(params, batch, key, pe_mask, shadows):
            # coarse-to-fine PE annealing, shared across scenes; all-ones
            # when freq_reg is off (bit-exact no-op, keeps one code path)
            from eonerf_code_tpu.models.freq_reg import mask_trunk_pe

            params = mask_trunk_pe(params, pe_mask)
            rays = satrays_from_tensor(batch["rays"], batch["ts"])
            out = render_rays(field, params, rays, key, rcfg, shadows)
            loss, _ = M.uncertainty_aware_loss(batch["rgbs"], out["rgb"],
                                               out["beta"])
            return loss

        def scene_step(params, opt_state, batch, key, pe_mask, shadows):
            loss, grads = jax.value_and_grad(scene_loss)(params, batch, key,
                                                         pe_mask, shadows)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        def _gather_batch(data, idx):
            return {k: jnp.take_along_axis(
                v, idx.reshape(self.n_scenes, -1, *([1] * (v.ndim - 2))), axis=1)
                for k, v in data.items()}

        if not use_pallas:
            @functools.partial(jax.jit, static_argnames=("shadows",),
                               donate_argnums=(0, 1))
            def multi_step(params, opt_state, data, idx, keys, pe_mask, shadows):
                batch = _gather_batch(data, idx)
                return jax.vmap(scene_step, in_axes=(0, 0, 0, 0, None, None))(
                    params, opt_state, batch, keys, pe_mask, shadows)
        else:
            def dp_scene_step(params, opt_state, batch, key, pe_mask, shadows):
                # standard DP inside the shard: grads over the local ray
                # chunk, pmean over "data", identical adam update on every
                # data shard (opt state replicated along data)
                loss, grads = jax.value_and_grad(scene_loss)(params, batch,
                                                             key, pe_mask,
                                                             shadows)
                grads = jax.tree_util.tree_map(
                    lambda g: jax.lax.pmean(g, "data"), grads)
                loss = jax.lax.pmean(loss, "data")
                updates, opt_state = optimizer.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss

            def shard_body(params, opt_state, batch, keys, pe_mask, shadows):
                return jax.vmap(dp_scene_step,
                                in_axes=(0, 0, 0, 0, None, None))(
                    params, opt_state, batch, keys, pe_mask, shadows)

            sharded = jax.shard_map(
                functools.partial(shard_body, shadows=False),
                mesh=mesh,
                in_specs=(P("scene"), P("scene"), P("scene", "data"),
                          P("scene"), P()),
                out_specs=(P("scene"), P("scene"), P("scene")),
                check_vma=False)
            sharded_sh = jax.shard_map(
                functools.partial(shard_body, shadows=True),
                mesh=mesh,
                in_specs=(P("scene"), P("scene"), P("scene", "data"),
                          P("scene"), P()),
                out_specs=(P("scene"), P("scene"), P("scene")),
                check_vma=False)

            @functools.partial(jax.jit, static_argnames=("shadows",),
                               donate_argnums=(0, 1))
            def multi_step(params, opt_state, data, idx, keys, pe_mask, shadows):
                # the pool gather stays OUTSIDE shard_map: idx addresses the
                # whole per-scene pool, and GSPMD reshards the gathered
                # (S, B, ...) batch onto ("scene", "data") — a few hundred
                # KB of resharding per step vs keeping the exact uniform-
                # over-pool sampling semantics of the XLA path
                batch = _gather_batch(data, idx)
                step = sharded_sh if shadows else sharded
                return step(params, opt_state, batch, keys, pe_mask)

        self._multi_step = multi_step
        self._key = jax.random.fold_in(key, 10_000)
        self.step = 0

    def _pe_mask(self, step):
        """(latent,) coarse-to-fine mask for this step; all-ones when
        freq_reg is off (bit-exact no-op in scene_loss)."""
        from eonerf_code_tpu.models.encoders import (
            barf_alpha, barf_freq_mask, sinusoidal_latent_dim)

        deg = self.field.pos_enc_deg
        start, end = self._freq_reg
        if end <= 0:
            return jnp.ones(sinusoidal_latent_dim(3, 0, deg), jnp.float32)
        return barf_freq_mask(barf_alpha(step, start, end, deg), 3, 0, deg)

    def train_steps(self, n_steps, shadows=False):
        """Run n_steps scene-parallel steps; returns per-scene losses of the
        last step."""
        losses = None
        n_scene = jnp.asarray(self.n_rays_per_scene)[:, None]
        for _ in range(n_steps):
            self._key, k1, k2 = jax.random.split(self._key, 3)
            # uniform over each scene's TRUE ray count (padding never
            # drawn). randint with a per-scene maxval is EXACT — a float32
            # uniform*n construction cannot address pools beyond 2^24 rays
            # (odd indices become unreachable near the top of the range)
            idx = jax.random.randint(k1, (self.n_scenes, self.batch_size),
                                     0, n_scene)
            keys = jax.random.split(k2, self.n_scenes)
            self.params, self.opt_state, losses = self._multi_step(
                self.params, self.opt_state, self.data, idx, keys,
                self._pe_mask(self.step), shadows)
            self.step += 1
        return losses

    def scene_params(self, i):
        return jax.tree_util.tree_map(lambda x: x[i], self.params)
