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
import os

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
                 bwd_acts="saved", interpret=None, perturb=True,
                 freq_reg_start_step=0, freq_reg_end_step=0,
                 sc_n_samples=0, rpc_correction=False, n_importance=0,
                 occ_enabled=False, occ_tighten=False,
                 occ_tighten_start_step=2000, occ_update_every=50,
                 n_grid=64, occ_max_cells=65536,
                 lr_decay_steps=None, lr_gamma=0.9):
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
                                 n_importance=n_importance,
                                 occ_tighten=occ_tighten,
                                 occ_tighten_shadows=occ_tighten,
                                 perturb=perturb)

        n_images = max(len(d.json_files) for d in datasets)
        self.field = EONerfField(n_images=n_images, net_depth=net_depth,
                                 net_width=net_width,
                                 rpc_correction=rpc_correction,
                                 compute_dtype=compute_dtype)
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
        # the single-AOI trainer's StepLR schedule (train/loop.py
        # make_lr_schedule): lr * gamma^(step // decay_every). Load-bearing
        # for shadow-phase geometric stability at production scale (STATUS
        # round-2: slow decay deforms geometry once shadows turn on).
        # Constant lr when lr_decay_steps is None (previous behavior). The
        # schedule count lives in opt_state, so pod resume keeps it.
        if lr_decay_steps:
            self._lr_fn = lambda step: lr * lr_gamma ** (step // lr_decay_steps)
        else:
            self._lr_fn = lambda step: lr
        self.optimizer = optax.adam(learning_rate=self._lr_fn)
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

        # ---- depth/shadow priors (single-AOI loss semantics, loop.py
        # make_loss_fn). Scenes may carry priors independently: one static
        # program serves the vmapped stack, so scenes WITHOUT a prior get
        # neutral sentinels that zero their term exactly — depth -1 (masked
        # invalid, metrics.depth_loss_l2), shadow 1.0 (all-lit: the
        # in-shadow set is empty), conf 10.0 (passes the >=4 SGM mask so
        # only the depth validity governs).
        self._has_depth = any(d.prior_depths is not None for d in datasets)
        self._has_conf = self._has_depth and any(
            d.prior_confs is not None for d in datasets)
        has_shadow_prior = any(d.prior_shadows is not None for d in datasets)
        if self._has_depth:
            self.data["depth_prior"] = jnp.stack([
                _pad(np.full((d.all_rays.shape[0],), -1.0, np.float32)
                     if d.prior_depths is None
                     else np.asarray(d.prior_depths, np.float32))
                for d in datasets])
            if self._has_conf:
                self.data["conf_prior"] = jnp.stack([
                    _pad(np.full((d.all_rays.shape[0],), 10.0, np.float32)
                         if d.prior_confs is None
                         else np.asarray(d.prior_confs, np.float32))
                    for d in datasets])
        if has_shadow_prior:
            self.data["shadow_prior"] = jnp.stack([
                _pad(np.ones((d.all_rays.shape[0],), np.float32)
                     if d.prior_shadows is None
                     else np.asarray(d.prior_shadows, np.float32))
                for d in datasets])
        self._has_shadow_prior = has_shadow_prior
        # reference depth-weight schedule: w = 100 * 0.8^epoch, epoch from
        # the SMALLEST scene's pool (consistent with the shadow gating rule
        # in train/multi.py)
        self._steps_per_epoch = max(
            int(min(d.all_rays.shape[0] for d in datasets)) // batch_size, 1)
        self.depth_weight, self.depth_weight_decay = 100.0, 0.8

        # shardings: leading scene axis over "scene"; rays over "data"
        self.scene_sharding = NamedSharding(mesh, P("scene"))
        self.params = jax.device_put(self.params, self.scene_sharding)
        self.opt_state = jax.device_put(self.opt_state, self.scene_sharding)
        self.data = {k: jax.device_put(v, NamedSharding(mesh, P("scene", "data")))
                     for k, v in self.data.items()}

        # ---- per-scene occupancy grids (stacked on the scene axis) ----
        # Feature parity with the single-AOI trainer's tightening sampler:
        # every scene gets its own EMA grid, updated in ONE vmapped jit and
        # sharded over "scene" like the params. The stability gate (see
        # occ_gate_open) is evaluated on the host over the per-scene
        # occupied-fraction histories and opens only when EVERY scene's grid
        # is stable — sampling mode is a single static branch shared by the
        # vmapped program, so the conservative all-scenes rule applies.
        from eonerf_code_tpu.ops.occupancy import OccupancyGrid

        self.occ_enabled = occ_enabled
        self.occ_tighten = occ_tighten
        self.occ_tighten_start_step = occ_tighten_start_step
        self.occ_update_every = occ_update_every
        self._occ_frac_hist = []   # list of (S,) occupied fractions
        self.occ_grids = None
        self._render_step_size = 2.0 / n_samples
        if occ_enabled:
            g0 = OccupancyGrid.create(n_grid)
            self.occ_grids = jax.tree_util.tree_map(
                lambda x: jax.device_put(jnp.stack([x] * self.n_scenes),
                                         self.scene_sharding), g0)
            base_field = self.field

            def _one_update(grid, p, k):
                return grid.update(
                    lambda x: base_field.apply(p, x, method="density"),
                    k, self._render_step_size, max_cells=occ_max_cells)

            self._occ_update = jax.jit(jax.vmap(_one_update))

        field, rcfg, optimizer = self.render_field, self.rcfg, self.optimizer
        self._freq_reg = (freq_reg_start_step, freq_reg_end_step)
        has_depth, has_conf = self._has_depth, self._has_conf
        has_shadow_p = self._has_shadow_prior

        def scene_loss(params, batch, key, pe_mask, w_depth, shadows,
                       occ_grid=None):
            # coarse-to-fine PE annealing, shared across scenes; all-ones
            # when freq_reg is off (bit-exact no-op, keeps one code path)
            from eonerf_code_tpu.models.freq_reg import mask_trunk_pe

            params = mask_trunk_pe(params, pe_mask)
            rays = satrays_from_tensor(batch["rays"], batch["ts"])
            out = render_rays(field, params, rays, key, rcfg, shadows,
                              occ_grid=occ_grid)
            loss, _ = M.uncertainty_aware_loss(batch["rgbs"], out["rgb"],
                                               out["beta"])
            # prior terms: single-AOI semantics (train/loop.py make_loss_fn);
            # scenes without a prior see neutral sentinels (see data setup)
            if has_depth:
                aux, _ = M.depth_loss_l2(
                    batch["depth_prior"], out["depth"][:, 0],
                    batch.get("conf_prior") if has_conf else None, w_depth)
                loss = loss + aux
            if has_shadow_p and shadows:  # epoch-2 gate (reference :155)
                aux, _ = M.shadow_loss_l2(batch["shadow_prior"],
                                          out["geo_shadows"][:, 0])
                loss = loss + aux
            return loss

        def _gather_batch(data, idx):
            return {k: jnp.take_along_axis(
                v, idx.reshape(self.n_scenes, -1, *([1] * (v.ndim - 2))), axis=1)
                for k, v in data.items()}

        if not use_pallas:
            def scene_step(params, opt_state, batch, key, pe_mask, w_depth,
                           occ_grid, shadows):
                loss, grads = jax.value_and_grad(scene_loss)(
                    params, batch, key, pe_mask, w_depth, shadows, occ_grid)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss

            @functools.partial(jax.jit, static_argnames=("shadows",),
                               donate_argnums=(0, 1))
            def multi_step(params, opt_state, data, idx, keys, pe_mask,
                           w_depth, shadows, occ_grid=None):
                batch = _gather_batch(data, idx)
                grid_ax = None if occ_grid is None else 0
                return jax.vmap(
                    scene_step,
                    in_axes=(0, 0, 0, 0, None, None, grid_ax, None))(
                    params, opt_state, batch, keys, pe_mask, w_depth,
                    occ_grid, shadows)
        else:
            def dp_scene_step(params, opt_state, batch, key, pe_mask, w_depth,
                              occ_grid, shadows):
                # standard DP inside the shard: grads over the local ray
                # chunk, pmean over "data", identical adam update on every
                # data shard (opt state replicated along data)
                loss, grads = jax.value_and_grad(scene_loss)(
                    params, batch, key, pe_mask, w_depth, shadows, occ_grid)
                grads = jax.tree_util.tree_map(
                    lambda g: jax.lax.pmean(g, "data"), grads)
                loss = jax.lax.pmean(loss, "data")
                updates, opt_state = optimizer.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss

            def shard_body(params, opt_state, batch, keys, pe_mask, w_depth,
                           occ_grid=None, *, shadows):
                grid_ax = None if occ_grid is None else 0
                return jax.vmap(
                    dp_scene_step,
                    in_axes=(0, 0, 0, 0, None, None, grid_ax, None))(
                    params, opt_state, batch, keys, pe_mask, w_depth,
                    occ_grid, shadows)

            @functools.lru_cache(maxsize=None)
            def _sharded(shadows, with_grid):
                # one shard_map per (shadows, grid) variant: the grid rides
                # the "scene" axis (each scene group holds its own grids,
                # replicated along "data" — queries happen in the XLA
                # sampling glue, not inside the Pallas kernels)
                in_specs = [P("scene"), P("scene"), P("scene", "data"),
                            P("scene"), P(), P()]
                if with_grid:
                    in_specs.append(P("scene"))
                return jax.shard_map(
                    functools.partial(shard_body, shadows=shadows),
                    mesh=mesh, in_specs=tuple(in_specs),
                    out_specs=(P("scene"), P("scene"), P("scene")),
                    check_vma=False)

            @functools.partial(jax.jit, static_argnames=("shadows",),
                               donate_argnums=(0, 1))
            def multi_step(params, opt_state, data, idx, keys, pe_mask,
                           w_depth, shadows, occ_grid=None):
                # the pool gather stays OUTSIDE shard_map: idx addresses the
                # whole per-scene pool, and GSPMD reshards the gathered
                # (S, B, ...) batch onto ("scene", "data") — a few hundred
                # KB of resharding per step vs keeping the exact uniform-
                # over-pool sampling semantics of the XLA path
                batch = _gather_batch(data, idx)
                args = (params, opt_state, batch, keys, pe_mask, w_depth)
                if occ_grid is not None:
                    return _sharded(shadows, True)(*args, occ_grid)
                return _sharded(shadows, False)(*args)

        self._multi_step = multi_step
        # RNG is a pure function of (seed, step): every step derives its
        # keys by fold_in(base, step) instead of threading a mutable key —
        # so a run resumed from a pod checkpoint replays the EXACT key
        # stream of an uninterrupted run (asserted bit-exact in
        # tests/test_multi_aoi_parity.py).
        self._base_key = jax.random.fold_in(key, 10_000)
        self.step = 0

    def lr_at(self, step):
        """The optimizer's actual learning rate at a step (for logging)."""
        return float(self._lr_fn(step))

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

    def _grids_stable(self, window=5, tol=0.05, tol_drift=0.025):
        """All-scenes version of the single-AOI stability gate
        (train/loop.py _occ_grid_stable): scatter + cumulative-drift bounds
        on EVERY scene's occupied-fraction history. One static sampling
        branch serves all vmapped scenes, so the gate opens only when the
        SLOWEST scene's grid has stabilized."""
        h = self._occ_frac_hist
        if len(h) < window:
            return False
        win = np.stack(h[-window:])          # (window, S)
        ref, first = win[-1], win[0]
        if np.any(ref <= 0) or np.any(first <= 0):
            return False
        scatter = np.max(np.abs(win - ref), axis=0) / ref
        drift = np.abs(ref - first) / first
        return bool(np.all(scatter < tol) and np.all(drift < tol_drift))

    def occ_gate_open(self, step=None):
        """True when tightened sampling is active: past the warmup step and
        every scene's grid stable (same semantics the single-AOI trainer
        persists in its occ_sampling.json sidecar)."""
        step = self.step if step is None else step
        return (self.occ_tighten and self.occ_grids is not None
                and step >= self.occ_tighten_start_step
                and self._grids_stable())

    def _maybe_update_grids(self):
        if self.occ_grids is None or self.step % self.occ_update_every != 0:
            return
        k = jax.random.fold_in(self._base_key, 2 * self.step + 1)
        keys = jax.random.split(k, self.n_scenes)
        self.occ_grids = self._occ_update(self.occ_grids, self.params, keys)
        if self.occ_tighten:
            self._occ_frac_hist.append(
                np.asarray(jnp.mean(self.occ_grids.binaries,
                                    axis=(1, 2, 3))))

    def train_steps(self, n_steps, shadows=False):
        """Run n_steps scene-parallel steps; returns per-scene losses of the
        last step."""
        losses = None
        n_scene = jnp.asarray(self.n_rays_per_scene)[:, None]
        for _ in range(n_steps):
            self._maybe_update_grids()
            k1, k2 = jax.random.split(
                jax.random.fold_in(self._base_key, 2 * self.step))
            # uniform over each scene's TRUE ray count (padding never
            # drawn). randint with a per-scene maxval is EXACT — a float32
            # uniform*n construction cannot address pools beyond 2^24 rays
            # (odd indices become unreachable near the top of the range)
            idx = jax.random.randint(k1, (self.n_scenes, self.batch_size),
                                     0, n_scene)
            keys = jax.random.split(k2, self.n_scenes)
            occ = self.occ_grids if self.occ_gate_open() else None
            # reference depth-prior weight schedule: 100 * 0.8^epoch
            # (train_eonerf.py:94,305-306); traced scalar, no new graphs
            w_depth = jnp.asarray(
                self.depth_weight * self.depth_weight_decay
                ** (self.step // self._steps_per_epoch), jnp.float32)
            self.params, self.opt_state, losses = self._multi_step(
                self.params, self.opt_state, self.data, idx, keys,
                self._pe_mask(self.step), w_depth, shadows, occ_grid=occ)
            self.step += 1
        return losses

    # ---- pod checkpointing (resume for the whole scene stack) ----
    #
    # The per-scene run dirs written by train_multi_aoi.py carry params-only
    # checkpoints in the single-AOI EVAL contract; resuming the pod needs
    # the stacked optimizer state and the gate history too, so those live in
    # ONE pod-level checkpoint (exp_dir/_pod/ckpts/epoch=<step>) in the same
    # orbax format the single-AOI trainer uses (train/loop.py save/restore).

    # Gate history rides the pod pytree as a fixed-size tail ring so the
    # checkpoint is self-contained without its sidecar (same rationale as
    # train/loop.py _gate_pytree; _grids_stable only observes the last
    # window=5 rows).
    GATE_HIST_LEN = 8

    def _gate_pytree(self):
        ring = np.full((self.GATE_HIST_LEN, self.n_scenes), np.nan,
                       np.float32)
        tail = self._occ_frac_hist[-self.GATE_HIST_LEN:]
        if tail:
            ring[-len(tail):] = np.stack(tail)
        return {"frac_hist": ring,
                "n_frac": np.int32(len(self._occ_frac_hist)),
                "tighten_active": np.int32(self.occ_gate_open())}

    def state_pytree(self):
        state = {"params": self.params, "opt_state": self.opt_state,
                 "step": self.step, "gate": self._gate_pytree()}
        if self.occ_grids is not None:
            state["occ"] = {"occs": self.occ_grids.occs,
                            "binaries": self.occ_grids.binaries}
        return state

    def save_pod(self, pod_dir):
        """Checkpoint the whole stacked training state under
        pod_dir/ckpts/epoch=<step>; returns the checkpoint path."""
        import json

        from eonerf_code_tpu.train import checkpoints as ckpt_lib

        path = ckpt_lib.save_checkpoint(pod_dir, self.step, self.state_pytree())
        # pod-level gate history is PER SCENE (list of (n_scenes,) rows) —
        # a different schema from the single-AOI occ_sampling.json, so it
        # lives under its own filename to keep the two contracts distinct
        with open(os.path.join(path, "pod_occ_sampling.json"), "w") as f:
            json.dump({"occ_frac_hist": [np.asarray(h).tolist()
                                         for h in self._occ_frac_hist],
                       "tighten_active": self.occ_gate_open()}, f)
        return path

    def restore_pod(self, path):
        """Restore a save_pod checkpoint: stacked params/opt/occ state back
        onto the mesh shardings, step counter, and the gate history sidecar.
        RNG keys are derived from (seed, step), so the resumed run replays
        an uninterrupted run's stream exactly."""
        import json

        from eonerf_code_tpu.train import checkpoints as ckpt_lib

        try:
            restored = ckpt_lib.restore_checkpoint(path, self.state_pytree())
        except Exception:
            # pre-gate pod checkpoint: retry with the old template shape
            tmpl = self.state_pytree()
            tmpl.pop("gate", None)
            restored = ckpt_lib.restore_checkpoint(path, tmpl)
        self.params = jax.device_put(restored["params"], self.scene_sharding)
        self.opt_state = jax.device_put(restored["opt_state"],
                                        self.scene_sharding)
        self.step = int(restored["step"])
        if self.occ_grids is not None and "occ" in restored:
            self.occ_grids = self.occ_grids.replace(
                occs=jax.device_put(restored["occ"]["occs"],
                                    self.scene_sharding),
                binaries=jax.device_put(restored["occ"]["binaries"],
                                        self.scene_sharding))
        sidecar = os.path.join(path, "pod_occ_sampling.json")
        if not os.path.exists(sidecar):
            # pre-rename pod checkpoints stored the same schema under the
            # single-AOI sidecar name
            sidecar = os.path.join(path, "occ_sampling.json")
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                side = json.load(f)
            self._occ_frac_hist = [np.asarray(h, np.float32)
                                   for h in side.get("occ_frac_hist", [])]
        elif "gate" in restored:
            # sidecar lost: reconstruct the gate tail from the checkpoint
            # ring — the gate (window 5) sees an identical tail
            ring = np.asarray(restored["gate"]["frac_hist"], np.float32)
            self._occ_frac_hist = [row for row in ring
                                   if not np.any(np.isnan(row))]

    def scene_params(self, i):
        return jax.tree_util.tree_map(lambda x: x[i], self.params)

    def scene_occ_state(self, i):
        """Per-scene occupancy arrays in the single-AOI checkpoint contract
        ({"occs", "binaries"}), or None when the grid is off."""
        if self.occ_grids is None:
            return None
        return {"occs": jax.device_get(self.occ_grids.occs[i]),
                "binaries": jax.device_get(self.occ_grids.binaries[i])}
