"""EO-NeRF training loop, TPU-first.

Orchestration mirror of the reference entry point (train_eonerf.py) with the
data path redesigned for accelerators:

- the ENTIRE ray pool lives on device; each step gathers its batch by
  indices from a per-epoch device permutation (no host DataLoader, no
  host->device copies in the hot loop);
- the train step is one jitted program: gather -> render (camera + shadow
  passes) -> losses -> adam update, donated state;
- epoch-gated behavior (MSE -> beta loss at epoch 2, shadow pass from epoch
  2, depth-prior weight decay 0.8/epoch, lr decay 0.9/epoch) reproduces the
  reference schedule (train_eonerf.py:139-155,304-306);
- validation renders whole views with lax.map blocks and computes the
  registered DSM altitude MAE against lidar GT in-process;
- checkpoints carry {params, opt_state, occupancy grid, step, epoch} and
  training RESUME works (the reference's --ckpt_path was dead).

Multi-chip: pass `mesh` to shard the ray pool and every batch over the
"data" axis; gradients are averaged by GSPMD-inserted psums over ICI. The
embedding tables are tiny and stay replicated.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from eonerf_code_tpu.config import TrainConfig
from eonerf_code_tpu.data.rays import satrays_from_tensor
from eonerf_code_tpu.data.satellite import SatelliteDataset
from eonerf_code_tpu.models.eonerf import EONerfField
from eonerf_code_tpu.ops.occupancy import OccupancyGrid
from eonerf_code_tpu.ops.volrend import render_weights, weight_entropy
from eonerf_code_tpu.render.satellite import RenderConfig, render_image, render_rays
from eonerf_code_tpu.train import checkpoints as ckpt_lib
from eonerf_code_tpu.utils import metrics as M
from eonerf_code_tpu.utils.tb import MetricsLogger


def make_lr_schedule(cfg: TrainConfig, steps_per_epoch: int):
    """The reference's per-epoch StepLR(gamma) schedule, or a step-based
    variant when cfg.lr_decay_steps is set. Shared by the optimizer and the
    TB `lr` scalar so the logged curve is the optimizer's actual lr."""
    decay_every = cfg.lr_decay_steps or max(steps_per_epoch, 1)

    def lr_schedule(step):
        return cfg.lr * (cfg.lr_gamma_per_epoch ** (step // decay_every))

    return lr_schedule


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int):
    """Adam with the schedule from make_lr_schedule."""
    return optax.adam(learning_rate=make_lr_schedule(cfg, steps_per_epoch))


def make_loss_fn(field, rcfg: RenderConfig, has_depth=False, has_conf=False,
                 has_shadow=False):
    """Per-batch loss with the reference's schedule semantics
    (train_eonerf.py:139-155)."""

    def loss_fn(params, batch, key, w_depth, shadows, use_beta, occ_grid=None,
                pe_mask=None):
        if pe_mask is not None:
            # BARF-style coarse-to-fine: render through PE-masked trunk
            # weights; gradients flow to the RAW params (models/freq_reg.py)
            from eonerf_code_tpu.models.freq_reg import mask_trunk_pe

            params = mask_trunk_pe(params, pe_mask)
        rays = satrays_from_tensor(batch["rays"], batch["ts"])
        out = render_rays(field, params, rays, key, rcfg, shadows,
                          occ_grid=occ_grid)
        if use_beta:
            loss, loss_dict = M.uncertainty_aware_loss(
                batch["rgbs"], out["rgb"], out["beta"])
        else:
            loss = M.mse(out["rgb"], batch["rgbs"])
            loss_dict = {"loss": loss, "coarse_color": loss}
        if has_depth:
            aux, aux_d = M.depth_loss_l2(
                batch["depth_prior"], out["depth"][:, 0],
                batch.get("conf_prior") if has_conf else None, w_depth)
            loss = loss + aux
            loss_dict.update(aux_d)
        if has_shadow and shadows:  # start_epoch=2 (train_eonerf.py:155)
            aux, aux_d = M.shadow_loss_l2(batch["shadow_prior"], out["geo_shadows"][:, 0])
            loss = loss + aux
            loss_dict.update(aux_d)
        loss_dict["psnr"] = M.psnr(out["rgb"], batch["rgbs"])
        return loss, loss_dict

    return loss_fn


def make_train_step(field, optimizer, rcfg: RenderConfig, cfg: TrainConfig,
                    has_depth=False, has_conf=False, has_shadow=False):
    """Single jitted train step. `shadows`/`use_beta` are static — two graph
    variants over the training run (epochs <2 and >=2)."""
    loss_fn = make_loss_fn(field, rcfg, has_depth, has_conf, has_shadow)

    def step_fn(params, opt_state, batch, key, w_depth, shadows, use_beta,
                occ_grid=None, pe_mask=None):
        (loss, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, key, w_depth, shadows, use_beta, occ_grid, pe_mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_dict

    return jax.jit(step_fn, static_argnames=("shadows", "use_beta"),
                   donate_argnums=(0, 1))


def make_megastep(field, optimizer, rcfg: RenderConfig, cfg: TrainConfig,
                  has_depth=False, has_conf=False, has_shadow=False):
    """K train steps scanned inside ONE jit dispatch.

    TPU-native replacement for per-step host dispatch: the ray pool lives on
    device, the per-step batch indices arrive as a (K, B) block, and
    `lax.scan` chains K full train steps (render + losses + adam) without
    touching the host. This amortizes host/tunnel dispatch latency (tens of
    ms per call on remote-attached chips) across K steps.
    """
    loss_fn = make_loss_fn(field, rcfg, has_depth, has_conf, has_shadow)

    def mega_fn(params, opt_state, device_data, idx_block, keys, w_depth,
                shadows, use_beta, occ_grid=None, pe_masks=None):
        def body(carry, xs):
            params, opt_state = carry
            if pe_masks is None:
                (idx, key), m = xs, None
            else:
                idx, key, m = xs
            batch = {k: v[idx] for k, v in device_data.items()}
            (loss, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, key, w_depth, shadows, use_beta, occ_grid, m)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss_dict

        xs = ((idx_block, keys) if pe_masks is None
              else (idx_block, keys, pe_masks))
        (params, opt_state), loss_dicts = jax.lax.scan(
            body, (params, opt_state), xs)
        # surface the LAST step's scalars (cheap; full traces live in jsonl)
        last = jax.tree_util.tree_map(lambda x: x[-1], loss_dicts)
        return params, opt_state, last

    return jax.jit(mega_fn, static_argnames=("shadows", "use_beta"),
                   donate_argnums=(0, 1))


@jax.jit
def gather_batch(device_data, idx):
    """Index a fixed-size batch out of the on-device ray pool."""
    return {k: v[idx] for k, v in device_data.items()}


class Trainer:
    def __init__(self, cfg: TrainConfig, mesh=None):
        self.cfg = cfg
        if mesh is None and cfg.data_axis != 1:
            # user-facing multi-chip: --data_axis N builds the ("scene",
            # "data") mesh right here, so `python train_eonerf.py
            # --data_axis 8` is a sharded run with no programmatic setup
            from eonerf_code_tpu.parallel.mesh import make_mesh

            n = len(jax.devices()) if cfg.data_axis in (-1, 0) else cfg.data_axis
            if len(jax.devices()) < n:
                raise ValueError(
                    f"data_axis={n} but only {len(jax.devices())} devices "
                    "visible (for CPU testing set XLA_FLAGS="
                    f"--xla_force_host_platform_device_count={n})")
            mesh = make_mesh(n_data=n)
        self.mesh = mesh
        self.log_dir = cfg.log_dir()
        os.makedirs(self.log_dir, exist_ok=True)

        # ---- data ----
        self.train_ds = SatelliteDataset(
            cfg.root_dir, cfg.img_dir, split="train", img_downscale=cfg.img_downscale,
            utm=not cfg.ecef, cache_dir=cfg.cache_dir, prior_dsm_path=cfg.init_dsm_path,
            prior_conf_path=cfg.init_conf_path, shadow_masks_dir=cfg.shadow_masks_dir,
            subset=cfg.subset_n_views)
        self.val_ds = SatelliteDataset(
            cfg.root_dir, cfg.img_dir, split="val", img_downscale=cfg.img_downscale,
            utm=not cfg.ecef, cache_dir=cfg.cache_dir)
        self.n_rays = self.train_ds.all_rays.shape[0]
        self.n_images = len(self.train_ds.json_files)

        if cfg.rpc_correction and cfg.freq_reg_end_step <= 0:
            print("warning: --rpc_correction without --freq_reg_end_step — "
                  "joint camera refinement usually needs coarse-to-fine PE "
                  "annealing to converge (measured: offsets reach corr +0.99 "
                  "vs injected bias with annealing, +0.13 without)",
                  file=sys.stderr)

        # sampler selection happens BEFORE opts.json is written, so eval
        # reloads the RESOLVED sampling configuration, never re-guesses.
        # sc_n_samples resolves AFTER the sampler (hierarchical mode rewrites
        # n_samples, which the auto rule reads)
        self._resolve_sampler()
        cfg.sc_n_samples = cfg.resolve_sc_n_samples()
        cfg.save(os.path.join(self.log_dir, "opts.json"))
        self.logger = MetricsLogger(self.log_dir)

        self.steps_per_epoch = max(self.n_rays // cfg.batch_size, 1)
        self.val_freq = cfg.val_freq or self.steps_per_epoch  # reference :180
        self.save_freq = cfg.save_freq or self.val_freq * 4

        # ---- device-resident ray pool ----
        data = {
            "rays": self.train_ds.all_rays,
            "rgbs": self.train_ds.all_rgbs.astype(np.float32),
            "ts": self.train_ds.all_ids_img[:, 0].astype(np.int32),
        }
        if self.train_ds.prior_depths is not None:
            data["depth_prior"] = self.train_ds.prior_depths
            if self.train_ds.prior_confs is not None:
                data["conf_prior"] = self.train_ds.prior_confs
        if self.train_ds.prior_shadows is not None:
            data["shadow_prior"] = self.train_ds.prior_shadows
        if mesh is not None:
            # multi-chip: ray pool sharded over the "data" axis; gathers of a
            # replicated index vector produce data-sharded batches and GSPMD
            # inserts the gradient psum over ICI
            from eonerf_code_tpu.parallel.mesh import shard_batch

            self.device_data = shard_batch(mesh, data)
        else:
            self.device_data = {k: jnp.asarray(v) for k, v in data.items()}

        # ---- model / optimizer ----
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.field = EONerfField(
            n_images=self.n_images,
            net_depth=cfg.net_depth, net_width=cfg.net_width,
            radiometric_normalization=cfg.radiometric_normalization,
            rpc_correction=cfg.rpc_correction,
            compute_dtype=dtype)
        key = jax.random.PRNGKey(cfg.seed)
        self.params = self.field.init(
            key, jnp.zeros((2, 3, 3)), jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32),
            method="init_all")
        self.lr_schedule = make_lr_schedule(cfg, self.steps_per_epoch)
        self.optimizer = make_optimizer(cfg, self.steps_per_epoch)
        self.opt_state = self.optimizer.init(self.params)
        if mesh is not None:
            from eonerf_code_tpu.parallel.mesh import replicate

            rep = replicate(mesh)
            self.params = jax.device_put(self.params, rep)
            self.opt_state = jax.device_put(self.opt_state, rep)

        self.occ_grid = OccupancyGrid.create(cfg.n_grid) if cfg.occ_enabled else None
        self.render_step_size = 2.0 / cfg.n_samples
        tighten_sc = cfg.resolved_occ_tighten_shadows()
        self.rcfg = RenderConfig(n_samples=cfg.n_samples,
                                 sc_n_samples=cfg.resolve_sc_n_samples(),
                                 n_importance=cfg.n_importance,
                                 occ_tighten=cfg.occ_tighten,
                                 occ_tighten_shadows=tighten_sc,
                                 occ_explore_frac=cfg.occ_explore_frac)
        # validation/eval renders don't explore (deterministic given key)
        import dataclasses as _dc

        self.rcfg_eval = _dc.replace(self.rcfg, occ_explore_frac=0.0)

        # backend selection is shared with eval (eval/run.py) so train-time
        # validation and eval always render through the same field backend
        from eonerf_code_tpu.models.fused import make_render_field

        render_field = make_render_field(self.field, cfg, mesh=mesh)
        self.render_field = render_field
        prior_flags = dict(has_depth="depth_prior" in data,
                           has_conf="conf_prior" in data,
                           has_shadow="shadow_prior" in data)
        self.train_step = make_train_step(
            render_field, self.optimizer, self.rcfg, cfg, **prior_flags)
        self.megastep = make_megastep(
            render_field, self.optimizer, self.rcfg, cfg, **prior_flags)

        self._occ_update = jax.jit(
            lambda grid, params, k: grid.update(
                lambda x: self.field.apply(params, x, method="density"),
                k, self.render_step_size,
                max_cells=cfg.occ_max_cells)) if self.occ_grid is not None else None

        self.step = 0
        self.epoch = 0
        self.best_val_mae = float("inf")
        # occupied-fraction history for the tightening stability gate (one
        # host scalar per grid update). PERSISTED as a checkpoint sidecar
        # (occ_sampling.json) so a resumed run samples exactly as an
        # uninterrupted one would — no re-arming window after restore.
        self._occ_frac_hist = []
        # weight-entropy history for the geometry-quality gate (same
        # cadence + sidecar); lazily-built jitted probe
        self._entropy_hist = []
        self._entropy_probe = None
        if cfg.ckpt_path:
            self.restore(cfg.ckpt_path)

    # ---- sampler selection ----

    def _resolve_sampler(self):
        """Resolve cfg.sampler into concrete sampling flags, in place.

        Explicit flags always win (occ_tighten / n_importance set by the
        user or by reloaded opts.json). `auto` picks from the scene's
        altitude envelope (data/satellite.py alt_envelope): occupancy
        tightening is A/B-validated on compact envelopes (0.33 m at ~1.5x
        speed at 34 m) but reproducibly DIVERGES on wide ones (22-30 m at
        222 m: the grid<->sampler feedback amplifies floaters while the
        geometry is unresolved — STATUS.md round-2 finding), where
        hierarchical sampling is the validated tool (2.28 m).

        The resolved values are written back into cfg BEFORE opts.json is
        saved, so eval and resume reload concrete flags and never re-guess.
        """
        cfg = self.cfg
        if cfg.occ_tighten or cfg.n_importance > 0 or cfg.sampler == "uniform":
            mode = ("tighten" if cfg.occ_tighten else
                    "hierarchical" if cfg.n_importance > 0 else "uniform")
            cfg.sampler = mode
            return mode
        mode = cfg.sampler
        if mode == "auto":
            lo, hi = self.train_ds.alt_envelope()
            if (hi - lo) <= cfg.occ_tighten_max_envelope_m:
                # compact: tightening when the grid exists, else the plain
                # uniform sampler (the validated compact baseline)
                mode = "tighten" if cfg.occ_enabled else "uniform"
            else:
                mode = "hierarchical"
        if mode == "tighten":
            if not cfg.occ_enabled:
                mode = "uniform"  # tightening needs the grid
            else:
                cfg.occ_tighten = True
        elif mode == "hierarchical":
            # the validated wide-envelope configuration shape: 3/4 coarse
            # samples + half-of-coarse importance samples (48+24 at n=64;
            # explicit --n_importance, e.g. the imp48+32 A/B arm, wins
            # above and skips this reshape)
            cfg.n_samples = max((3 * cfg.n_samples) // 4, 8)
            cfg.n_importance = max(cfg.n_samples // 2, 4)
        elif mode != "uniform":
            raise ValueError(f"unknown sampler mode {mode!r}")
        cfg.sampler = mode
        return mode

    # ---- checkpointing ----

    # Tightening-gate state rides the checkpoint pytree as a fixed-size
    # tail ring so a checkpoint is SELF-CONTAINED: a second process (or a
    # resume after the sidecar file was lost) reconstructs the exact
    # sampling behavior from the checkpoint alone. Only the tail matters —
    # _occ_grid_stable looks at the last `window`=5 entries and _entropy_ok
    # at the latest probe — so an 8-slot ring plus the true count loses
    # nothing the gate can observe. The occ_sampling.json sidecar (full
    # history, human-readable) stays authoritative when present.
    GATE_HIST_LEN = 8

    def _gate_pytree(self):
        import numpy as _np

        def ring(h):
            a = _np.full(self.GATE_HIST_LEN, _np.nan, _np.float32)
            tail = h[-self.GATE_HIST_LEN:]
            if tail:
                a[-len(tail):] = tail
            return a

        return {"frac_hist": ring(self._occ_frac_hist),
                "entropy_hist": ring(self._entropy_hist),
                "n_frac": _np.int32(len(self._occ_frac_hist)),
                "tighten_active":
                    _np.int32(self._occ_for_sampling() is not None)}

    @staticmethod
    def _gate_ring_to_list(ring):
        import numpy as _np

        a = _np.asarray(ring, dtype=_np.float32)
        return [float(x) for x in a[~_np.isnan(a)]]

    def _state_pytree(self):
        state = {"params": self.params, "opt_state": self.opt_state,
                 "step": self.step, "epoch": self.epoch,
                 "gate": self._gate_pytree()}
        if self.occ_grid is not None:
            state["occ"] = {"occs": self.occ_grid.occs, "binaries": self.occ_grid.binaries}
        return state

    def save(self, epoch_tag=None):
        path = ckpt_lib.save_checkpoint(
            self.log_dir, self.epoch if epoch_tag is None else epoch_tag,
            self._state_pytree())
        # sidecar: tightening-gate state, so (a) resume samples exactly as an
        # uninterrupted run (no re-arming window) and (b) eval knows whether
        # tightening was ACTIVE at this checkpoint (eval/run.py load_occ_grid)
        import json as _json

        with open(os.path.join(path, "occ_sampling.json"), "w") as f:
            _json.dump({"frac_hist": self._occ_frac_hist,
                        "entropy_hist": self._entropy_hist,
                        "tighten_active": self._occ_for_sampling() is not None},
                       f)
        return path

    def restore(self, path):
        try:
            restored = ckpt_lib.restore_checkpoint(path, self._state_pytree())
        except Exception:
            # pre-gate checkpoint (saved before the gate rode the pytree):
            # retry with the old template shape; the sidecar below still
            # carries the gate state for those runs
            tmpl = self._state_pytree()
            tmpl.pop("gate", None)
            restored = ckpt_lib.restore_checkpoint(path, tmpl)
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.step = int(restored["step"])
        self.epoch = int(restored["epoch"])
        if self.occ_grid is not None and "occ" in restored:
            self.occ_grid = self.occ_grid.replace(
                occs=restored["occ"]["occs"], binaries=restored["occ"]["binaries"])
        sidecar = os.path.join(path, "occ_sampling.json")
        if os.path.exists(sidecar):
            import json as _json

            with open(sidecar) as f:
                side = _json.load(f)
            self._occ_frac_hist = [float(x) for x in side.get("frac_hist", [])]
            self._entropy_hist = [float(x)
                                  for x in side.get("entropy_hist", [])]
        elif "gate" in restored:
            # sidecar lost: reconstruct the gate tail from the checkpoint
            # ring — identical sampling decisions (the gate only observes
            # the tail; see _gate_pytree)
            self._occ_frac_hist = self._gate_ring_to_list(
                restored["gate"]["frac_hist"])
            self._entropy_hist = self._gate_ring_to_list(
                restored["gate"]["entropy_hist"])

    # ---- training ----

    def epoch_flags(self, epoch, step=None):
        cfg = self.cfg
        step = self.step if step is None else step
        if cfg.first_shadow_step is not None:
            shadows = bool(cfg.geometric_shadows and step >= cfg.first_shadow_step)
        else:
            shadows = bool(cfg.geometric_shadows and epoch >= cfg.first_shadow_epoch)
        if cfg.first_beta_step is not None:
            use_beta = bool(step >= cfg.first_beta_step)
        else:
            use_beta = bool(epoch >= cfg.first_beta_epoch)
        return shadows, use_beta

    def _block_size(self, step, steps_left_epoch, steps_left_total):
        """Largest scan block starting at `step` that keeps every schedule
        event (occ update, val, save) on its exact reference step."""
        cfg = self.cfg
        k = min(cfg.steps_per_call, steps_left_epoch, steps_left_total)
        # occ updates run BEFORE the step at multiples of occ_update_every
        if self._occ_update is not None:
            k = min(k, cfg.occ_update_every - step % cfg.occ_update_every)
        # val/save fire AFTER the step at positive multiples of their freq;
        # the block may contain an event step only as its LAST step
        for freq in (self.val_freq, self.save_freq):
            r = step % freq
            nxt = step if (r == 0 and step > 0) else step + (freq - r)
            k = min(k, nxt - step + 1)
        # step-based loss-gate transitions may not happen mid-block
        occ_gate = (cfg.occ_tighten_start_step
                    if (cfg.occ_tighten and self.occ_grid is not None) else None)
        for gate in (cfg.first_shadow_step, cfg.first_beta_step, occ_gate):
            if gate is not None and step < gate:
                k = min(k, gate - step)
        return max(k, 1)

    def _pe_mask_block(self, step0, k):
        """(k, latent) coarse-to-fine PE masks for steps [step0, step0+k),
        or None when frequency regularization is off (cfg.freq_reg_end_step
        <= 0). Past the ramp the mask is all-ones — same graph, exact
        full-bandwidth math."""
        cfg = self.cfg
        if cfg.freq_reg_end_step <= 0:
            return None
        from eonerf_code_tpu.models.encoders import barf_alpha, barf_freq_mask

        deg = self.field.pos_enc_deg
        alphas = barf_alpha(jnp.arange(step0, step0 + k),
                            cfg.freq_reg_start_step, cfg.freq_reg_end_step, deg)
        return jax.vmap(lambda a: barf_freq_mask(a, 3, 0, deg))(alphas)

    def _reg_params(self, step=None):
        """Params as EVERY consumer must see them at `step` (default: the
        current step): PE-masked while the coarse-to-fine ramp is active.
        The masked high-frequency trunk rows receive zero gradient and sit
        at random init, so reading the RAW params mid-ramp (occ-grid
        updates, validation renders, entropy probe) would mix trained
        low-frequency structure with untrained noise."""
        cfg = self.cfg
        step = self.step if step is None else step
        if cfg.freq_reg_end_step <= 0 or step >= cfg.freq_reg_end_step:
            return self.params
        from eonerf_code_tpu.models.encoders import barf_alpha, barf_freq_mask
        from eonerf_code_tpu.models.freq_reg import mask_trunk_pe

        deg = self.field.pos_enc_deg
        mask = barf_freq_mask(
            barf_alpha(step, cfg.freq_reg_start_step, cfg.freq_reg_end_step,
                       deg), 3, 0, deg)
        return mask_trunk_pe(self.params, mask)

    def _occ_grid_stable(self, window=5, tol=0.05, tol_drift=0.025):
        """True once the occupied fraction has stopped moving. A fixed
        step-count warmup is NOT sufficient: on wide-envelope (IARPA-like)
        scenes the grid at step 2000 is still wrong, and tightening onto it
        locks training out of the recovery the uniform sampler achieves
        (tall-scene A/B: 23-26 m MAE vs 2.5-3.2 m). Two conditions:

        - scatter: every entry of the last `window` within tol of the latest;
        - cumulative drift: |h[-1] - h[-window]| / h[-window] < tol_drift —
          a slow MONOTONIC drift (~1%/update) stays under the scatter
          tolerance while the grid is still moving; update noise cancels in
          the window-end difference, drift does not."""
        h = self._occ_frac_hist
        if len(h) < window:
            return False
        ref = h[-1]
        first = h[-window]
        if ref <= 0 or first <= 0:
            return False
        return (max(abs(x - ref) for x in h[-window:]) / ref < tol
                and abs(ref - first) / first < tol_drift)

    def _weight_entropy(self):
        """Mean normalized weight entropy over OPAQUE probe rays — the
        geometry-quality signal behind the entropy gate. A fixed strided
        subset of the training rays is density-rendered with uniform
        sampling (the probe must not depend on the grid it is gating) and
        the weight distribution's entropy is averaged over rays that hit
        anything; 1.0 (worst) when nothing is opaque yet. Cost: one
        2048-ray density pass per occupancy update."""
        if self._entropy_probe is None:
            import numpy as _np

            k = int(min(self.cfg.n_samples, 64))
            n = int(min(2048, self.n_rays))
            idx = _np.linspace(0, self.n_rays - 1, num=n).astype(_np.int64)
            rays = jnp.asarray(_np.asarray(self.train_ds.all_rays)[idx])
            field = self.render_field

            def probe(params):
                o, d = rays[:, 0:3], rays[:, 3:6]
                near, far = rays[:, 6], rays[:, 7]
                tm = (jnp.arange(k, dtype=jnp.float32) + 0.5) / k
                z = near[:, None] + (far - near)[:, None] * tm[None, :]
                delta = jnp.broadcast_to((far - near)[:, None] / k, z.shape)
                pos = o[:, None, :] + d[:, None, :] * z[..., None]
                sigma = field.apply(params, pos, method="density")
                w, _, _ = render_weights(sigma, delta)
                opacity = jnp.sum(w, axis=-1)
                h = weight_entropy(w)
                opaque = (opacity > 0.5).astype(jnp.float32)
                n_op = jnp.sum(opaque)
                return jnp.where(n_op > 0,
                                 jnp.sum(h * opaque) / jnp.maximum(n_op, 1.0),
                                 1.0)

            self._entropy_probe = jax.jit(probe)
        return float(self._entropy_probe(self._reg_params()))

    def _entropy_ok(self):
        """True when the entropy gate is disabled or the latest probe shows
        surface-like weight distributions. The occupied-fraction gate can
        pass on a STABLE-BUT-WRONG grid (wide-envelope divergence,
        STATUS.md round 2); weight entropy distinguishes resolved geometry
        from stabilized floaters."""
        if self.cfg.occ_entropy_max is None:
            return True
        return bool(self._entropy_hist) and (
            self._entropy_hist[-1] <= self.cfg.occ_entropy_max)

    def _occ_for_sampling(self, step=None):
        """The grid handed to the sampler: None until tightening is enabled,
        past the warmup step AND the grid has stabilized (fallback-by-
        construction before that) AND the entropy gate (if configured)
        confirms resolved geometry."""
        step = self.step if step is None else step
        if (self.cfg.occ_tighten and self.occ_grid is not None
                and step >= self.cfg.occ_tighten_start_step
                and self._entropy_ok()
                and self._occ_grid_stable()):
            return self.occ_grid
        return None

    def run(self, max_steps=None, log_every=50):
        """Train to max_steps. A checkpoint is saved even when the loop dies
        mid-flight (resume via ckpt_path then continues from it)."""
        try:
            return self._run(max_steps, log_every)
        except BaseException:
            if self.step > 0:
                try:
                    self.save()
                    self.logger.flush()
                except Exception:
                    pass
            raise

    def _run(self, max_steps=None, log_every=50):
        cfg = self.cfg
        max_steps = max_steps or cfg.max_train_steps
        key = jax.random.PRNGKey(cfg.seed)
        tic = time.time()
        rays_done = 0
        w_depth = cfg.depth_weight * (cfg.depth_weight_decay ** self.epoch)
        next_log = self.step

        while self.step < max_steps:
            key, pkey = jax.random.split(key)
            perm = jax.random.permutation(pkey, self.n_rays)

            i = 0
            while i < self.steps_per_epoch and self.step < max_steps:
                shadows, use_beta = self.epoch_flags(self.epoch, self.step)
                if (self._occ_update is not None
                        and self.step % cfg.occ_update_every == 0):
                    key, okey = jax.random.split(key)
                    self.occ_grid = self._occ_update(self.occ_grid,
                                                     self._reg_params(), okey)
                    if cfg.occ_tighten:
                        self._occ_frac_hist.append(
                            float(jnp.mean(self.occ_grid.binaries)))
                        if cfg.occ_entropy_max is not None:
                            h = self._weight_entropy()
                            self._entropy_hist.append(h)
                            self.logger.scalar("occ/weight_entropy", h,
                                               self.step)

                k = self._block_size(self.step, self.steps_per_epoch - i,
                                     max_steps - self.step)
                idx_block = jax.lax.dynamic_slice_in_dim(
                    perm, i * cfg.batch_size, k * cfg.batch_size
                ).reshape(k, cfg.batch_size)
                key, skey = jax.random.split(key)
                keys = jax.random.split(skey, k)
                self.params, self.opt_state, loss_dict = self.megastep(
                    self.params, self.opt_state, self.device_data, idx_block,
                    keys, jnp.float32(w_depth), shadows, use_beta,
                    self._occ_for_sampling(), self._pe_mask_block(self.step, k))
                rays_done += k * cfg.batch_size
                i += k
                self.step += k
                done_step = self.step - 1  # index of the last executed step

                if done_step >= next_log:
                    ld = {kk: float(v) for kk, v in loss_dict.items()}
                    self.logger.scalars(
                        {kk: v for kk, v in ld.items() if kk != "psnr"}, done_step, "train/")
                    self.logger.scalar("train/psnr", ld["psnr"], done_step)
                    self.logger.scalar("lr", float(self.lr_schedule(done_step)), done_step)
                    self.logger.scalar("epoch", self.epoch, done_step)
                    if cfg.freq_reg_end_step > 0:
                        from eonerf_code_tpu.models.encoders import barf_alpha

                        self.logger.scalar(
                            "train/pe_alpha",
                            float(barf_alpha(done_step, cfg.freq_reg_start_step,
                                             cfg.freq_reg_end_step,
                                             self.field.pos_enc_deg)),
                            done_step)
                    dt = time.time() - tic
                    if dt > 0 and done_step > 0:
                        self.logger.scalar("perf/rays_per_sec", rays_done / dt, done_step)
                    next_log = done_step + log_every

                if done_step > 0 and done_step % self.save_freq == 0:
                    self.save()
                if done_step > 0 and done_step % self.val_freq == 0:
                    self.validate()

            self.epoch += 1
            w_depth *= cfg.depth_weight_decay

        self.save()
        self.logger.flush()
        elapsed = time.time() - tic
        return {"steps": self.step, "epochs": self.epoch, "elapsed_s": elapsed,
                "rays_per_sec": rays_done / max(elapsed, 1e-9)}

    # ---- validation ----

    def render_view(self, sample, shadows=None, key=None, depth_only=False):
        shadows = self.epoch_flags(self.epoch)[0] if shadows is None else shadows
        key = key or jax.random.PRNGKey(0)
        rays = satrays_from_tensor(jnp.asarray(sample["rays"]), jnp.asarray(sample["ts"]))
        return render_image(self.render_field, self._reg_params(), rays, key, self.rcfg_eval,
                            shadows=shadows, chunk=self.cfg.chunk, depth_only=depth_only,
                            occ_grid=self._occ_for_sampling())

    def validate(self):
        cfg = self.cfg
        n = min(cfg.n_val_images, self.val_ds.num_val_images())
        agg = {"loss": [], "coarse_color": [], "coarse_logbeta": [], "psnr": [], "mae": []}
        for i in range(n):
            sample = self.val_ds.get_val_sample(i)
            out = self.render_view(sample)
            rgbs = jnp.asarray(sample["rgbs"])
            loss, ld = M.uncertainty_aware_loss(rgbs, out["rgb"], out["beta"])
            psnr_ = M.psnr(out["rgb"], rgbs)
            if i <= 1:
                # reference-style gt/pred/albedo/shadows/depth panel
                # (train_eonerf.py:235-249)
                from eonerf_code_tpu.utils.viz import visualize_depth

                h, w = sample["h"], sample["w"]
                panel = [np.asarray(sample["rgbs"]).reshape(h, w, 3),
                         np.asarray(out["rgb"]).reshape(h, w, 3),
                         np.asarray(out["albedo_rgb"]).reshape(h, w, 3),
                         np.asarray(out["geo_shadows"]).reshape(h, w),
                         visualize_depth(np.asarray(out["depth"]).reshape(h, w))]
                tag = "train_0/gt_pred_depth" if i == 0 else "val_0/gt_pred_depth"
                self.logger.image_panel(tag, panel, self.step)
            if i > 0:
                # val loss/psnr are logged regardless of lidar GT
                # (train_eonerf.py:199 logs them unconditionally); only the
                # DSM MAE needs gt_dir
                for k in ("loss", "coarse_color", "coarse_logbeta"):
                    agg[k].append(float(ld[k]))
                agg["psnr"].append(float(psnr_))
                if cfg.gt_dir is not None:
                    try:
                        mae = self._val_mae(sample, out)
                        agg["mae"].append(mae)
                    except Exception:  # MAE is best-effort during training
                        self.logger.scalar("val/mae_failed", 1.0, self.step)
        for k, v in agg.items():
            if v:
                self.logger.scalar(f"val/{k}", float(np.mean(v)), self.step)
        # track the best-geometry model: late-stage shadow/uncertainty
        # training can degrade the DSM (see STATUS.md), so the best-val-MAE
        # checkpoint is the one to evaluate
        if agg["mae"] and float(np.mean(agg["mae"])) < self.best_val_mae:
            self.best_val_mae = float(np.mean(agg["mae"]))
            self.save(epoch_tag="best")
            self.logger.scalar("val/best_mae", self.best_val_mae, self.step)
        self.logger.flush()

    def _gt_grid_local(self):
        """GT DSM as a device array over its ROI grid in LOCAL scene coords
        (water-masked), cached. Returns (gt (H,W), xoff_l, yoff_top_l, res)."""
        if getattr(self, "_gt_grid", None) is not None:
            return self._gt_grid
        import numpy as np

        from eonerf_code_tpu.io.geotiff import GeoTiffFile

        cfg = self.cfg
        aoi = cfg.aoi_id
        gt_path = os.path.join(cfg.gt_dir, f"{aoi}_DSM.tif")
        f = GeoTiffFile(gt_path)
        gt = f.read(1).astype(np.float32)
        if f.nodata is not None and not np.isnan(f.nodata):
            gt = np.where(gt == f.nodata, np.nan, gt)
        cls_path = os.path.join(cfg.gt_dir, f"{aoi}_CLS.tif")
        if os.path.exists(cls_path):
            from eonerf_code_tpu.eval.dsm import _load_water_mask

            water = _load_water_mask(cls_path)
            h_ = min(water.shape[0], gt.shape[0])
            w_ = min(water.shape[1], gt.shape[1])
            gt[:h_, :w_] = np.where(water[:h_, :w_], np.nan, gt[:h_, :w_])
        if self.cfg.ecef:
            # ECEF cube: the local frame origin is the scene center's UTM
            # coordinates, and cube deltas map through the exact-Jacobian
            # linear frame (eval/device.py ecef_to_utm_frame)
            from eonerf_code_tpu.eval.device import ecef_to_utm_frame

            zs = self.train_ds.scene.utm_zonestring
            zone = int("".join(c for c in zs if c.isdigit()))
            south = "".join(c for c in zs if c.isalpha()).upper() < "N"
            J, (e0, n0, alt0) = ecef_to_utm_frame(
                self.train_ds.scene.scene_offset, zone, south)
            self._ecef_frame = (jnp.asarray(J, jnp.float32), float(alt0))
            off_e, off_n = e0, n0
        else:
            off = self.train_ds.scene.scene_offset
            off_e, off_n = off[0], off[1]
        self._gt_grid = (jnp.asarray(gt),
                         float(f.bounds.left - off_e),
                         float(f.bounds.top - off_n),
                         float(f.res[0]))
        return self._gt_grid

    def val_mae_device(self, sample, out):
        """Registered DSM MAE fully on device: denormalize depth in the
        local frame, splat onto the GT grid, register + MAE in one jit
        (eval/device.py). No GeoTIFFs, no host round trips."""
        from eonerf_code_tpu.eval.device import device_dsm_mae, rasterize_local

        gt, xoff_l, ytop_l, res = self._gt_grid_local()
        rays = jnp.asarray(sample["rays"], jnp.float32)
        depth = jnp.asarray(out["depth"], jnp.float32).reshape(-1, 1)
        scale = jnp.asarray(self.train_ds.scene.scene_scale, jnp.float32)
        xyz_l = (rays[:, 0:3] + rays[:, 3:6] * depth) * scale  # local meters
        if self.cfg.ecef:
            # cube deltas are local ECEF meters (offset == scene center);
            # map to (easting, northing, altitude) through the exact
            # Jacobian frame (curvature bound: see ecef_to_utm_frame)
            J, alt0 = self._ecef_frame
            enu = xyz_l @ J.T
            easts_l, norths_l, alts = enu[:, 0], enu[:, 1], alt0 + enu[:, 2]
        else:
            easts_l, norths_l = xyz_l[:, 0], xyz_l[:, 1]
            alts = xyz_l[:, 2] + float(self.train_ds.scene.scene_offset[2])
        pred = rasterize_local(easts_l, norths_l, alts,
                               xoff_l, ytop_l, res, gt.shape[1], gt.shape[0])
        mae, _ = device_dsm_mae(pred, gt)
        return float(mae)

    def _val_mae(self, sample, out):
        """In-training validation MAE. Default (device_eval=None) is the
        DEVICE path — BASELINE.json's north star asks eval to never leave
        the TPU, and it is ~4.5x faster (0.51 s vs 2.3 s measured, MAE
        2.002 vs 2.005 m cross-checked) — with a host fallback on any
        failure (missing/odd GT raster, shape mismatch). device_eval=True
        forces device and surfaces failures; False forces host."""
        if self.cfg.device_eval is False:
            return self._val_mae_host(sample, out)
        # ECEF cubes ride the same device path through the exact-Jacobian
        # local frame (val_mae_device); the curvature residual is mm-to-cm
        # at real scene extents and the host fallback stays the exact
        # reference (cross-checked in tests/test_real_metadata.py).
        try:
            return self.val_mae_device(sample, out)
        except Exception:
            if self.cfg.device_eval:  # explicitly requested: surface it
                raise
            self.logger.scalar("val/device_eval_fallback", 1.0, self.step)
            return self._val_mae_host(sample, out)

    def _val_mae_host(self, sample, out):
        from eonerf_code_tpu.eval.dsm import compute_mae_and_save_dsm_diff

        cfg = self.cfg
        aoi_id = cfg.aoi_id or sample["src_id"][:7]
        res = 0.5 if "JAX" in aoi_id else 0.3
        if cfg.aoi_id and not ("JAX" in aoi_id or "IARPA" in aoi_id):
            # synthetic/other AOIs: resolution from the GT raster
            from eonerf_code_tpu.io.geotiff import GeoTiffFile

            res = GeoTiffFile(os.path.join(cfg.gt_dir, f"{aoi_id}_DSM.tif")).res[0]
        tmp = os.path.join(self.log_dir, "val", f"tmp_dsm_{self.step}.tif")
        self.train_ds.dsm_from_depth(sample["rays"], np.asarray(out["depth"]),
                                     dsm_path=tmp, resolution=res)
        mae = compute_mae_and_save_dsm_diff(tmp, sample["src_id"], cfg.gt_dir,
                                            os.path.join(self.log_dir, "val"),
                                            self.epoch, aoi_id, save=False)
        os.remove(tmp)
        return mae


def train(cfg: TrainConfig):
    return Trainer(cfg).run()
