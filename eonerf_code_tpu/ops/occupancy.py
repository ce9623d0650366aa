"""Binary occupancy grid over the [-1, 1]^3 scene cube.

TPU-native equivalent of nerfacc's `OccGridEstimator` (reference:
train_eonerf.py:74,112-119): a dense float occupancy buffer with EMA-max
updates from jittered density probes, thresholded into a binary grid.
XLA-friendly: the grid is a plain array pytree; updates are one fused jit.

The reference updates the grid every 50 steps but never uses it for
sampling (its occupancy-based sampler is commented out at every call site —
sat_rendering.py:92,234,257). We keep the same default: the grid is
maintained (and checkpointed) and can optionally gate density as an
empty-space mask, but the production sampler is fixed-count uniform.
"""

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class OccupancyGrid:
    occs: Any  # (res^3,) float32 EMA occupancy
    binaries: Any  # (res, res, res) bool
    resolution: int = flax.struct.field(pytree_node=False)
    aabb_min: float = flax.struct.field(pytree_node=False, default=-1.0)
    aabb_max: float = flax.struct.field(pytree_node=False, default=1.0)

    @classmethod
    def create(cls, resolution=128):
        return cls(
            occs=jnp.zeros((resolution**3,), jnp.float32),
            binaries=jnp.zeros((resolution,) * 3, dtype=bool),
            resolution=resolution,
        )

    def cell_size(self):
        return (self.aabb_max - self.aabb_min) / self.resolution

    def update(self, density_fn, key, render_step_size, ema_decay=0.95,
               occ_thre=1e-2, max_cells=None):
        """One occupancy update (nerfacc semantics: EMA-max + mean-clamped
        threshold). ``density_fn`` maps (N, 3) -> (N,) sigma.

        ``max_cells`` (static) probes a random cell subset per update —
        nerfacc's post-warmup behavior; the full grid costs res^3 density
        queries (2.1M at 128^3), which dwarfs a training step.
        """
        res = self.resolution
        n = res**3
        kc, ku = jax.random.split(key)
        if max_cells is not None and max_cells < n:
            idx = jax.random.randint(kc, (max_cells,), 0, n)
        else:
            idx = jnp.arange(n)
        ijk = jnp.stack([idx // (res * res), (idx // res) % res, idx % res], axis=-1)
        u = jax.random.uniform(ku, (idx.shape[0], 3), dtype=jnp.float32)
        cs = self.cell_size()
        xyz = self.aabb_min + (ijk.astype(jnp.float32) + u) * cs
        occ = density_fn(xyz) * render_step_size  # opacity ~ sigma * step (eonerf.py:147-152)
        new_vals = jnp.maximum(self.occs[idx] * ema_decay, occ)
        occs = self.occs.at[idx].set(new_vals)
        thre = jnp.minimum(jnp.mean(occs), occ_thre)
        binaries = (occs > thre).reshape(res, res, res)
        return self.replace(occs=occs, binaries=binaries)

    def query(self, xyz):
        """True where xyz falls in an occupied cell. (..., 3) -> (...)."""
        res = self.resolution
        cs = self.cell_size()
        ijk = jnp.clip(((xyz - self.aabb_min) / cs).astype(jnp.int32), 0, res - 1)
        return self.binaries[ijk[..., 0], ijk[..., 1], ijk[..., 2]]

    def ray_span(self, origins, dirs, near, far, n_probes=64, margin=2.0):
        """Per-ray tightened sample range [t_lo, t_hi] covering the occupied
        cells along each ray (the grid exploitation the reference leaves on
        the table — its sampler ignores the grid it maintains,
        train_eonerf.py:112-119 / sat_rendering.py:234,257).

        Static-shape ray walk: ``n_probes`` fixed query points per ray on
        [near, far]; the span is [first occupied, last occupied] expanded by
        ``margin`` probe spacings (conservative against grid discretization).
        Rays that hit no occupied cell fall back to the full [near, far].

        origins/dirs: (R, 3); near/far: (R,). Returns (t_lo, t_hi), each (R,).
        """
        near = near.reshape(-1)
        far = jnp.broadcast_to(jnp.asarray(far, near.dtype), near.shape).reshape(-1)
        dt = (far - near) / n_probes
        ts = near[:, None] + (jnp.arange(n_probes, dtype=near.dtype) + 0.5) * dt[:, None]
        pos = origins[:, None, :] + dirs[:, None, :] * ts[..., None]
        inside = jnp.all((pos > self.aabb_min) & (pos < self.aabb_max), axis=-1)
        occ = self.query(pos) & inside
        any_occ = jnp.any(occ, axis=-1)
        t_lo = jnp.min(jnp.where(occ, ts, jnp.inf), axis=-1) - margin * dt
        t_hi = jnp.max(jnp.where(occ, ts, -jnp.inf), axis=-1) + margin * dt
        t_lo = jnp.where(any_occ, jnp.maximum(t_lo, near), near)
        t_hi = jnp.where(any_occ, jnp.minimum(t_hi, far), far)
        return t_lo, t_hi
