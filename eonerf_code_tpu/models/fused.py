"""PallasField: drop-in field adapter dispatching the per-sample hot path
to the fused Pallas kernels.

Exposes the same duck-typed `.apply` surface the renderer uses
(render/satellite.py): full evaluation, `method="density"`,
`method="radiometric"`, `method="ray_offset"`. The per-ray ambient head and
the per-image embedding gathers stay on the flax/XLA path (they are
O(rays), not O(samples)); gradients to the transient embedding table flow
through the XLA gather wrapped around the kernel's per-point d_emb.
"""

import jax.numpy as jnp

from eonerf_code_tpu.ops.pallas.fused_field import (
    make_fused_density,
    make_fused_field,
    pack_params,
)


class PallasField:
    def __init__(self, field, tile=2048, bwd_tile=1024, interpret=False,
                 vmem_limit_mb=32, mesh=None, data_axis="data"):
        # defaults = the measured v5e optimum (scripts/scan_pallas_tiles.py);
        # bwd_tile=1024 needs the raised scoped-vmem limit. With `mesh` the
        # kernels shard_map over `data_axis` (weights replicated, weight
        # grads psum'd over ICI).
        self.field = field
        self.beta_min = field.beta_min
        self.rpc_correction = field.rpc_correction
        dtype = field.compute_dtype
        self._fused_field = make_fused_field(dtype, tile, bwd_tile, interpret,
                                             vmem_limit_mb=vmem_limit_mb,
                                             mesh=mesh, data_axis=data_axis)
        self._fused_density = make_fused_density(dtype, tile, bwd_tile, interpret,
                                                 vmem_limit_mb=vmem_limit_mb,
                                                 mesh=mesh, data_axis=data_axis)

    def apply(self, params, *args, method=None):
        if method in ("radiometric", "ray_offset", "ambient"):
            return self.field.apply(params, *args, method=method)
        w = pack_params(params)
        if method == "density":
            (pos,) = args
            shape = pos.shape[:-1]
            return self._fused_density(w, pos.reshape(-1, 3)).reshape(shape)
        pos, sun_d, img_idx = args
        r, k, _ = pos.shape
        emb_table = params["params"]["transient_encoder"]["embedding"]
        emb = jnp.broadcast_to(emb_table[img_idx][:, None, :],
                               (r, k, emb_table.shape[-1])).reshape(-1, emb_table.shape[-1])
        sigma, albedo, t_s, t_b = self._fused_field(w, pos.reshape(-1, 3), emb)
        ambient = self.field.apply(params, sun_d, method="ambient")
        return (sigma.reshape(r, k), albedo.reshape(r, k, 3), ambient,
                t_s.reshape(r, k, 1), t_b.reshape(r, k, 1))
