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


def make_render_field(field, cfg, mesh=None):
    """The ONE place backend selection lives: returns the field the renderer
    should evaluate through for this config — the raw flax field, or
    PallasField wrapping it. Trainer (train/loop.py) and eval (eval/run.py)
    both call this, so train-time validation renders and eval renders always
    go through the SAME backend.

    cfg.use_pallas None = auto: fused kernels ON for bfloat16 on the TPU
    backend with the reference 8x256 architecture (batch-flat 81k vs
    anti-scaling 63k rays/s on v5e); on CPU the kernels run in interpret
    mode only when explicitly requested (use_pallas=True) — e.g. the
    virtual-mesh tests and the multichip dryrun.
    """
    import jax

    if cfg.use_pallas is None:
        # rpc_correction composes: the learned per-image ray offsets enter
        # the kernels through the origin columns of rayin, and their
        # gradient returns through d_rayin[:, 0:3] (parity-tested in
        # tests/test_fused_render.py::test_render_rays_fused_bundle_adjust_gradients)
        use_pallas = (cfg.compute_dtype == "bfloat16"
                      and jax.default_backend() == "tpu"
                      and cfg.net_depth == 8 and cfg.net_width == 256)
    else:
        use_pallas = cfg.use_pallas
    if not use_pallas:
        return field
    quant = {"int8": True, "int8_full": "full"}.get(
        getattr(cfg, "trunk_quant", "none"), False)
    save_acts = getattr(cfg, "bwd_acts", "recompute") == "saved"
    if quant and save_acts:
        # the saved-activations stream is bf16/f32-only (the int8 kernels
        # were measured slower and never grew a saved path); the bwd_acts
        # default is "saved", so an int8 experiment must not crash — fall
        # back to the recompute backward it was measured with
        print("trunk_quant=int8: bwd_acts=saved unsupported, "
              "falling back to recompute", flush=True)
        save_acts = False
    return PallasField(field, mesh=mesh,
                       interpret=jax.default_backend() == "cpu",
                       trunk_quant=quant,
                       save_acts=save_acts)


class PallasField:
    def __init__(self, field, tile=2048, bwd_tile=1024, interpret=False,
                 vmem_limit_mb=32, mesh=None, data_axis="data",
                 trunk_quant=False, save_acts=False,
                 save_acts_cap_mb=8192):
        # defaults = the measured v5e optimum (scripts/scan_pallas_tiles.py);
        # bwd_tile=1024 needs the raised scoped-vmem limit. With `mesh` the
        # kernels shard_map over `data_axis` (weights replicated, weight
        # grads psum'd over ICI).
        self.field = field
        self.mesh = mesh
        self.beta_min = field.beta_min
        self.rpc_correction = field.rpc_correction
        self.n_images = field.n_images
        dtype = field.compute_dtype
        self._fused_field = make_fused_field(dtype, tile, bwd_tile, interpret,
                                             vmem_limit_mb=vmem_limit_mb,
                                             mesh=mesh, data_axis=data_axis)
        self._fused_density = make_fused_density(dtype, tile, bwd_tile, interpret,
                                                 vmem_limit_mb=vmem_limit_mb,
                                                 mesh=mesh, data_axis=data_axis)
        # v3 fused render ops: field + volume compositing in one kernel with
        # per-ray I/O (ops/pallas/fused_render.py); render_rays dispatches
        # to them via supports_fused_render
        from eonerf_code_tpu.ops.pallas.fused_render import (
            make_fused_camera,
            make_fused_coarse,
            make_fused_shadow,
        )

        self.fused_camera = make_fused_camera(
            dtype, tile_target=tile, bwd_tile_target=bwd_tile,
            interpret=interpret, vmem_limit_mb=max(vmem_limit_mb or 0, 64),
            mesh=mesh, data_axis=data_axis, trunk_quant=trunk_quant,
            save_acts=save_acts, save_acts_cap_mb=save_acts_cap_mb)
        self.fused_shadow = make_fused_shadow(
            dtype, tile_target=tile, bwd_tile_target=bwd_tile,
            interpret=interpret, vmem_limit_mb=max(vmem_limit_mb or 0, 64),
            mesh=mesh, data_axis=data_axis, trunk_quant=trunk_quant,
            save_acts=save_acts, save_acts_cap_mb=save_acts_cap_mb)
        self.save_acts = save_acts
        self.save_acts_cap_mb = save_acts_cap_mb
        self.fused_coarse = make_fused_coarse(
            dtype, tile_target=tile, interpret=interpret,
            vmem_limit_mb=max(vmem_limit_mb or 0, 64),
            mesh=mesh, data_axis=data_axis, trunk_quant=trunk_quant)
        self.trunk_quant = trunk_quant
        self.pack = pack_params
        self.supports_fused_render = True

    def step_save_ok(self, r, k_cam, k_sc=0):
        """All-or-nothing saved-activations gate for one render step.

        Returns True only when the SUM of every per-sample activation
        stream the step would hold live (camera K = k_cam, shadow K = k_sc;
        0 = no shadow pass) fits ``save_acts_cap_mb`` — both buffers live
        from forward to backward, so the step's HBM pressure is the total,
        not the per-kernel max. Sum <= cap implies each stream fits the
        kernels' own per-call gate (same cap, same shared predicate
        ``fits_saved_cap``), so a True here guarantees both kernels save: a
        MIXED step — one kernel saved, its sibling falling back to
        recompute — was measured pathological on-chip: bs 16384 / sc 64 ran
        at 3.8k rays/s vs 112k all-recompute (the live stream buffer
        stacked on the recompute path's peak workspace overflows HBM and
        spills through the host tunnel). The renderer threads the result
        through the kernels' ``save_ok``."""
        if not self.save_acts:
            return False
        from eonerf_code_tpu.ops.pallas.fused_render import (
            saved_stream_bytes,
        )

        dtype = self.field.compute_dtype
        total = saved_stream_bytes(r, k_cam, dtype)
        if k_sc:
            total += saved_stream_bytes(r, k_sc, dtype)
        return total <= self.save_acts_cap_mb * 2**20

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
