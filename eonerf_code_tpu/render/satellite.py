"""The satellite rendering engine: one jittable pass over a ray block.

This replaces the reference's host-level python chunk loop + nerfacc CUDA
calls (sat_rendering.py:176-335) with a single fused XLA program per ray
block: stratified sampling -> positional encoding -> field MLP -> camera
compositing -> shadow-ray resampling -> sigma-only MLP -> sun visibility ->
irradiance + radiometric composite. Full images are rendered by `lax.map`
over equally-sized blocks (static shapes, one compilation).

Physics/composite parity notes (all against the reference):
- irradiance model: rgb = albedo*s + (1-s) * (0.2*ambient) * albedo, with
  s = geometric_sun_visibility * transient_scalar from epoch 2 on, s = 1
  before (sat_rendering.py:265-306).
- the geometric shadow pass marches from the camera ray's expected surface
  point toward the sun and reads the EXCLUSIVE transmittance at the last
  in-cube sample (sat_rendering.py:87-118).
- per-image radiometric transform rgb' = A*rgb + b, clipped to [0,1]
  (sat_rendering.py:296-305); `shadowless_rgb` = A*albedo + b, unclipped.
- beta uncertainty gets +beta_min after accumulation (eonerf.py:243).
"""

import dataclasses

import jax
import jax.numpy as jnp

from eonerf_code_tpu.data.rays import SatRays
from eonerf_code_tpu.ops.sampling import (
    cube_mask,
    intervals_from_z,
    sample_pdf,
    set_last_valid,
    stratified_z_vals,
)
from eonerf_code_tpu.ops.volrend import accumulate, exit_transmittance, render_weights


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static rendering options (hashable: safe as a jit static arg)."""

    n_samples: int = 128          # z values per camera ray (intervals = n-1)
    sc_n_samples: int = 128       # z values per shadow ray
    n_importance: int = 0         # hierarchical fine samples from the coarse
                                  # weight PDF (the reference's dead
                                  # --n_importance, implemented for real)
    perturb: bool = True          # reference quirk: perturbed in train AND eval
    cube_bound: float = 1.0
    ambient_scale: float = 0.2    # sat_rendering.py:265
    ray_span: float = 2.0         # rays sampled on [near, near + 2] (satnerf_sampling)
    inf_delta: float = 1e10
    compute_entropy: bool = False  # InfoNeRF ray entropy (the reference
                                   # computes then discards it; off = ones)
    occ_tighten: bool = False     # concentrate camera samples on the
                                  # occupied [t_lo, t_hi] from the occupancy
                                  # grid (needs occ_grid; the reference
                                  # maintains its grid but never samples
                                  # from it)
    occ_tighten_shadows: bool = False  # same tightening for the shadow rays
                                  # (sound: the exit transmittance only
                                  # accumulates where sigma can be nonzero,
                                  # and the grid is conservative)
    occ_probes: int = 64          # static probes per ray for the span walk
    occ_margin: float = 2.0       # span expansion in probe spacings
    occ_explore_frac: float = 0.25  # fraction of rays per step that sample
                                  # the FULL range despite the grid. Load-
                                  # bearing on wide-envelope (IARPA-like)
                                  # scenes: an early-wrong grid otherwise
                                  # locks sampling into the wrong altitude
                                  # band and never recovers (tall-scene A/B:
                                  # 25.7 m MAE without exploration). Set 0
                                  # for eval (converged grid).
    nadir_diagnostics: bool = False  # opacity above/below the surface along
                                     # vertical probes (sat_rendering.py:
                                     # 146-174, disabled by default there too)


def _with_exploration(key, t_lo, t_hi, near, far, frac):
    """Per-ray exploration: a `frac` subset of rays keeps the FULL [near,
    far] range despite the occupancy span. This is what makes tightening
    self-correcting — exploring rays re-grow density wherever the grid is
    wrong, and the next grid update widens the spans."""
    if frac <= 0.0:
        return t_lo, t_hi
    explore = jax.random.uniform(key, t_lo.shape) < frac
    near = jnp.broadcast_to(jnp.asarray(near, t_lo.dtype), t_lo.shape)
    far = jnp.broadcast_to(jnp.asarray(far, t_hi.dtype), t_hi.shape)
    return jnp.where(explore, near, t_lo), jnp.where(explore, far, t_hi)


def _sample_block(key, origins, viewdirs, near, n_samples, span, perturb, bound,
                  far=None):
    """Shared sampling: z values, positions, validity mask, deltas.
    ``far`` (per-ray) overrides near+span when given (tightened ranges)."""
    far = near + span if far is None else far
    z_vals = stratified_z_vals(key, near, far, n_samples, perturb=perturb)
    t_starts, t_ends, z_mid, delta = intervals_from_z(z_vals)
    pos = origins[:, None, :] + viewdirs[:, None, :] * z_mid[..., None]
    mask = cube_mask(pos, bound)
    return pos, z_mid, delta, mask


def _nadir_opacity_diagnostics(field, params, key, origins, cfg):
    """Mean alpha along vertical probes from the expected surface point,
    downward (index 0) and upward (index 1) — a density-leakage diagnostic
    (reference `compute_nadir_rays_v2`, sat_rendering.py:146-174)."""
    outs = []
    for direction in (-1.0, 1.0):
        d = jnp.zeros_like(origins).at[:, 2].set(direction)
        pos, _, delta, mask = _sample_block(
            key, origins, d, jnp.zeros(origins.shape[:1], origins.dtype),
            cfg.sc_n_samples, cfg.ray_span, cfg.perturb, cfg.cube_bound)
        sigma = field.apply(params, pos, method="density")
        _, _, alphas = render_weights(sigma, delta, mask)
        n = jnp.maximum(jnp.sum(mask, axis=-1), 1)
        outs.append(jnp.sum(jnp.where(mask, alphas, 0.0), axis=-1) / n)
    return jnp.stack(outs, axis=-1)  # (R, 2)


def _camera_samples(field, params, o, d, near, key, cfg: RenderConfig,
                    occ_grid=None):
    """Camera-ray z construction: stratified base samples plus optional
    hierarchical fine samples from a coarse sigma-only pass (the reference's
    dead --n_importance, implemented). With ``occ_tighten`` and a grid, the
    per-ray range is first tightened to the occupied span (fallback: full
    range). Returns (z_mid, delta, pos, mask)."""
    k_cam, k_fine = jax.random.split(key)
    if occ_grid is not None and cfg.occ_tighten:
        t_lo, t_hi = occ_grid.ray_span(o, d, near, near + cfg.ray_span,
                                       n_probes=cfg.occ_probes,
                                       margin=cfg.occ_margin)
        t_lo, t_hi = _with_exploration(jax.random.fold_in(k_cam, 7), t_lo, t_hi,
                                       near, near + cfg.ray_span,
                                       cfg.occ_explore_frac)
    else:
        t_lo, t_hi = near, near + cfg.ray_span
    z_vals = stratified_z_vals(k_cam, t_lo, t_hi, cfg.n_samples,
                               perturb=cfg.perturb)
    # zero-valid-sample fallback (sat_rendering.py:259-262): rays whose
    # samples all fall outside the cube are re-sampled from the DEFAULT near
    # plane (near=0, far=2). Per-ray here (the reference re-samples the whole
    # chunk); pre-MLP, so the cost is a second elementwise mask pass only.
    _, _, z_mid0, _ = intervals_from_z(z_vals)
    pos0 = o[:, None, :] + d[:, None, :] * z_mid0[..., None]
    has_valid = jnp.any(cube_mask(pos0, cfg.cube_bound), axis=-1)
    z_default = stratified_z_vals(k_cam, jnp.zeros_like(near),
                                  jnp.full_like(near, cfg.ray_span),
                                  cfg.n_samples, perturb=cfg.perturb)
    z_vals = jnp.where(has_valid[:, None], z_vals, z_default)
    if cfg.n_importance > 0:
        _, _, zc_mid, c_delta = intervals_from_z(z_vals)
        c_pos = o[:, None, :] + d[:, None, :] * zc_mid[..., None]
        c_mask = cube_mask(c_pos, cfg.cube_bound)
        c_deltam = set_last_valid(c_delta, c_mask, cfg.inf_delta)
        if getattr(field, "supports_fused_render", False):
            # fused sigma + compositing with per-RAY input (no lane-padded
            # (N,3) point stream); deltam*mask == render_weights' sigma
            # masking (identical sdelta), so the two branches agree
            rayin = jnp.concatenate(
                [o, d, jnp.zeros((o.shape[0], 10), o.dtype)], axis=1)
            c_w = field.fused_coarse(field.pack(params), rayin, zc_mid,
                                     c_deltam * c_mask)
        else:
            c_sigma = field.apply(params, c_pos, method="density")
            c_w, _, _ = render_weights(c_sigma, c_deltam, c_mask)
        z_fine = sample_pdf(k_fine, z_vals, c_w, cfg.n_importance,
                            perturb=cfg.perturb)
        z_vals = jnp.sort(jnp.concatenate(
            [z_vals, jax.lax.stop_gradient(z_fine)], axis=-1), axis=-1)
    _, _, z_mid, delta = intervals_from_z(z_vals)
    pos = o[:, None, :] + d[:, None, :] * z_mid[..., None]
    mask = cube_mask(pos, cfg.cube_bound)
    return z_mid, delta, pos, mask


def _corrected_origins(field, params, rays):
    o = rays.origins
    if getattr(field, "rpc_correction", False):
        o = o + field.apply(params, rays.img_idx, method="ray_offset")
    return o


def render_rays(field, params, rays: SatRays, key, cfg: RenderConfig,
                shadows: bool, occ_grid=None):
    """Render one block of rays. Fully jittable; `shadows` and `cfg` static.

    Returns a dict of per-ray outputs matching the reference's result keys
    (sat_rendering.py:322-334).

    Fields exposing fused render ops (PallasField) take the fused path:
    field evaluation AND volume compositing run inside the Pallas kernels
    with per-ray I/O (ops/pallas/fused_render.py) — same math, same keys.
    """
    if (getattr(field, "supports_fused_render", False)
            and not cfg.compute_entropy and not cfg.nadir_diagnostics):
        return _render_rays_fused(field, params, rays, key, cfg, shadows,
                                  occ_grid=occ_grid)
    k_cam, k_sc = jax.random.split(key)
    d, sun_d = rays.viewdirs, rays.sundirs
    o = _corrected_origins(field, params, rays)
    near = rays.t_near

    # ---- camera pass ----
    z_mid, delta, pos, mask = _camera_samples(field, params, o, d, near, k_cam,
                                              cfg, occ_grid=occ_grid)
    if occ_grid is not None and not cfg.occ_tighten:
        # empty-space masking mode (mutually exclusive with tightening: a
        # tightened span already concentrates samples in occupied space, and
        # masking there would zero the fallback rays' density)
        mask = mask & occ_grid.query(pos)
    delta_cam = set_last_valid(delta, mask, cfg.inf_delta)

    sigma, albedo, ambient, t_s, t_beta = field.apply(params, pos, sun_d, rays.img_idx)
    weights, trans, alphas = render_weights(sigma, delta_cam, mask)

    depth = accumulate(weights, z_mid)                      # (R,)
    albedo_acc = accumulate(weights, albedo)                # (R, 3)
    t_s_acc = accumulate(weights, t_s[..., 0])[:, None]     # (R, 1)
    beta_acc = accumulate(weights, t_beta[..., 0])[:, None] + field.beta_min
    opacity = accumulate(weights)                           # (R,)
    # ambient is constant along each ray -> accumulation == ambient * opacity
    ambient_acc = ambient * opacity[:, None] * cfg.ambient_scale

    # ---- geometric shadow pass (epoch >= 2) ----
    if shadows:
        sc_o = o + depth[:, None] * d                       # expected surface point
        sc_d = -sun_d
        sc_near = jnp.zeros_like(near)
        if occ_grid is not None and cfg.occ_tighten_shadows:
            # tightening the shadow march APPROXIMATES the full-span exit
            # transmittance: the MLP's sigma is nonzero everywhere, the grid
            # only thresholds it (occ_thre) and is stale between updates, so
            # skipped regions drop small-but-nonzero extinction and bias the
            # exit transmittance upward. The margin expansion and the
            # exploration fraction bound the error while the grid converges.
            sc_lo, sc_hi = occ_grid.ray_span(
                jax.lax.stop_gradient(sc_o), sc_d, sc_near, cfg.ray_span,
                n_probes=cfg.occ_probes, margin=cfg.occ_margin)
            sc_lo, sc_hi = _with_exploration(
                jax.random.fold_in(k_sc, 7), sc_lo, sc_hi,
                sc_near, sc_near + cfg.ray_span, cfg.occ_explore_frac)
        else:
            sc_lo, sc_hi = sc_near, None
        sc_pos, _, sc_delta, sc_mask = _sample_block(
            k_sc, sc_o, sc_d, sc_lo, cfg.sc_n_samples,
            cfg.ray_span, cfg.perturb, cfg.cube_bound, far=sc_hi)
        sc_sigma = field.apply(params, sc_pos, method="density")
        geo_shadow = exit_transmittance(sc_sigma, sc_delta, sc_mask)[:, None]
        s = geo_shadow * t_s_acc
        sc_pts = jnp.sum(sc_mask, axis=-1).astype(albedo_acc.dtype)[:, None]
    else:
        geo_shadow = jnp.ones_like(t_s_acc)
        s = geo_shadow  # note: NOT multiplied by transient_s before epoch 2
        sc_pts = jnp.ones_like(t_s_acc)

    # ---- irradiance + radiometric composite ----
    rgb = albedo_acc * s + (1.0 - s) * (ambient_acc * albedo_acc)
    a_coef, b_coef, _ambient_bias = field.apply(params, rays.img_idx, method="radiometric")
    rgb = jnp.clip(a_coef * rgb + b_coef, 0.0, 1.0)
    shadowless_rgb = a_coef * albedo_acc + b_coef

    if cfg.nadir_diagnostics:
        k_nd = jax.random.fold_in(key, 2)
        surface = o + depth[:, None] * d
        opacity_after_surface = _nadir_opacity_diagnostics(field, params, k_nd,
                                                           surface, cfg)
    else:
        opacity_after_surface = jnp.ones((o.shape[0], 2), albedo_acc.dtype)

    pts = jnp.sum(mask, axis=-1).astype(albedo_acc.dtype)[:, None]
    if cfg.compute_entropy:
        from eonerf_code_tpu.ops.volrend import ray_entropy

        entropy = ray_entropy(alphas, mask)[:, None]
    else:
        entropy = jnp.ones_like(depth[:, None])
    return {
        "rgb": rgb,
        "depth": depth[:, None],
        "albedo_rgb": albedo_acc,
        "ambient_rgb": ambient_acc,
        "geo_shadows": geo_shadow,
        "transient_s": t_s_acc,
        "beta": beta_acc,
        "entropy": entropy,
        "pts_per_ray": pts,
        "sc_pts_per_ray": sc_pts,
        "opacity": opacity[:, None],
        "opacity_after_surface": opacity_after_surface,
        "shadowless_rgb": shadowless_rgb,
    }


def _render_rays_fused(field, params, rays: SatRays, key, cfg: RenderConfig,
                       shadows: bool, occ_grid=None):
    """The fused-kernel twin of render_rays: sampling and the per-ray
    composite stay in XLA; the per-SAMPLE work (field evaluation + volume
    compositing) runs inside the fused Pallas ops with per-ray I/O. Output
    keys and semantics match render_rays (entropy/nadir diagnostics are the
    two opt-in extras that force the per-sample path)."""
    k_cam, k_sc = jax.random.split(key)
    d, sun_d = rays.viewdirs, rays.sundirs
    o = _corrected_origins(field, params, rays)
    near = rays.t_near
    r = o.shape[0]

    # ---- camera pass ----
    z_mid, delta, pos, mask = _camera_samples(field, params, o, d, near, k_cam,
                                              cfg, occ_grid=occ_grid)
    if occ_grid is not None and not cfg.occ_tighten:
        mask = mask & occ_grid.query(pos)
    deltam = set_last_valid(delta, mask, cfg.inf_delta) * mask

    w = field.pack(params)
    emb = params["params"]["transient_encoder"]["embedding"][rays.img_idx]
    rayin = jnp.concatenate([o, d, emb, jnp.zeros((r, 6), o.dtype)], axis=1)
    # step-level saved-acts gate: save only if every stream of THIS step
    # (camera, plus shadow when marching) fits — a mixed saved/recompute
    # step overflows HBM and was measured 30x slower (see
    # PallasField.step_save_ok)
    save_ok = field.step_save_ok(
        r, z_mid.shape[1], (cfg.sc_n_samples - 1) if shadows else 0)
    acc = field.fused_camera(w, rayin, z_mid, deltam, save_ok=save_ok)
    depth = acc[:, 0]
    albedo_acc = acc[:, 1:4]
    t_s_acc = acc[:, 4:5]
    beta_acc = acc[:, 5:6] + field.beta_min
    opacity = acc[:, 6]
    ambient = field.apply(params, sun_d, method="ambient")
    ambient_acc = ambient * opacity[:, None] * cfg.ambient_scale

    # ---- geometric shadow pass ----
    if shadows:
        sc_o = o + depth[:, None] * d
        sc_d = -sun_d
        sc_near = jnp.zeros_like(near)
        if occ_grid is not None and cfg.occ_tighten_shadows:
            sc_lo, sc_hi = occ_grid.ray_span(
                jax.lax.stop_gradient(sc_o), sc_d, sc_near, cfg.ray_span,
                n_probes=cfg.occ_probes, margin=cfg.occ_margin)
            sc_lo, sc_hi = _with_exploration(
                jax.random.fold_in(k_sc, 7), sc_lo, sc_hi,
                sc_near, sc_near + cfg.ray_span, cfg.occ_explore_frac)
        else:
            sc_lo, sc_hi = sc_near, None
        _, sc_z, sc_delta, sc_mask = _sample_block(
            k_sc, jax.lax.stop_gradient(sc_o), sc_d, sc_lo, cfg.sc_n_samples,
            cfg.ray_span, cfg.perturb, cfg.cube_bound, far=sc_hi)
        rayin_sc = jnp.concatenate(
            [sc_o, sc_d, jnp.zeros((r, 10), o.dtype)], axis=1)
        geo = field.fused_shadow(w, rayin_sc, sc_z, sc_delta * sc_mask,
                                 sc_mask.astype(jnp.float32),
                                 save_ok=save_ok)
        geo_shadow = geo[:, None]
        s = geo_shadow * t_s_acc
        sc_pts = jnp.sum(sc_mask, axis=-1).astype(albedo_acc.dtype)[:, None]
    else:
        geo_shadow = jnp.ones_like(t_s_acc)
        s = geo_shadow  # NOT multiplied by transient_s before epoch 2
        sc_pts = jnp.ones_like(t_s_acc)

    # ---- irradiance + radiometric composite (same as render_rays) ----
    rgb = albedo_acc * s + (1.0 - s) * (ambient_acc * albedo_acc)
    a_coef, b_coef, _ambient_bias = field.apply(params, rays.img_idx,
                                                method="radiometric")
    rgb = jnp.clip(a_coef * rgb + b_coef, 0.0, 1.0)
    shadowless_rgb = a_coef * albedo_acc + b_coef

    pts = jnp.sum(mask, axis=-1).astype(albedo_acc.dtype)[:, None]
    return {
        "rgb": rgb,
        "depth": depth[:, None],
        "albedo_rgb": albedo_acc,
        "ambient_rgb": ambient_acc,
        "geo_shadows": geo_shadow,
        "transient_s": t_s_acc,
        "beta": beta_acc,
        "entropy": jnp.ones_like(depth[:, None]),
        "pts_per_ray": pts,
        "sc_pts_per_ray": sc_pts,
        "opacity": opacity[:, None],
        "opacity_after_surface": jnp.ones((r, 2), albedo_acc.dtype),
        "shadowless_rgb": shadowless_rgb,
    }


def render_depth(field, params, rays: SatRays, key, cfg: RenderConfig,
                 occ_grid=None):
    """Depth-only fast path (reference: sat_rendering.py:227-249 /
    eonerf.py:172-194) — sigma-only MLP passes, no heads. Honors bundle
    adjustment, hierarchical sampling and occupancy tightening like the
    full path. Fused-capable fields route through the camera kernel (depth
    is its first per-ray output; the extra head work is ~27% of the pass,
    still far cheaper than the per-sample path's layout round trips)."""
    o = _corrected_origins(field, params, rays)
    z_mid, delta, pos, mask = _camera_samples(
        field, params, o, rays.viewdirs, rays.t_near, key, cfg,
        occ_grid=occ_grid)
    delta_cam = set_last_valid(delta, mask, cfg.inf_delta)
    if getattr(field, "supports_fused_render", False):
        r = o.shape[0]
        rayin = jnp.concatenate(
            [o, rays.viewdirs, jnp.zeros((r, 10), o.dtype)], axis=1)
        acc = field.fused_camera(field.pack(params), rayin, z_mid,
                                 delta_cam * mask)
        return acc[:, 0:1]
    sigma = field.apply(params, pos, method="density")
    weights, _, _ = render_weights(sigma, delta_cam, mask)
    return accumulate(weights, z_mid)[:, None]


def _pad_to_multiple(x, multiple):
    n = x.shape[0]
    pad = (-n) % multiple
    if pad:
        x = jnp.concatenate([x, jnp.broadcast_to(x[-1:], (pad, *x.shape[1:]))], axis=0)
    return x, n


def render_image(field, params, rays: SatRays, key, cfg: RenderConfig,
                 shadows: bool, chunk: int = 4096, occ_grid=None,
                 depth_only: bool = False):
    """Render an arbitrary number of rays by lax.map over fixed-size blocks.

    One compilation regardless of image size; blocks execute sequentially on
    device, bounding peak memory exactly like the reference's chunk loop
    (sat_rendering.py:252) without host round trips.
    """
    padded = [_pad_to_multiple(x, chunk)[0] for x in rays]
    n = rays.origins.shape[0]
    n_blocks = padded[0].shape[0] // chunk
    blocks = SatRays(*(x.reshape(n_blocks, chunk, *x.shape[1:]) for x in padded))
    keys = jax.random.split(key, n_blocks)

    if depth_only:
        fn = lambda args: render_depth(field, params, args[0], args[1], cfg,  # noqa: E731
                                       occ_grid=occ_grid)
    else:
        fn = lambda args: render_rays(field, params, args[0], args[1], cfg,  # noqa: E731
                                      shadows, occ_grid=occ_grid)
    out = jax.lax.map(fn, (blocks, keys))
    unblock = lambda x: x.reshape(n_blocks * chunk, *x.shape[2:])[:n]  # noqa: E731
    if depth_only:
        return {"depth": unblock(out)}
    return {k: unblock(v) for k, v in out.items()}


def render_image_sharded(field, params, rays: SatRays, key, cfg: RenderConfig,
                         shadows: bool, mesh, chunk: int = 4096, occ_grid=None,
                         depth_only: bool = False):
    """render_image fanned out over the mesh's "data" axis: the block list
    is sharded so each chip renders its contiguous run of blocks (shard_map
    — the same composition the multi-AOI trainer uses, so the fused Pallas
    kernels partition too, which a GSPMD annotation on an opaque pallas
    call would not). Per-GLOBAL-block keys are drawn exactly like
    render_image's, so for a ray count divisible by chunk*n_data the output
    is bit-identical to the single-device path; with perturb=False it is
    bit-identical for any ray count (no RNG is consumed)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if getattr(field, "mesh", None) is not None:
        # the field's fused ops already shard_map over the mesh internally
        # (a Trainer-built PallasField); wrapping them in a second shard_map
        # would nest Manual contexts — the plain block loop is already the
        # sharded render for such a field
        return render_image(field, params, rays, key, cfg, shadows,
                            chunk=chunk, occ_grid=occ_grid,
                            depth_only=depth_only)

    # checkpoint-restored params/grid arrive committed to one device;
    # replicate them onto the mesh so the closed-over values are legal
    # inside the sharded computation
    rep = NamedSharding(mesh, P())
    params = jax.device_put(params, rep)
    if occ_grid is not None:
        occ_grid = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x,
            occ_grid)

    n_data = mesh.shape["data"]
    padded = [_pad_to_multiple(x, chunk * n_data)[0] for x in rays]
    n = rays.origins.shape[0]
    n_blocks = padded[0].shape[0] // chunk
    blocks = SatRays(*(x.reshape(n_blocks, chunk, *x.shape[1:]) for x in padded))
    keys = jax.random.split(key, n_blocks)

    if depth_only:
        fn = lambda args: render_depth(field, params, args[0], args[1], cfg,  # noqa: E731
                                       occ_grid=occ_grid)
    else:
        fn = lambda args: render_rays(field, params, args[0], args[1], cfg,  # noqa: E731
                                      shadows, occ_grid=occ_grid)

    local = lambda b, k: jax.lax.map(fn, (b, k))  # noqa: E731
    out = jax.shard_map(local, mesh=mesh,
                        in_specs=(P("data"), P("data")),
                        out_specs=P("data"), check_vma=False)(blocks, keys)
    unblock = lambda x: x.reshape(n_blocks * chunk, *x.shape[2:])[:n]  # noqa: E731
    if depth_only:
        return {"depth": unblock(out)}
    return {k: unblock(v) for k, v in out.items()}
