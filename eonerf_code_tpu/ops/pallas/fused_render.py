"""Fused render-step kernels: field evaluation + volume compositing in one
Pallas pass with PER-RAY I/O (v3).

Why: the v2 kernels (fused_field.py) stream per-POINT arrays — pos (N,3),
emb (N,4), outputs (N,8), cotangents (N,8). On TPU every (N, C<=128) f32
row-major array is lane-padded to 128, so each such stream costs ~40x its
logical size in HBM footprint/traffic, and XLA inserts layout copies at
every boundary between the kernels' point-major world and the (rays,
samples) compositing world — measured ~15 of the 21 ms/step of glue at
bs 8192 (scripts/xplane_summary.py).

v3 moves ray construction AND volume compositing inside the kernels:

- `make_fused_camera()(weights, rayin, zcol, deltam)` -> per-ray
  accumulators (R, 8): [depth, albedo*3, t_s, t_beta, opacity, 0]. The
  kernel builds sample positions from per-ray (o, d) and per-sample z
  (positional-encoding linearity: (o + d z) @ B == o@B + (d@B) z, exact for
  the power-of-two B), evaluates the trunk + per-sample heads, and
  composites with an in-kernel segmented exclusive scan (transmittance) and
  a selector-matrix matmul (per-ray reductions).
- `make_fused_shadow()(weights, rayin, zcol, deltam, maskrk)` -> per-ray
  sun visibility (R, 8): [exit transmittance, 0...] — the geometric shadow
  readout (reference sat_rendering.py:106-116: EXCLUSIVE transmittance at
  the last in-cube sample; rays with no valid samples return 1).
- `make_fused_coarse()(weights, rayin, z, deltam)` -> per-sample weights
  (R, K) — the PDF source for hierarchical importance sampling
  (forward-only: z_fine is drawn under stop_gradient).

Both are custom_vjp ops whose backward is one kernel per tile
(flash-style recompute) producing weight gradients plus PER-RAY input
gradients: d_rayin (R, 16) carries d_origin (rows 0:3 — the RPC
bundle-adjustment path) and d_emb (cols 6:10); for the shadow op d_origin
feeds the depth gradient (sc_o = o + depth*d) in the glue.

Sampling (stratified z, occupancy tightening, importance merge, cube
masks, the 1e10 last-delta sentinel) stays in XLA glue on (R, K) arrays —
cheap there and shared with the non-fused path. `deltam` must arrive as
delta * valid_mask (masked samples contribute exactly zero extinction,
which reproduces the reference's point-removal semantics).

Segment layout: rays x samples tiles with K padded to KPAD (multiple of
the 8-row sublane granule — padded samples run the full trunk, so lane-tile
padding would waste up to (128-K)/K of the FLOPs); row r*KPAD+k of the
point axis is sample k of ray r. Scans run in
the (RT, KPAD) domain (lanes = samples); per-ray reductions,
per-ray-to-per-sample broadcasts, and the (nt,1)<->(rt,kpad) domain moves
are all matmuls against 0/1 selectors built from iota (Mosaic has no shape
cast between those vector shapes, and strided relayouts are the expensive
path on the VPU).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eonerf_code_tpu.ops.pallas.fused_field import (
    N_DENSITY_WEIGHTS,
    N_Q8,
    N_WEIGHTS,
    FieldWeights,
    _cparams,
    _mm,
    _mm_t,
    _outer,
    _pad_pe_rows,
    _pe_pattern64,
    _pe_phase,
    _load_q8,
    _relu_mask,
    _softplus,
    _trunk_bwd,
    _trunk_bwd_any,
    _trunk_fwd,
    _trunk_fwd_any,
    cast_matrices,
    density_subset,
    flatten_weights,
    quantize_trunk_int8,
    unflatten_weights,
)

RAYIN_COLS = 16   # [o(3), d(3), emb(4), pad(6)]
ACC_COLS = 8      # [depth, albedo r g b, t_s, t_beta, opacity, pad]


# ---------------------------------------------------------------------------
# in-kernel building blocks
# ---------------------------------------------------------------------------

def _sel(nt, rt, kpad):
    """(nt, rt) 0/1 f32 selector: row i belongs to ray i // kpad."""
    i = jax.lax.broadcasted_iota(jnp.int32, (nt, rt), 0)
    r = jax.lax.broadcasted_iota(jnp.int32, (nt, rt), 1)
    return (i // kpad == r).astype(jnp.float32)


def _expand(sel, per_ray):
    """per-ray (rt, C) -> per-sample (nt, C)."""
    return jax.lax.dot_general(sel, per_ray, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _onehot_k(nt, kpad):
    """(nt, kpad) 0/1 f32: row i hits lane i % kpad (its own sample slot)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (nt, kpad), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (nt, kpad), 1)
    return (i % kpad == k).astype(jnp.float32)


def _col_to_rk(sel, col, kpad):
    """per-sample column (nt, 1) -> (rt, kpad) rays-x-samples. Mosaic has no
    (nt,1)<->(rt,kpad) shape cast, so route through a matmul: mask the
    column onto its sample lane and segment-sum the rows."""
    return _reduce_rays(sel, col * _onehot_k(col.shape[0], kpad))


def _rk_to_col(sel, rk):
    """(rt, kpad) -> per-sample column (nt, 1): broadcast each ray's row to
    its samples, then select the own-sample lane."""
    nt = sel.shape[0]
    wide = _expand(sel, rk)
    return jnp.sum(wide * _onehot_k(nt, rk.shape[1]), axis=1, keepdims=True)


def _reduce_rays(sel, per_sample):
    """per-sample (nt, C) -> per-ray (rt, C) segment sums."""
    return jax.lax.dot_general(sel, per_sample, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _ray_basis(rayin, row0):
    """(rt, 64) = rayin @ P where P routes rayin rows row0..row0+2 through
    the PE frequency pattern (so (o + d z) @ B becomes basis_o + basis_d*z
    per sample — no per-sample position array is ever materialized)."""
    pat = _pe_pattern64()  # (3, 64)
    pad = jnp.pad(pat, ((row0, RAYIN_COLS - 3 - row0), (0, 0)))
    return jax.lax.dot_general(rayin, pad, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _emb_basis(rayin):
    """(rt, 64) embedding block: rayin cols 6..9 -> cols 0..3 of a 64-wide
    array (feeds the transient-head concat without lane shuffles)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (RAYIN_COLS, 64), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (RAYIN_COLS, 64), 1)
    e = ((i >= 6) & (i < 10) & (j == i - 6)).astype(jnp.float32)
    return jax.lax.dot_general(rayin, e, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _pe_from_xb(xb, dtype):
    """pe64 from precomputed arguments xb (same exact/phased split as
    fused_field._pe64)."""
    col = jax.lax.broadcasted_iota(jnp.int32, xb.shape, 1)
    if dtype == jnp.float32:
        s, c = jnp.sin(xb), jnp.cos(xb)
        return jnp.where(col < 3, xb, jnp.where(col < 33, s,
                         jnp.where(col < 63, c, 0.0)))
    a1 = jnp.sin(xb + _pe_phase(col))
    return jnp.where(col < 3, xb, jnp.where(col < 63, a1, 0.0))


def _pe_deriv_from_xb(xb, dtype):
    col = jax.lax.broadcasted_iota(jnp.int32, xb.shape, 1)
    if dtype == jnp.float32:
        s, c = jnp.sin(xb), jnp.cos(xb)
        return jnp.where(col < 3, 1.0, jnp.where(col < 33, c,
                         jnp.where(col < 63, -s, 0.0)))
    a2 = jnp.sin(xb + _pe_phase(col) + jnp.float32(jnp.pi / 2))
    return jnp.where(col < 3, 1.0, jnp.where(col < 63, a2, 0.0))


def _scan_excl(y, reverse=False):
    """Segmented EXCLUSIVE cumsum along lanes of (rt, kpad) — rows are
    segments. Shift-first (no inclusive-minus-self: the camera pass carries
    a 1e10 sentinel delta and subtraction would cancel catastrophically),
    then Hillis-Steele with static lane shifts."""
    kpad = y.shape[-1]
    if reverse:
        z = jnp.concatenate([y[:, 1:], jnp.zeros_like(y[:, :1])], axis=1)
    else:
        z = jnp.concatenate([jnp.zeros_like(y[:, :1]), y[:, :-1]], axis=1)
    d = 1
    while d < kpad:
        if reverse:
            shifted = jnp.concatenate(
                [z[:, d:], jnp.zeros_like(z[:, :d])], axis=1)
        else:
            shifted = jnp.concatenate(
                [jnp.zeros_like(z[:, :d]), z[:, :-d]], axis=1)
        z = z + shifted
        d *= 2
    return z


def _heads_fwd(h, emb64, w: FieldWeights, dtype, with_res=False):
    """Per-sample heads from the trunk output h (sigma/bottleneck, albedo,
    transient, beta). Split out so the saved-activations backward can
    recompute ONLY the heads from the streamed trunk activations."""
    sig_pre = _mm(h, w.sigma_w, w.sigma_b)
    sigma = _softplus(sig_pre)
    bott = _mm(h, w.bott_w, w.bott_b).astype(dtype)
    ah_pre = _mm(bott, w.alb_w0, w.alb_b0)
    ah = jnp.maximum(ah_pre, 0.0).astype(dtype)
    albedo = jax.nn.sigmoid(_mm(ah, w.alb_w1, w.alb_b1))
    t_in = jnp.concatenate([bott, emb64.astype(dtype)], axis=-1)
    t_acts, t_masks = [], []
    t = t_in
    for i in range(4):
        pre = _mm(t, w.tr_w[i], w.tr_b[i])
        t = jnp.maximum(pre, 0.0).astype(dtype)
        if with_res:
            t_acts.append(t)
            t_masks.append(_relu_mask(pre, dtype))
    ts = jax.nn.sigmoid(_mm(t, w.ts_w, w.ts_b))
    tb_pre = _mm(t, w.tb_w, w.tb_b)
    tb = _softplus(tb_pre)
    if not with_res:
        return sigma, albedo, ts, tb
    res = dict(h=h, sig_pre=sig_pre, bott=bott, ah_pre=ah_pre, ah=ah,
               albedo=albedo, t_in=t_in, t_acts=t_acts, t_masks=t_masks,
               ts=ts, tb_pre=tb_pre)
    return sigma, albedo, ts, tb, res


def _field_heads_fwd(pe, emb64, w: FieldWeights, dtype, with_res=False,
                     q8=None):
    """Trunk + per-sample heads (shared by camera fwd and bwd-recompute).
    Returns (sigma_col f32, albedo, ts, tb[, residuals]). With ``q8`` the
    trunk runs int8 (heads stay in the compute dtype)."""
    if with_res:
        acts, masks = _trunk_fwd_any(pe, w, dtype, q8=q8, with_masks=True)
        sigma, albedo, ts, tb, res = _heads_fwd(acts[-1], emb64, w, dtype,
                                                with_res=True)
        res.update(acts=acts, masks=masks)
        return sigma, albedo, ts, tb, res
    acts = _trunk_fwd_any(pe, w, dtype, q8=q8)
    return _heads_fwd(acts[-1], emb64, w, dtype)


def _masks_from_acts(acts, dtype):
    """relu-derivative multipliers recovered from saved POST-relu
    activations: act > 0 iff pre > 0 (max(pre,0) preserves sign; the only
    divergence is an f32 pre in (0, bf16-subnormal-min) flushing to zero on
    the save cast — numerically irrelevant). Compare in f32: Mosaic has no
    bf16 cmpf."""
    return [_relu_mask(a.astype(jnp.float32), dtype) for a in acts]


N_TRUNK_ACTS_COLS = 8 * 256   # saved-activations stream: h0..h7 lanes


def _compose_fwd(sel, sigma_col, deltam_rk, rt, kpad):
    """In-kernel volume compositing pieces. Returns (w_col, parts) where
    parts are reused by the backward."""
    sigma_rk = _col_to_rk(sel, sigma_col, kpad)
    sdelta = sigma_rk * deltam_rk
    excl = _scan_excl(sdelta)
    trans = jnp.exp(-excl)
    em = jnp.exp(-sdelta)
    alpha = 1.0 - em
    w_rk = trans * alpha
    w_col = _rk_to_col(sel, w_rk)
    return w_col, (sdelta, trans, em, alpha, w_rk)


def _values8(zcol, albedo, ts, tb):
    """(nt, 8) per-sample value columns [z, albedo(3), ts, tb, 1, 0] — the
    quantities whose weighted per-ray sums the camera op returns."""
    ones = jnp.ones_like(zcol)
    zeros = jnp.zeros_like(zcol)
    return jnp.concatenate(
        [zcol, albedo.astype(jnp.float32), ts, tb, ones, zeros], axis=1)


# ---------------------------------------------------------------------------
# camera kernels
# ---------------------------------------------------------------------------

def _camera_fwd_kernel(dtype, quant, rt, kpad, save, rayin_ref, zcol_ref,
                       deltam_ref, *rest):
    nq = N_Q8 if quant else 0
    weight_refs, acc_ref = rest[:N_WEIGHTS], rest[N_WEIGHTS + nq]
    q8 = _load_q8(rest[N_WEIGHTS:N_WEIGHTS + nq]) if quant else None
    w = unflatten_weights([r[:] for r in weight_refs])
    nt = rt * kpad
    sel = _sel(nt, rt, kpad)
    rayin = rayin_ref[:].astype(jnp.float32)
    zcol = _rk_to_col(sel, zcol_ref[:].astype(jnp.float32))
    xb = _expand(sel, _ray_basis(rayin, 0)) + \
        _expand(sel, _ray_basis(rayin, 3)) * zcol
    pe = _pe_from_xb(xb, dtype).astype(dtype)
    emb64 = _expand(sel, _emb_basis(rayin))
    if save:
        # stream the post-relu trunk activations out for the backward
        # (spends HBM bandwidth to skip the flash-style recompute there)
        acts_ref = rest[N_WEIGHTS + nq + 1]
        acts = _trunk_fwd_any(pe, w, dtype, q8=q8)
        for i in range(8):
            acts_ref[:, 256 * i:256 * (i + 1)] = acts[i]
        sigma, albedo, ts, tb = _heads_fwd(acts[-1], emb64, w, dtype)
    else:
        sigma, albedo, ts, tb = _field_heads_fwd(pe, emb64, w, dtype, q8=q8)
    w_col, _ = _compose_fwd(sel, sigma, deltam_ref[:], rt, kpad)
    v8 = _values8(zcol, albedo, ts, tb) * w_col
    acc_ref[:] = _reduce_rays(sel, v8)


def _camera_bwd_kernel(dtype, quant, rt, kpad, saved, rayin_ref, zcol_ref,
                       deltam_ref, gacc_ref, *rest):
    if saved:
        acts_in_ref, rest = rest[0], rest[1:]
    nq = N_Q8 if quant else 0
    weight_refs = rest[:N_WEIGHTS]
    q8 = _load_q8(rest[N_WEIGHTS:N_WEIGHTS + nq]) if quant else None
    out_refs = rest[N_WEIGHTS + nq:]
    drayin_ref = out_refs[0]
    dw_refs = out_refs[1:]
    w = unflatten_weights([r[:] for r in weight_refs])
    nt = rt * kpad
    sel = _sel(nt, rt, kpad)
    rayin = rayin_ref[:].astype(jnp.float32)
    zcol = _rk_to_col(sel, zcol_ref[:].astype(jnp.float32))
    deltam = deltam_ref[:]

    # ---- recompute forward with residuals ----
    # (pe is recomputed in BOTH modes: the trunk wgrads for layers 0/5 and
    # the d_origin path need it, and it is transcendentals, not a matmul
    # pass. `saved` skips only the 8-matmul trunk recompute.)
    xb = _expand(sel, _ray_basis(rayin, 0)) + \
        _expand(sel, _ray_basis(rayin, 3)) * zcol
    pe = _pe_from_xb(xb, dtype).astype(dtype)
    emb64 = _expand(sel, _emb_basis(rayin))
    if saved:
        acts = [acts_in_ref[:, 256 * i:256 * (i + 1)] for i in range(8)]
        sigma, albedo, ts, tb, res = _heads_fwd(acts[-1], emb64, w, dtype,
                                                with_res=True)
        res.update(acts=acts, masks=_masks_from_acts(acts, dtype))
    else:
        sigma, albedo, ts, tb, res = _field_heads_fwd(pe, emb64, w, dtype,
                                                      with_res=True, q8=q8)
    w_col, (sdelta, trans, em, alpha, w_rk) = _compose_fwd(
        sel, sigma, deltam, rt, kpad)
    v_raw = _values8(zcol, albedo, ts, tb)

    # ---- compositing backward ----
    gacc = gacc_ref[:].astype(jnp.float32)       # (rt, 8)
    gv = _expand(sel, gacc)                      # (nt, 8)
    d_w_col = jnp.sum(gv * v_raw, axis=1, keepdims=True)
    d_val = gv * w_col                           # (nt, 8)
    g_alb = d_val[:, 1:4]
    g_ts = d_val[:, 4:5]
    g_tb = d_val[:, 5:6]
    d_w_rk = _col_to_rk(sel, d_w_col, kpad)
    d_alpha = d_w_rk * trans
    d_trans = d_w_rk * alpha
    d_excl = -trans * d_trans
    d_sdelta = d_alpha * em + _scan_excl(d_excl, reverse=True)
    d_sigma_col = _rk_to_col(sel, d_sdelta * deltam)

    # ---- head/trunk backward (mirrors fused_field._field_bwd_kernel) ----
    g_sig_pre = d_sigma_col * jax.nn.sigmoid(res["sig_pre"])
    tsv = res["ts"]
    g_ts_pre = g_ts * tsv * (1.0 - tsv)
    g_tb_pre = g_tb * jax.nn.sigmoid(res["tb_pre"])

    grads = {}
    t_acts, t_masks, t_in = res["t_acts"], res["t_masks"], res["t_in"]
    grads["ts_w"] = _outer(t_acts[3], g_ts_pre.astype(dtype))
    grads["ts_b"] = jnp.sum(g_ts_pre, axis=0, keepdims=True)
    grads["tb_w"] = _outer(t_acts[3], g_tb_pre.astype(dtype))
    grads["tb_b"] = jnp.sum(g_tb_pre, axis=0, keepdims=True)

    g_t = _mm_t(g_ts_pre, w.ts_w, dtype) + _mm_t(g_tb_pre, w.tb_w, dtype)
    tr_dw = [None] * 4
    tr_db = [None] * 4
    for i in range(3, -1, -1):
        g_pre = g_t * t_masks[i]
        inp = t_in if i == 0 else t_acts[i - 1]
        tr_dw[i] = _outer(inp, g_pre)
        tr_db[i] = jnp.sum(g_pre, axis=0, keepdims=True, dtype=jnp.float32)
        g_t = jax.lax.dot_general(g_pre, w.tr_w[i], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32).astype(dtype)
    g_bott_t = g_t[:, :256]
    g_emb = g_t[:, 256:260].astype(jnp.float32)

    alb = res["albedo"]
    g_alb_pre = g_alb * alb * (1.0 - alb)
    m_ah = _relu_mask(res["ah_pre"], dtype)
    grads["alb_w1"] = _outer(res["ah"], g_alb_pre.astype(dtype))
    grads["alb_b1"] = jnp.sum(g_alb_pre, axis=0, keepdims=True)
    g_ah = m_ah * _mm_t(g_alb_pre, w.alb_w1, dtype)
    grads["alb_w0"] = _outer(res["bott"], g_ah)
    grads["alb_b0"] = jnp.sum(g_ah, axis=0, keepdims=True, dtype=jnp.float32)
    g_bott = g_bott_t + jax.lax.dot_general(
        g_ah, w.alb_w0, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype)

    h = res["h"]
    grads["bott_w"] = _outer(h, g_bott)
    grads["bott_b"] = jnp.sum(g_bott, axis=0, keepdims=True, dtype=jnp.float32)
    grads["sigma_w"] = _outer(h, g_sig_pre.astype(dtype))
    grads["sigma_b"] = jnp.sum(g_sig_pre, axis=0, keepdims=True)
    g_h = _mm_t(g_bott, w.bott_w, dtype) + _mm_t(g_sig_pre, w.sigma_w, dtype)

    trunk_dw = [None] * 8
    trunk_db = [None] * 8
    g_pe = _trunk_bwd_any(pe, res["acts"], res["masks"], g_h, w, dtype,
                          trunk_dw, trunk_db,
                          q8=q8 if quant == "full" else None)
    deriv = _pe_deriv_from_xb(xb, dtype)
    d_xb = g_pe.astype(jnp.float32) * deriv      # (nt, 64)
    # xb = sel@basis_o + (sel@basis_d) * z: per-ray gradients via the
    # transposed chain (basis matrices are exact 0/pow2 routings)
    pat = _pe_pattern64()
    d_o = jax.lax.dot_general(
        _reduce_rays(sel, d_xb), pat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)      # (rt, 3)
    d_d = jax.lax.dot_general(
        _reduce_rays(sel, d_xb * zcol), pat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)      # (rt, 3)
    d_emb_ray = _reduce_rays(sel, g_emb)         # (rt, 4)
    pad2 = jnp.zeros((rt, RAYIN_COLS - 10), jnp.float32)
    drayin_ref[:] = jnp.concatenate([d_o, d_d, d_emb_ray, pad2], axis=1)

    contribs = (trunk_dw + trunk_db
                + [grads["sigma_w"], grads["sigma_b"], grads["bott_w"], grads["bott_b"],
                   grads["alb_w0"], grads["alb_b0"], grads["alb_w1"], grads["alb_b1"]]
                + tr_dw + tr_db
                + [grads["ts_w"], grads["ts_b"], grads["tb_w"], grads["tb_b"]])
    first = pl.program_id(0) == 0
    for ref, contrib in zip(dw_refs, contribs):
        @pl.when(first)
        def _(ref=ref, contrib=contrib):
            ref[:] = contrib

        @pl.when(jnp.logical_not(first))
        def _(ref=ref, contrib=contrib):
            ref[:] = ref[:] + contrib


# ---------------------------------------------------------------------------
# shadow kernels (density trunk + exit transmittance)
# ---------------------------------------------------------------------------

def _density_trunk(pe, weight_refs, dtype, with_res=False, q8=None,
                   acts=None):
    """sigma-only trunk. With ``acts`` (saved-activations backward) the
    8-matmul trunk recompute is skipped and relu masks are recovered from
    the saved post-relu activations."""
    tw = [r[:] for r in weight_refs[:8]]
    tb = [r[:] for r in weight_refs[8:16]]
    sw, sb = weight_refs[16][:], weight_refs[17][:]
    w = FieldWeights(tuple(tw), tuple(tb), sw, sb, *([None] * 12))
    if acts is not None:
        masks = _masks_from_acts(acts, dtype) if with_res else None
    elif with_res:
        acts, masks = _trunk_fwd_any(pe, w, dtype, q8=q8, with_masks=True)
    else:
        acts = _trunk_fwd_any(pe, w, dtype, q8=q8)
    h = acts[-1]
    sig_pre = _mm(h, sw, sb)
    sigma = _softplus(sig_pre)
    if not with_res:
        return sigma, w
    return sigma, w, acts, masks, h, sig_pre


def _shadow_fwd_kernel(dtype, quant, rt, kpad, save, rayin_ref, zcol_ref,
                       deltam_ref, mask_ref, *rest):
    nq = N_Q8 if quant else 0
    weight_refs = rest[:N_DENSITY_WEIGHTS]
    q8 = _load_q8(rest[N_DENSITY_WEIGHTS:N_DENSITY_WEIGHTS + nq]) if quant else None
    out_ref = rest[N_DENSITY_WEIGHTS + nq]
    nt = rt * kpad
    sel = _sel(nt, rt, kpad)
    rayin = rayin_ref[:].astype(jnp.float32)
    zcol = _rk_to_col(sel, zcol_ref[:].astype(jnp.float32))
    xb = _expand(sel, _ray_basis(rayin, 0)) + \
        _expand(sel, _ray_basis(rayin, 3)) * zcol
    pe = _pe_from_xb(xb, dtype).astype(dtype)
    if save:
        acts_ref = rest[N_DENSITY_WEIGHTS + nq + 1]
        tw = [r[:] for r in weight_refs[:8]]
        tb = [r[:] for r in weight_refs[8:16]]
        w = FieldWeights(tuple(tw), tuple(tb), weight_refs[16][:],
                         weight_refs[17][:], *([None] * 12))
        acts = _trunk_fwd_any(pe, w, dtype, q8=q8)
        for i in range(8):
            acts_ref[:, 256 * i:256 * (i + 1)] = acts[i]
        sigma = _softplus(_mm(acts[-1], w.sigma_w, w.sigma_b))
    else:
        sigma, _ = _density_trunk(pe, weight_refs, dtype, q8=q8)
    sigma_rk = _col_to_rk(sel, sigma, kpad)
    sdelta = sigma_rk * deltam_ref[:]
    # exclusive transmittance AT the last valid sample: sum of sdelta over
    # samples strictly before it == sum over samples whose remaining-valid
    # count (reverse inclusive scan of the mask) is >= 2
    maskf = mask_ref[:]
    rcount = _scan_excl(maskf, reverse=True) + maskf
    before_last = (rcount >= 2.0).astype(jnp.float32)
    ev = jnp.sum(sdelta * before_last, axis=1, keepdims=True)  # (rt, 1)
    geo = jnp.exp(-ev)
    out_ref[:] = jnp.concatenate(
        [geo, jnp.zeros((rt, ACC_COLS - 1), jnp.float32)], axis=1)


def _shadow_bwd_kernel(dtype, quant, rt, kpad, saved, rayin_ref, zcol_ref,
                       deltam_ref, mask_ref, ggeo_ref, *rest):
    if saved:
        acts_in_ref, rest = rest[0], rest[1:]
    nq = N_Q8 if quant else 0
    weight_refs = rest[:N_DENSITY_WEIGHTS]
    q8 = _load_q8(rest[N_DENSITY_WEIGHTS:N_DENSITY_WEIGHTS + nq]) if quant else None
    out_refs = rest[N_DENSITY_WEIGHTS + nq:]
    drayin_ref = out_refs[0]
    dw_refs = out_refs[1:]
    nt = rt * kpad
    sel = _sel(nt, rt, kpad)
    rayin = rayin_ref[:].astype(jnp.float32)
    zcol = _rk_to_col(sel, zcol_ref[:].astype(jnp.float32))
    deltam = deltam_ref[:]

    xb = _expand(sel, _ray_basis(rayin, 0)) + \
        _expand(sel, _ray_basis(rayin, 3)) * zcol
    pe = _pe_from_xb(xb, dtype).astype(dtype)
    saved_acts = ([acts_in_ref[:, 256 * i:256 * (i + 1)] for i in range(8)]
                  if saved else None)
    sigma, w, acts, masks, h, sig_pre = _density_trunk(
        pe, weight_refs, dtype, with_res=True, q8=q8, acts=saved_acts)
    sigma_rk = _col_to_rk(sel, sigma, kpad)
    sdelta = sigma_rk * deltam
    maskf = mask_ref[:]
    rcount = _scan_excl(maskf, reverse=True) + maskf
    before_last = (rcount >= 2.0).astype(jnp.float32)
    ev = jnp.sum(sdelta * before_last, axis=1, keepdims=True)
    geo = jnp.exp(-ev)

    g_geo = ggeo_ref[:, 0:1].astype(jnp.float32)    # (rt, 1)
    d_ev = -geo * g_geo
    d_sdelta = d_ev * before_last                   # broadcast over lanes
    d_sigma_col = _rk_to_col(sel, d_sdelta * deltam)

    g_sig_pre = d_sigma_col * jax.nn.sigmoid(sig_pre)
    sw = weight_refs[16][:]
    dsw = _outer(h, g_sig_pre.astype(dtype))
    dsb = jnp.sum(g_sig_pre, axis=0, keepdims=True)
    g_h = _mm_t(g_sig_pre, sw, dtype)

    trunk_dw = [None] * 8
    trunk_db = [None] * 8
    g_pe = _trunk_bwd_any(pe, acts, masks, g_h, w, dtype, trunk_dw, trunk_db,
                          q8=q8 if quant == "full" else None)
    deriv = _pe_deriv_from_xb(xb, dtype)
    d_xb = g_pe.astype(jnp.float32) * deriv
    pat = _pe_pattern64()
    d_o = jax.lax.dot_general(
        _reduce_rays(sel, d_xb), pat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    d_d = jax.lax.dot_general(
        _reduce_rays(sel, d_xb * zcol), pat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    pad2 = jnp.zeros((rt, RAYIN_COLS - 6), jnp.float32)
    drayin_ref[:] = jnp.concatenate([d_o, d_d, pad2], axis=1)

    contribs = trunk_dw + trunk_db + [dsw, dsb]
    first = pl.program_id(0) == 0
    for ref, contrib in zip(dw_refs, contribs):
        @pl.when(first)
        def _(ref=ref, contrib=contrib):
            ref[:] = contrib

        @pl.when(jnp.logical_not(first))
        def _(ref=ref, contrib=contrib):
            ref[:] = ref[:] + contrib


# ---------------------------------------------------------------------------
# coarse-weights kernel (the hierarchical sampler's PDF source)
# ---------------------------------------------------------------------------

def _coarse_fwd_kernel(dtype, quant, rt, kpad, rayin_ref, zcol_ref,
                       deltam_ref, *rest):
    """sigma-only trunk + in-kernel compositing, emitting the per-sample
    WEIGHTS (rt, kpad) that drive importance resampling (the reference's
    --n_importance, sample_pdf over coarse weights). Forward-only: the
    caller draws z_fine under stop_gradient, so no cotangent ever reaches
    this op."""
    nq = N_Q8 if quant else 0
    weight_refs = rest[:N_DENSITY_WEIGHTS]
    q8 = _load_q8(rest[N_DENSITY_WEIGHTS:N_DENSITY_WEIGHTS + nq]) if quant else None
    out_ref = rest[N_DENSITY_WEIGHTS + nq]
    nt = rt * kpad
    sel = _sel(nt, rt, kpad)
    rayin = rayin_ref[:].astype(jnp.float32)
    zcol = _rk_to_col(sel, zcol_ref[:].astype(jnp.float32))
    xb = _expand(sel, _ray_basis(rayin, 0)) + \
        _expand(sel, _ray_basis(rayin, 3)) * zcol
    pe = _pe_from_xb(xb, dtype).astype(dtype)
    sigma, _ = _density_trunk(pe, weight_refs, dtype, q8=q8)
    _, (_sd, _tr, _em, _al, w_rk) = _compose_fwd(sel, sigma, deltam_ref[:],
                                                 rt, kpad)
    out_ref[:] = w_rk


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------

def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _kpad_of(k):
    """Pad the sample axis to the SUBLANE granule (8), not the lane tile:
    padded samples run the full trunk (their sdelta is zero but their
    position is real), so lane-tile padding would waste (128-K)/K of the
    kernel FLOPs — 35% at the production 96-sample config."""
    return _round_up(max(k, 1), 8)


def _rt_of(kpad, target, n_rays):
    """Rays per tile: ~target point-rows per tile, a multiple of 8 (Pallas
    block rows must divide by the sublane granule), never rounding a small
    call up past the actual ray count by more than a sublane."""
    rt = max((target // kpad) // 8 * 8, 8)
    return min(rt, _round_up(n_rays, 8))


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


def _ray_spec(rt, cols):
    return pl.BlockSpec((rt, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _pt_spec(nt, cols):
    return pl.BlockSpec((nt, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _pad_rows_to(x, rows, value=0.0):
    pad = rows - x.shape[0]
    if pad <= 0:
        return x
    return jnp.concatenate(
        [x, jnp.full((pad, *x.shape[1:]), value, x.dtype)], axis=0)


def _prep(z, deltam, mask=None):
    """(R, K) glue arrays -> (R, KPAD) padded. z stays in dense per-ray
    form; the kernels build the per-point column in VMEM via _rk_to_col —
    staging a (R*KPAD, 8) column operand through XLA cost ~5 ms/step of
    pad+layout-copy traffic at bs 8192 (round-5 trace). Padding samples
    carry zero extinction."""
    r, k = z.shape
    kpad = _kpad_of(k)
    zp = jnp.pad(z, ((0, 0), (0, kpad - k)))
    dp = jnp.pad(deltam, ((0, 0), (0, kpad - k)))
    out = [zp, dp]
    if mask is not None:
        out.append(jnp.pad(mask.astype(jnp.float32), ((0, 0), (0, kpad - k))))
    return kpad, out


def _saved_bytes(r, kpad, compute_dtype):
    return r * kpad * N_TRUNK_ACTS_COLS * jnp.dtype(compute_dtype).itemsize


def saved_stream_bytes(r, k, compute_dtype):
    """HBM bytes one saved-activations stream (camera or shadow) holds live
    from forward to backward, for R rays x K samples."""
    return _saved_bytes(r, _kpad_of(k), compute_dtype)


def fits_saved_cap(r, k, compute_dtype, cap_mb):
    """The ONE fit predicate for the saved-activations stream — shared by
    each kernel's internal per-call gate and PallasField.step_save_ok, so
    the no-mixed-step guarantee can't drift out of sync between the two."""
    return saved_stream_bytes(r, k, compute_dtype) <= cap_mb * 2**20


def make_fused_camera(compute_dtype=jnp.bfloat16, tile_target=2048,
                      bwd_tile_target=1024, interpret=False,
                      vmem_limit_mb=64, mesh=None, data_axis="data",
                      trunk_quant=False, save_acts=False,
                      save_acts_cap_mb=8192):
    """Returns camera(weights: FieldWeights, rayin (R,16), z (R,K),
    deltam (R,K)) -> acc (R, 8) with fused forward and backward.

    rayin rows: [origin(3), viewdir(3), embedding(4), 0*6]; deltam must be
    delta * valid_mask with the reference's 1e10 last-valid sentinel already
    applied. With ``mesh``, both passes shard_map over ``data_axis`` on the
    RAY axis (R must divide the axis size). ``trunk_quant`` True runs the
    trunk matmuls (fwd + bwd recompute) in int8; "full" additionally runs
    the trunk dgrad/wgrad cotangent matmuls in int8 — see
    quantize_trunk_int8 / _trunk_bwd_q8.

    ``save_acts`` trades HBM bandwidth for MXU time: the differentiated
    forward additionally streams the 8 post-relu trunk activations
    ((R*KPAD, 2048) in the compute dtype) to HBM and the backward reads
    them instead of recomputing the trunk chain (the dominant third of its
    matmul work). Falls back to flash-style recompute per call whenever the
    stream would exceed ``save_acts_cap_mb`` (the buffer lives from forward
    to backward, so an unbounded stream would overrun HBM at large
    batches). The undifferentiated primal never saves."""
    if save_acts and trunk_quant:
        raise ValueError("save_acts is bf16/f32-only (int8 was measured "
                         "slower; don't combine)")

    def _forward(weights, rayin, z, deltam, save=False):
        r, k = z.shape
        kpad, (zcol, dp) = _prep(z, deltam)
        rt = _rt_of(kpad, tile_target, r)
        rp = _round_up(r, rt)
        rayin_p = _pad_rows_to(rayin.astype(jnp.float32), rp)
        zcol = _pad_rows_to(zcol, rp)
        dp = _pad_rows_to(dp, rp)
        flat_f32 = _pad_pe_rows(flatten_weights(weights), with_transient=True)
        flat = cast_matrices(flat_f32, compute_dtype)
        qargs = quantize_trunk_int8(flat_f32) if trunk_quant else []
        out_shape = [jax.ShapeDtypeStruct((rp, ACC_COLS), jnp.float32)]
        out_specs = [_ray_spec(rt, ACC_COLS)]
        if save:
            out_shape.append(jax.ShapeDtypeStruct(
                (rp * kpad, N_TRUNK_ACTS_COLS), compute_dtype))
            out_specs.append(_pt_spec(rt * kpad, N_TRUNK_ACTS_COLS))
        outs = pl.pallas_call(
            functools.partial(_camera_fwd_kernel, compute_dtype, trunk_quant,
                              rt, kpad, save),
            out_shape=tuple(out_shape) if save else out_shape[0],
            grid=(rp // rt,),
            in_specs=[_ray_spec(rt, RAYIN_COLS), _ray_spec(rt, kpad),
                      _ray_spec(rt, kpad)]
                     + [_const_spec(wt.shape) for wt in flat]
                     + [_const_spec(q.shape) for q in qargs],
            out_specs=tuple(out_specs) if save else out_specs[0],
            compiler_params=_cparams(vmem_limit_mb),
            interpret=interpret,
        )(rayin_p, zcol, dp, *flat, *qargs)
        if save:
            return outs[0][:r], outs[1][:r * kpad]
        return outs[:r]

    _raw_forward = _forward   # pre-shard_map binding (closures are late-bound)

    def _forward_save(weights, rayin, z, deltam):
        return _raw_forward(weights, rayin, z, deltam, save=True)

    def _backward(weights, rayin, z, deltam, gacc, acts=None):
        r, k = z.shape
        saved = acts is not None
        kpad, (zcol, dp) = _prep(z, deltam)
        rt = _rt_of(kpad, bwd_tile_target, r)
        rp = _round_up(r, rt)
        rayin_p = _pad_rows_to(rayin.astype(jnp.float32), rp)
        zcol = _pad_rows_to(zcol, rp)
        dp = _pad_rows_to(dp, rp)
        gacc_p = _pad_rows_to(gacc.astype(jnp.float32), rp)
        extra = [_pad_rows_to(acts, rp * kpad)] if saved else []
        extra_specs = ([_pt_spec(rt * kpad, N_TRUNK_ACTS_COLS)]
                       if saved else [])
        flat_f32 = flatten_weights(weights)
        flat_f32p = _pad_pe_rows(flat_f32, with_transient=True)
        flat = cast_matrices(flat_f32p, compute_dtype)
        qargs = quantize_trunk_int8(flat_f32p) if trunk_quant else []
        out_shapes = ([jax.ShapeDtypeStruct((rp, RAYIN_COLS), jnp.float32)]
                      + [jax.ShapeDtypeStruct(wt.shape, jnp.float32) for wt in flat])
        out_specs = ([_ray_spec(rt, RAYIN_COLS)]
                     + [_const_spec(wt.shape) for wt in flat])
        outs = pl.pallas_call(
            functools.partial(_camera_bwd_kernel, compute_dtype, trunk_quant,
                              rt, kpad, saved),
            out_shape=tuple(out_shapes),
            grid=(rp // rt,),
            in_specs=[_ray_spec(rt, RAYIN_COLS), _ray_spec(rt, kpad),
                      _ray_spec(rt, kpad), _ray_spec(rt, ACC_COLS)]
                     + extra_specs
                     + [_const_spec(wt.shape) for wt in flat]
                     + [_const_spec(q.shape) for q in qargs],
            out_specs=tuple(out_specs),
            compiler_params=_cparams(vmem_limit_mb),
            interpret=interpret,
        )(rayin_p, zcol, dp, gacc_p, *extra, *flat, *qargs)
        d_rayin = outs[0][:r]
        from eonerf_code_tpu.ops.pallas.fused_field import _unpad_pe_rows

        d_weights = unflatten_weights([d.astype(wt.dtype)
                                       for d, wt in zip(
                                           _unpad_pe_rows(outs[1:],
                                                          with_transient=True),
                                           flat_f32)])
        return d_weights, d_rayin

    def _backward_saved(weights, rayin, z, deltam, gacc, acts):
        return _backward(weights, rayin, z, deltam, gacc, acts=acts)

    def _backward_rec(weights, rayin, z, deltam, gacc):
        return _backward(weights, rayin, z, deltam, gacc)

    if mesh is not None:
        from eonerf_code_tpu.ops.pallas.fused_field import _shard_bwd, _shard_fwd

        _forward_save = _shard_fwd(_forward_save, mesh, data_axis, n_out=2)
        _backward_saved = _shard_bwd(
            lambda w_, rayin, z, deltam, gacc, acts:
                _backward(w_, rayin, z, deltam, gacc, acts=acts),
            mesh, data_axis, n_pt_grads=1)
        _forward = _shard_fwd(_forward, mesh, data_axis)
        _backward_rec = _shard_bwd(_backward_rec, mesh, data_axis,
                                   n_pt_grads=1)

    def _use_saved(z_shape, allow_save):
        if not (save_acts and allow_save):
            return False
        r, k = z_shape
        return fits_saved_cap(r, k, compute_dtype, save_acts_cap_mb)

    def _make_vjp(allow_save):
        @jax.custom_vjp
        def camera(weights, rayin, z, deltam):
            return _forward(weights, rayin, z, deltam)

        def fwd(weights, rayin, z, deltam):
            if _use_saved(z.shape, allow_save):
                acc, acts = _forward_save(weights, rayin, z, deltam)
                return acc, (weights, rayin, z, deltam, acts)
            return (camera(weights, rayin, z, deltam),
                    (weights, rayin, z, deltam))

        def bwd(res, gacc):
            if len(res) == 5:
                weights, rayin, z, deltam, acts = res
                d_weights, d_rayin = _backward_saved(weights, rayin, z,
                                                     deltam, gacc, acts)
            else:
                weights, rayin, z, deltam = res
                d_weights, d_rayin = _backward_rec(weights, rayin, z, deltam,
                                                   gacc)
            return (d_weights, d_rayin, jnp.zeros_like(z),
                    jnp.zeros_like(deltam))

        camera.defvjp(fwd, bwd)
        return camera

    camera_save, camera_rec = _make_vjp(True), _make_vjp(False)

    def camera(weights, rayin, z, deltam, save_ok=True):
        """``save_ok`` (static) is the STEP-level all-or-nothing gate the
        renderer computes over every stream in the train step: a MIXED step
        (one kernel saved, its sibling recomputing) was measured
        pathological on-chip — bs 16384 / sc 64 ran at 3.8k rays/s vs 112k
        all-recompute, the live stream buffer on top of the recompute
        path's peak workspace overflowing HBM into host spills. The
        per-kernel cap above still applies on top of save_ok."""
        if not isinstance(save_ok, bool):
            raise TypeError(
                f"save_ok must be a static Python bool, got {type(save_ok)}; "
                "a traced value would silently bake in one branch")
        return (camera_save if save_ok else camera_rec)(
            weights, rayin, z, deltam)

    return camera


def make_fused_shadow(compute_dtype=jnp.bfloat16, tile_target=2048,
                      bwd_tile_target=1024, interpret=False,
                      vmem_limit_mb=64, mesh=None, data_axis="data",
                      trunk_quant=False, save_acts=False,
                      save_acts_cap_mb=8192):
    """Returns shadow(weights: FieldWeights, rayin (R,16), z (R,K),
    deltam (R,K), mask (R,K)) -> geo (R,) sun visibility, fused fwd+bwd.
    rayin rows 0:3 carry the shadow-march origin (gradients flow to it —
    the depth-gradient path), rows 3:6 the march direction. ``save_acts``
    as in make_fused_camera (the stream here is the density trunk's)."""
    if save_acts and trunk_quant:
        raise ValueError("save_acts is bf16/f32-only (int8 was measured "
                         "slower; don't combine)")

    def _forward(weights, rayin, z, deltam, mask, save=False):
        r, k = z.shape
        kpad, (zcol, dp, mp) = _prep(z, deltam, mask)
        rt = _rt_of(kpad, tile_target, r)
        rp = _round_up(r, rt)
        rayin_p = _pad_rows_to(rayin.astype(jnp.float32), rp)
        zcol = _pad_rows_to(zcol, rp)
        dp = _pad_rows_to(dp, rp)
        mp = _pad_rows_to(mp, rp)
        flat_f32p = _pad_pe_rows(density_subset(weights))
        flat = cast_matrices(flat_f32p, compute_dtype)
        qargs = quantize_trunk_int8(flat_f32p) if trunk_quant else []
        out_shape = [jax.ShapeDtypeStruct((rp, ACC_COLS), jnp.float32)]
        out_specs = [_ray_spec(rt, ACC_COLS)]
        if save:
            out_shape.append(jax.ShapeDtypeStruct(
                (rp * kpad, N_TRUNK_ACTS_COLS), compute_dtype))
            out_specs.append(_pt_spec(rt * kpad, N_TRUNK_ACTS_COLS))
        outs = pl.pallas_call(
            functools.partial(_shadow_fwd_kernel, compute_dtype, trunk_quant,
                              rt, kpad, save),
            out_shape=tuple(out_shape) if save else out_shape[0],
            grid=(rp // rt,),
            in_specs=[_ray_spec(rt, RAYIN_COLS), _ray_spec(rt, kpad),
                      _ray_spec(rt, kpad), _ray_spec(rt, kpad)]
                     + [_const_spec(wt.shape) for wt in flat]
                     + [_const_spec(q.shape) for q in qargs],
            out_specs=tuple(out_specs) if save else out_specs[0],
            compiler_params=_cparams(vmem_limit_mb),
            interpret=interpret,
        )(rayin_p, zcol, dp, mp, *flat, *qargs)
        if save:
            return outs[0][:r, 0], outs[1][:r * kpad]
        return outs[:r, 0]

    _raw_forward = _forward   # pre-shard_map binding (closures are late-bound)

    def _forward_save(weights, rayin, z, deltam, mask):
        return _raw_forward(weights, rayin, z, deltam, mask, save=True)

    def _backward(weights, rayin, z, deltam, mask, ggeo, acts=None):
        r, k = z.shape
        saved = acts is not None
        kpad, (zcol, dp, mp) = _prep(z, deltam, mask)
        rt = _rt_of(kpad, bwd_tile_target, r)
        rp = _round_up(r, rt)
        rayin_p = _pad_rows_to(rayin.astype(jnp.float32), rp)
        zcol = _pad_rows_to(zcol, rp)
        dp = _pad_rows_to(dp, rp)
        mp = _pad_rows_to(mp, rp)
        ggeo_p = _pad_rows_to(
            jnp.pad(ggeo.astype(jnp.float32).reshape(-1, 1),
                    ((0, 0), (0, ACC_COLS - 1))), rp)
        extra = [_pad_rows_to(acts, rp * kpad)] if saved else []
        extra_specs = ([_pt_spec(rt * kpad, N_TRUNK_ACTS_COLS)]
                       if saved else [])
        flat_f32 = density_subset(weights)
        flat_f32p = _pad_pe_rows(flat_f32)
        flat = cast_matrices(flat_f32p, compute_dtype)
        qargs = quantize_trunk_int8(flat_f32p) if trunk_quant else []
        out_shapes = ([jax.ShapeDtypeStruct((rp, RAYIN_COLS), jnp.float32)]
                      + [jax.ShapeDtypeStruct(wt.shape, jnp.float32) for wt in flat])
        out_specs = ([_ray_spec(rt, RAYIN_COLS)]
                     + [_const_spec(wt.shape) for wt in flat])
        outs = pl.pallas_call(
            functools.partial(_shadow_bwd_kernel, compute_dtype, trunk_quant,
                              rt, kpad, saved),
            out_shape=tuple(out_shapes),
            grid=(rp // rt,),
            in_specs=[_ray_spec(rt, RAYIN_COLS), _ray_spec(rt, kpad),
                      _ray_spec(rt, kpad), _ray_spec(rt, kpad),
                      _ray_spec(rt, ACC_COLS)]
                     + extra_specs
                     + [_const_spec(wt.shape) for wt in flat]
                     + [_const_spec(q.shape) for q in qargs],
            out_specs=tuple(out_specs),
            compiler_params=_cparams(vmem_limit_mb),
            interpret=interpret,
        )(rayin_p, zcol, dp, mp, ggeo_p, *extra, *flat, *qargs)
        d_rayin = outs[0][:r]
        from eonerf_code_tpu.ops.pallas.fused_field import _unpad_pe_rows

        d_flat = _unpad_pe_rows(outs[1:])
        z_ = jnp.zeros_like
        dw = FieldWeights(
            trunk_w=tuple(d.astype(w_.dtype) for d, w_ in zip(d_flat[0:8], flat_f32[0:8])),
            trunk_b=tuple(d.astype(w_.dtype) for d, w_ in zip(d_flat[8:16], flat_f32[8:16])),
            sigma_w=d_flat[16].astype(flat_f32[16].dtype),
            sigma_b=d_flat[17].astype(flat_f32[17].dtype),
            bott_w=z_(weights.bott_w), bott_b=z_(weights.bott_b),
            alb_w0=z_(weights.alb_w0), alb_b0=z_(weights.alb_b0),
            alb_w1=z_(weights.alb_w1), alb_b1=z_(weights.alb_b1),
            tr_w=tuple(z_(a) for a in weights.tr_w),
            tr_b=tuple(z_(a) for a in weights.tr_b),
            ts_w=z_(weights.ts_w), ts_b=z_(weights.ts_b),
            tb_w=z_(weights.tb_w), tb_b=z_(weights.tb_b))
        return dw, d_rayin

    def _backward_saved(weights, rayin, z, deltam, mask, ggeo, acts):
        return _backward(weights, rayin, z, deltam, mask, ggeo, acts=acts)

    def _backward_rec(weights, rayin, z, deltam, mask, ggeo):
        return _backward(weights, rayin, z, deltam, mask, ggeo)

    if mesh is not None:
        from eonerf_code_tpu.ops.pallas.fused_field import _shard_bwd, _shard_fwd

        _forward_save = _shard_fwd(_forward_save, mesh, data_axis, n_out=2)
        _backward_saved = _shard_bwd(
            lambda w_, rayin, z, deltam, mask, ggeo, acts:
                _backward(w_, rayin, z, deltam, mask, ggeo, acts=acts),
            mesh, data_axis, n_pt_grads=1)
        _forward = _shard_fwd(_forward, mesh, data_axis)
        _backward_rec = _shard_bwd(_backward_rec, mesh, data_axis,
                                   n_pt_grads=1)

    def _use_saved(z_shape, allow_save):
        if not (save_acts and allow_save):
            return False
        r, k = z_shape
        return fits_saved_cap(r, k, compute_dtype, save_acts_cap_mb)

    def _make_vjp(allow_save):
        @jax.custom_vjp
        def shadow(weights, rayin, z, deltam, mask):
            return _forward(weights, rayin, z, deltam, mask)

        def fwd(weights, rayin, z, deltam, mask):
            if _use_saved(z.shape, allow_save):
                geo, acts = _forward_save(weights, rayin, z, deltam, mask)
                return geo, (weights, rayin, z, deltam, mask, acts)
            return (shadow(weights, rayin, z, deltam, mask),
                    (weights, rayin, z, deltam, mask))

        def bwd(res, ggeo):
            if len(res) == 6:
                weights, rayin, z, deltam, mask, acts = res
                d_weights, d_rayin = _backward_saved(weights, rayin, z,
                                                     deltam, mask, ggeo, acts)
            else:
                weights, rayin, z, deltam, mask = res
                d_weights, d_rayin = _backward_rec(weights, rayin, z, deltam,
                                                   mask, ggeo)
            return (d_weights, d_rayin, jnp.zeros_like(z),
                    jnp.zeros_like(deltam), jnp.zeros_like(mask))

        shadow.defvjp(fwd, bwd)
        return shadow

    shadow_save, shadow_rec = _make_vjp(True), _make_vjp(False)

    def shadow(weights, rayin, z, deltam, mask, save_ok=True):
        """``save_ok``: step-level all-or-nothing gate — see
        make_fused_camera's wrapper docstring for the measured mixed-mode
        pathology it prevents."""
        if not isinstance(save_ok, bool):
            raise TypeError(
                f"save_ok must be a static Python bool, got {type(save_ok)}; "
                "a traced value would silently bake in one branch")
        return (shadow_save if save_ok else shadow_rec)(
            weights, rayin, z, deltam, mask)

    return shadow


def make_fused_coarse(compute_dtype=jnp.bfloat16, tile_target=2048,
                      interpret=False, vmem_limit_mb=64, mesh=None,
                      data_axis="data", trunk_quant=False):
    """Returns coarse(weights: FieldWeights, rayin (R,16), z (R,K),
    deltam (R,K)) -> per-sample compositing weights (R, K), the PDF source
    for hierarchical importance sampling. rayin rows 0:3/3:6 carry the ray
    origin/direction; deltam must arrive as delta * valid_mask (masked
    samples then contribute exactly zero extinction, matching
    render_weights' sigma masking). Forward-only — outputs are consumed
    under stop_gradient by sample_pdf, so there is no backward kernel; the
    wrapper stop_gradients both operands and results to keep any
    accidental differentiation from reaching the pallas_call."""

    def _forward(weights, rayin, z, deltam):
        r, k = z.shape
        kpad, (zcol, dp) = _prep(z, deltam)
        rt = _rt_of(kpad, tile_target, r)
        rp = _round_up(r, rt)
        rayin_p = _pad_rows_to(rayin.astype(jnp.float32), rp)
        zcol = _pad_rows_to(zcol, rp)
        dp = _pad_rows_to(dp, rp)
        flat_f32p = _pad_pe_rows(density_subset(weights))
        flat = cast_matrices(flat_f32p, compute_dtype)
        qargs = quantize_trunk_int8(flat_f32p) if trunk_quant else []
        out = pl.pallas_call(
            functools.partial(_coarse_fwd_kernel, compute_dtype, trunk_quant,
                              rt, kpad),
            out_shape=jax.ShapeDtypeStruct((rp, kpad), jnp.float32),
            grid=(rp // rt,),
            in_specs=[_ray_spec(rt, RAYIN_COLS), _ray_spec(rt, kpad),
                      _ray_spec(rt, kpad)]
                     + [_const_spec(wt.shape) for wt in flat]
                     + [_const_spec(q.shape) for q in qargs],
            out_specs=_ray_spec(rt, kpad),
            compiler_params=_cparams(vmem_limit_mb),
            interpret=interpret,
        )(rayin_p, zcol, dp, *flat, *qargs)
        return out[:r, :k]

    if mesh is not None:
        from eonerf_code_tpu.ops.pallas.fused_field import _shard_fwd

        _forward = _shard_fwd(_forward, mesh, data_axis)

    def coarse(weights, rayin, z, deltam):
        args = jax.lax.stop_gradient((weights, rayin, z, deltam))
        return jax.lax.stop_gradient(_forward(*args))

    return coarse
