"""Intra-kernel cost isolation for the fused field FORWARD kernel.

Times stripped-down kernel variants on-chip to attribute the gap between
measured kernel time and the matmul speed-of-light:

  full      - the production forward (PE + trunk + all heads)
  trunk     - PE + trunk + sigma head only (density kernel shape)
  nope      - trunk fed by a LINEAR 64-wide encoding (no sin/cos):
              isolates the transcendental cost
  norelu    - trunk without relu+cast between layers (pure matmul chain):
              isolates the per-layer VPU relu/cast cost
  nocast    - trunk with f32 activations end-to-end (no bf16 casts),
              weights still bf16
  mm_only   - 8 chained (T,256)x(256,256) matmuls w/ bf16 cast (the MXU
              reference slab for efficiency accounting)

Each runs `iters` chained invocations inside ONE jit (dispatch amortized,
dependency-serialized). Prints ms/call and implied TFLOP/s.

Usage: python scripts/bench_kernel_variants.py [n_points] [tile] [iters]
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eonerf_code_tpu.models.eonerf import EONerfField
from eonerf_code_tpu.ops.pallas.fused_field import (
    FieldWeights, N_WEIGHTS, _const_spec, _mm, _pe64, _pe_pattern64,
    _softplus, _tile_spec, _trunk_fwd, cast_matrices, density_subset,
    flatten_weights, pack_params, unflatten_weights, _pad_pe_rows,
    N_DENSITY_WEIGHTS,
)

DT = jnp.bfloat16


def _lin64(x):
    """Linear stand-in for the PE: same shapes/matmul, no sin/cos."""
    xb = jax.lax.dot_general(x, _pe_pattern64(), (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return xb


def kernel_full(pos_ref, emb_ref, *rest):
    weight_refs, out_ref = rest[:N_WEIGHTS], rest[N_WEIGHTS]
    w = unflatten_weights([r[:] for r in weight_refs])
    pe = _pe64(pos_ref[:].astype(jnp.float32), DT).astype(DT)
    h = _trunk_fwd(pe, w, DT)[-1]
    sigma = _softplus(_mm(h, w.sigma_w, w.sigma_b))
    bott = _mm(h, w.bott_w, w.bott_b).astype(DT)
    ah = jnp.maximum(_mm(bott, w.alb_w0, w.alb_b0), 0.0).astype(DT)
    albedo = jax.nn.sigmoid(_mm(ah, w.alb_w1, w.alb_b1))
    emb64 = jnp.pad(emb_ref[:].astype(DT), ((0, 0), (0, 60)))
    t = jnp.concatenate([bott, emb64], axis=-1)
    for i in range(4):
        t = jnp.maximum(_mm(t, w.tr_w[i], w.tr_b[i]), 0.0).astype(DT)
    ts = jax.nn.sigmoid(_mm(t, w.ts_w, w.ts_b))
    tb = _softplus(_mm(t, w.tb_w, w.tb_b))
    pad = jnp.zeros_like(ts)
    out_ref[:] = jnp.concatenate([sigma, albedo, ts, tb, pad, pad], axis=-1)


def kernel_trunk(pos_ref, *rest):
    weight_refs, out_ref = rest[:N_DENSITY_WEIGHTS], rest[N_DENSITY_WEIGHTS]
    tw = [r[:] for r in weight_refs[:8]]
    tb_ = [r[:] for r in weight_refs[8:16]]
    sw, sb = weight_refs[16][:], weight_refs[17][:]
    w = FieldWeights(tuple(tw), tuple(tb_), sw, sb, *([None] * 12))
    pe = _pe64(pos_ref[:].astype(jnp.float32), DT)
    h = _trunk_fwd(pe.astype(DT), w, DT)[-1]
    out_ref[:] = _softplus(_mm(h, sw, sb))


def kernel_nope(pos_ref, *rest):
    weight_refs, out_ref = rest[:N_DENSITY_WEIGHTS], rest[N_DENSITY_WEIGHTS]
    tw = [r[:] for r in weight_refs[:8]]
    tb_ = [r[:] for r in weight_refs[8:16]]
    sw, sb = weight_refs[16][:], weight_refs[17][:]
    w = FieldWeights(tuple(tw), tuple(tb_), sw, sb, *([None] * 12))
    pe = _lin64(pos_ref[:].astype(jnp.float32)).astype(DT)
    h = _trunk_fwd(pe, w, DT)[-1]
    out_ref[:] = _softplus(_mm(h, sw, sb))


def kernel_norelu(pos_ref, *rest):
    weight_refs, out_ref = rest[:N_DENSITY_WEIGHTS], rest[N_DENSITY_WEIGHTS]
    tw = [r[:] for r in weight_refs[:8]]
    tb_ = [r[:] for r in weight_refs[8:16]]
    sw, sb = weight_refs[16][:], weight_refs[17][:]
    w = FieldWeights(tuple(tw), tuple(tb_), sw, sb, *([None] * 12))
    pe = _pe64(pos_ref[:].astype(jnp.float32), DT)
    h = pe.astype(DT)
    for i in range(8):
        inp = jnp.concatenate([h, pe.astype(DT)], axis=-1) if i == 5 else h
        h = _mm(inp, w.trunk_w[i], w.trunk_b[i]).astype(DT)
    out_ref[:] = _softplus(_mm(h, sw, sb))


def kernel_nocast(pos_ref, *rest):
    weight_refs, out_ref = rest[:N_DENSITY_WEIGHTS], rest[N_DENSITY_WEIGHTS]
    tw = [r[:] for r in weight_refs[:8]]
    tb_ = [r[:] for r in weight_refs[8:16]]
    sw, sb = weight_refs[16][:], weight_refs[17][:]
    pe = _pe64(pos_ref[:].astype(jnp.float32))
    h = pe
    for i in range(8):
        inp = jnp.concatenate([h, pe], axis=-1) if i == 5 else h
        pre = jax.lax.dot_general(inp.astype(DT), tw[i], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32) + tb_[i]
        h = jnp.maximum(pre, 0.0)
    out_ref[:] = _softplus(_mm(h.astype(DT), sw, sb))


def kernel_mm_only(pos_ref, *rest):
    # 8 chained 256x256 matmuls + cast; ignores pos except row count
    weight_refs, out_ref = rest[:N_DENSITY_WEIGHTS], rest[N_DENSITY_WEIGHTS]
    tw = [r[:] for r in weight_refs[:8]]
    n = pos_ref.shape[0]
    h = jnp.zeros((n, 256), DT) + pos_ref[0, 0].astype(DT)
    for _ in range(8):
        h = jax.lax.dot_general(h, tw[1], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(DT)
    out_ref[:] = h[:, :1].astype(jnp.float32)


def _mm_interleaved(pos_ref, weight_refs, out_ref, nsub):
    """Same chained matmuls, but the tile is split into nsub row-blocks and
    each layer runs over ALL blocks before advancing — consecutive matmuls
    share the stationary weight and independent chains can overlap
    MXU/VPU."""
    tw = [r[:] for r in weight_refs[:8]]
    n = pos_ref.shape[0]
    s = n // nsub
    hs = [jnp.zeros((s, 256), DT) + pos_ref[i * s, 0].astype(DT)
          for i in range(nsub)]
    for _ in range(8):
        hs = [jax.lax.dot_general(h, tw[1], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32).astype(DT)
              for h in hs]
    out = jnp.concatenate([h[:, :1] for h in hs], axis=0)
    out_ref[:] = out.astype(jnp.float32)


def kernel_mm_merged2(pos_ref, *rest):
    """16 chained matmuls over the tile in ONE kernel body — the slab proxy
    for merging the camera and shadow trunk evaluations into one GEMM
    stream per tile (VERDICT r3 item 2a): same weights stay VMEM-resident
    across both 8-layer passes and the per-launch pipeline fill/drain is
    amortized over 2x the work. If this runs at a materially higher
    fraction of peak than mm_only, the step's two fused kernels should be
    merged; if it matches mm_only, launches/weight-residency are NOT what
    the 54-55%% ceiling is made of."""
    weight_refs, out_ref = rest[:N_DENSITY_WEIGHTS], rest[N_DENSITY_WEIGHTS]
    tw = [r[:] for r in weight_refs[:8]]
    n = pos_ref.shape[0]
    h = jnp.zeros((n, 256), DT) + pos_ref[0, 0].astype(DT)
    for _ in range(8):          # "camera" trunk pass
        h = jax.lax.dot_general(h, tw[1], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(DT)
    g = h                       # "shadow" trunk pass over the same rows
    for _ in range(8):
        g = jax.lax.dot_general(g, tw[1], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(DT)
    out_ref[:] = g[:, :1].astype(jnp.float32)


def kernel_mm_merged4(pos_ref, *rest):
    """32 chained matmuls per body — saturation probe for the merged-chain
    effect (mm_merged2: 70.5%% vs mm_only's 54-57%%)."""
    weight_refs, out_ref = rest[:N_DENSITY_WEIGHTS], rest[N_DENSITY_WEIGHTS]
    tw = [r[:] for r in weight_refs[:8]]
    n = pos_ref.shape[0]
    h = jnp.zeros((n, 256), DT) + pos_ref[0, 0].astype(DT)
    for _ in range(32):
        h = jax.lax.dot_general(h, tw[1], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(DT)
    out_ref[:] = h[:, :1].astype(jnp.float32)


def kernel_mm_seq2(pos_ref, *rest):
    """Two SEQUENTIAL full-row 8-chains over the tile's two row halves —
    distinguishes the warm-up hypothesis: if a second INDEPENDENT chain in
    the same body also runs at marginal (near-ideal) speed like merged2's
    dependent one, every production kernel can amortize the per-body
    warm-up by processing 2 sub-tiles per grid step, no cross-kernel
    fusion needed. (mm_int2 interleaves the same split and was flat — but
    it HALVES rows per matmul; this keeps full-row matmuls per chain.)"""
    weight_refs, out_ref = rest[:N_DENSITY_WEIGHTS], rest[N_DENSITY_WEIGHTS]
    tw = [r[:] for r in weight_refs[:8]]
    n = pos_ref.shape[0]
    s = n // 2
    outs = []
    for b in range(2):
        h = jnp.zeros((s, 256), DT) + pos_ref[b * s, 0].astype(DT)
        for _ in range(8):
            h = jax.lax.dot_general(h, tw[1], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ).astype(DT)
        outs.append(h[:, :1])
    out_ref[:] = jnp.concatenate(outs, axis=0).astype(jnp.float32)


def kernel_trunk_int2(pos_ref, *rest):
    """The REAL trunk (PE + 8-layer chain + skip + relu + casts) over two
    independent row blocks in one kernel body — the slab proxy for
    cross-block VPU/MXU software pipelining (VERDICT r3 item 2b): block B's
    transcendental PE has no data dependence on block A's matmul chain, so
    the scheduler may overlap the VPU sin/cos (~23%% of a trunk pass,
    STATUS round-3) with MXU work. Compare against `trunk` (same math,
    one serial block)."""
    weight_refs, out_ref = rest[:N_DENSITY_WEIGHTS], rest[N_DENSITY_WEIGHTS]
    tw = [r[:] for r in weight_refs[:8]]
    tb_ = [r[:] for r in weight_refs[8:16]]
    sw, sb = weight_refs[16][:], weight_refs[17][:]
    n = pos_ref.shape[0]
    s = n // 2
    outs = []
    pes = [_pe64(pos_ref[i * s:(i + 1) * s].astype(jnp.float32)).astype(DT)
           for i in range(2)]
    hs = list(pes)
    for i in range(8):
        nxt = []
        for b in range(2):
            inp = (jnp.concatenate([hs[b], pes[b]], axis=-1)
                   if i == 5 else hs[b])
            nxt.append(jnp.maximum(_mm(inp, tw[i], tb_[i]), 0.0).astype(DT))
        hs = nxt
    outs = [_softplus(_mm(h, sw, sb)) for h in hs]
    out_ref[:] = jnp.concatenate(outs, axis=0)


def kernel_mm_int2(pos_ref, *rest):
    _mm_interleaved(pos_ref, rest[:N_DENSITY_WEIGHTS], rest[N_DENSITY_WEIGHTS], 2)


def kernel_mm_int4(pos_ref, *rest):
    _mm_interleaved(pos_ref, rest[:N_DENSITY_WEIGHTS], rest[N_DENSITY_WEIGHTS], 4)


def kernel_mm_i8(pos_ref, *rest):
    """8 chained int8 matmuls with realistic per-layer requantization:
    int32 accum -> f32 scale -> clamp -> int8. Measures the int8 slab roof
    INCLUDING the VPU requant cost (v5e nameplate: 394 int8 TOPS = 2x bf16).
    Weights quantized in-kernel once (hoisted by Mosaic; cost amortized over
    the 8 reuses is part of what we measure)."""
    weight_refs, out_ref = rest[:N_DENSITY_WEIGHTS], rest[N_DENSITY_WEIGHTS]
    w8 = jnp.clip(weight_refs[1][:].astype(jnp.float32) * 127.0,
                  -127.0, 127.0).astype(jnp.int8)
    n = pos_ref.shape[0]
    h8 = (jnp.zeros((n, 256), jnp.float32)
          + pos_ref[0, 0]).astype(jnp.int8)
    inv = jnp.float32(1.0 / (127.0 * 127.0))
    for _ in range(8):
        acc = jax.lax.dot_general(h8, w8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        hf = acc.astype(jnp.float32) * inv
        h8 = jnp.clip(hf * 127.0, -127.0, 127.0).astype(jnp.int8)
    out_ref[:] = h8[:, :1].astype(jnp.float32)


def kernel_mm_i8_dyn(pos_ref, *rest):
    """Like mm_i8 but with the REALISTIC per-layer requant: dynamic
    per-tensor amax for the activation scale + round-to-nearest. This is the
    exact per-layer cost the integrated int8 trunk would pay."""
    weight_refs, out_ref = rest[:N_DENSITY_WEIGHTS], rest[N_DENSITY_WEIGHTS]
    w8 = jnp.clip(weight_refs[1][:].astype(jnp.float32) * 127.0,
                  -127.0, 127.0).astype(jnp.int8)
    n = pos_ref.shape[0]
    hf = jnp.zeros((n, 256), jnp.float32) + pos_ref[0, 0]
    for _ in range(8):
        amax = jnp.max(jnp.abs(hf), axis=(0, 1), keepdims=True)
        s = jnp.maximum(amax, 1e-12) * jnp.float32(1.0 / 127.0)
        h8 = jnp.round(hf / s).astype(jnp.int8)
        acc = jax.lax.dot_general(h8, w8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        hf = acc.astype(jnp.float32) * (s * jnp.float32(1.0 / 127.0))
    out_ref[:] = hf[:, :1]


def kernel_mm_f8(pos_ref, *rest):
    """8 chained float8_e4m3 matmuls (if Mosaic lowers them natively on this
    chip; v5e has int8 MXU, fp8 may emulate)."""
    weight_refs, out_ref = rest[:N_DENSITY_WEIGHTS], rest[N_DENSITY_WEIGHTS]
    f8 = jnp.float8_e4m3fn
    wq = weight_refs[1][:].astype(f8)
    n = pos_ref.shape[0]
    h = (jnp.zeros((n, 256), jnp.float32) + pos_ref[0, 0]).astype(f8)
    for _ in range(8):
        acc = jax.lax.dot_general(h, wq, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        h = acc.astype(f8)
    out_ref[:] = h[:, :1].astype(jnp.float32)


def kernel_mm_k512(pos_ref, *rest):
    """4 chained (T,512)x(512,512) bf16 matmuls — same FLOPs as the 8x256
    chain but double the MXU accumulation depth K. Tests whether the 54%
    slab ceiling is a small-K effect."""
    weight_refs, out_ref = rest[:N_DENSITY_WEIGHTS], rest[N_DENSITY_WEIGHTS]
    w256 = weight_refs[1][:]
    wbig = jnp.concatenate(
        [jnp.concatenate([w256, w256], axis=1),
         jnp.concatenate([w256, w256], axis=1)], axis=0) * jnp.bfloat16(0.25)
    n = pos_ref.shape[0]
    h = jnp.zeros((n, 512), DT) + pos_ref[0, 0].astype(DT)
    for _ in range(4):
        h = jax.lax.dot_general(h, wbig, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(DT)
    out_ref[:] = h[:, :1].astype(jnp.float32)


def kernel_mm_i8_k512(pos_ref, *rest):
    """4 chained (T,512)x(512,512) int8 matmuls + requant — the int8 roof at
    doubled accumulation depth."""
    weight_refs, out_ref = rest[:N_DENSITY_WEIGHTS], rest[N_DENSITY_WEIGHTS]
    w256 = weight_refs[1][:].astype(jnp.float32)
    wbig = jnp.concatenate(
        [jnp.concatenate([w256, w256], axis=1),
         jnp.concatenate([w256, w256], axis=1)], axis=0) * 0.25
    w8 = jnp.clip(wbig * 127.0, -127.0, 127.0).astype(jnp.int8)
    n = pos_ref.shape[0]
    h8 = (jnp.zeros((n, 512), jnp.float32) + pos_ref[0, 0]).astype(jnp.int8)
    inv = jnp.float32(1.0 / (127.0 * 127.0))
    for _ in range(4):
        acc = jax.lax.dot_general(h8, w8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        hf = acc.astype(jnp.float32) * inv
        h8 = jnp.clip(hf * 127.0, -127.0, 127.0).astype(jnp.int8)
    out_ref[:] = h8[:, :1].astype(jnp.float32)


# ---------------------------------------------------------------------------
# backward-pass slab variants: recompute vs saved activations
#
# The production backward kernels recompute the trunk forward in-kernel
# (flash-style) before dgrad/wgrad: 3 chained-matmul passes of MXU time.
# The alternative spends (otherwise idle) HBM bandwidth instead: the forward
# additionally WRITES the 8 post-relu activations (n, 2048) bf16, and the
# backward READS them and skips the recompute (2 passes). These variants
# measure both sides of that trade at slab level:
#
#   mm_fwd_save  - fwd chain + streaming the (tile, 2048) activations out
#   mm_bwd_rec   - recompute fwd + dgrad chain + wgrad outers  (3x slab)
#   mm_bwd_saved - read saved acts + dgrad chain + wgrad outers (2x slab)
#
# Decision rule: adopt saved-acts iff
#   t(mm_fwd_save) + t(mm_bwd_saved)  <  t(mm_only) + t(mm_bwd_rec)
# ---------------------------------------------------------------------------


def kernel_mm_fwd_save(pos_ref, *rest):
    weight_refs = rest[:N_DENSITY_WEIGHTS]
    out_ref, acts_ref = rest[N_DENSITY_WEIGHTS], rest[N_DENSITY_WEIGHTS + 1]
    tw = [r[:] for r in weight_refs[:8]]
    n = pos_ref.shape[0]
    h = jnp.zeros((n, 256), DT) + pos_ref[0, 0].astype(DT)
    for i in range(8):
        h = jnp.maximum(
            jax.lax.dot_general(h, tw[1], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32),
            0.0).astype(DT)
        acts_ref[:, 256 * i:256 * (i + 1)] = h
    out_ref[:] = h[:, :1].astype(jnp.float32)


def _bwd_core(g, acts, tw, dw_refs, first):
    """Shared dgrad+wgrad chain: acts[i] = post-relu output of layer i,
    acts[-1] (i.e. index -1 handled by caller) = layer input."""
    for i in range(7, -1, -1):
        # f32 compare: Mosaic has no bf16 cmpf (matches the
        # production kernels' _relu_mask/_masks_from_acts rule)
        mask = (acts[i].astype(jnp.float32) > 0).astype(DT)
        g = g * mask
        inp = acts[i - 1] if i > 0 else acts[8]   # acts[8] = layer-0 input
        dw = jax.lax.dot_general(inp, g, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ref = dw_refs[i]

        @pl.when(first)
        def _(ref=ref, dw=dw):
            ref[:] = dw

        @pl.when(jnp.logical_not(first))
        def _(ref=ref, dw=dw):
            ref[:] = ref[:] + dw
        g = jax.lax.dot_general(g, tw[1], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(DT)
    return g


def kernel_mm_bwd_rec(pos_ref, *rest):
    weight_refs = rest[:N_DENSITY_WEIGHTS]
    out_ref = rest[N_DENSITY_WEIGHTS]
    dw_refs = rest[N_DENSITY_WEIGHTS + 1:]
    tw = [r[:] for r in weight_refs[:8]]
    n = pos_ref.shape[0]
    h0 = jnp.zeros((n, 256), DT) + pos_ref[0, 0].astype(DT)
    acts = []
    h = h0
    for i in range(8):
        h = jnp.maximum(
            jax.lax.dot_general(h, tw[1], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32),
            0.0).astype(DT)
        acts.append(h)
    acts.append(h0)
    g = jnp.zeros((n, 256), DT) + pos_ref[0, 1].astype(DT)
    g = _bwd_core(g, acts, tw, dw_refs, pl.program_id(0) == 0)
    out_ref[:] = g[:, :1].astype(jnp.float32)


def kernel_mm_bwd_saved(pos_ref, acts_ref, *rest):
    weight_refs = rest[:N_DENSITY_WEIGHTS]
    out_ref = rest[N_DENSITY_WEIGHTS]
    dw_refs = rest[N_DENSITY_WEIGHTS + 1:]
    tw = [r[:] for r in weight_refs[:8]]
    n = pos_ref.shape[0]
    h0 = jnp.zeros((n, 256), DT) + pos_ref[0, 0].astype(DT)
    acts = [acts_ref[:, 256 * i:256 * (i + 1)] for i in range(8)]
    acts.append(h0)
    g = jnp.zeros((n, 256), DT) + pos_ref[0, 1].astype(DT)
    g = _bwd_core(g, acts, tw, dw_refs, pl.program_id(0) == 0)
    out_ref[:] = g[:, :1].astype(jnp.float32)


def build_bwd(variant, n, tile):
    field = EONerfField(n_images=10, compute_dtype=DT)
    params = field.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 3)),
                        jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32),
                        method="init_all")
    w = pack_params(params)
    flat = _pad_pe_rows(cast_matrices(density_subset(w), DT))
    saved = variant == "mm_bwd_saved"
    save_out = variant == "mm_fwd_save"
    kern = {"mm_fwd_save": kernel_mm_fwd_save,
            "mm_bwd_rec": kernel_mm_bwd_rec,
            "mm_bwd_saved": kernel_mm_bwd_saved}[variant]
    out_shapes = [jax.ShapeDtypeStruct((n, 1), jnp.float32)]
    out_specs = [_tile_spec(tile, 1)]
    if save_out:
        out_shapes.append(jax.ShapeDtypeStruct((n, 2048), DT))
        out_specs.append(_tile_spec(tile, 2048))
    else:
        out_shapes += [jax.ShapeDtypeStruct((256, 256), jnp.float32)] * 8
        out_specs += [_const_spec((256, 256))] * 8

    def fn(pos, acts):
        ins = [pos] + ([acts] if saved else [])
        in_specs = [_tile_spec(tile, 3)] + \
            ([_tile_spec(tile, 2048)] if saved else [])
        return pl.pallas_call(
            kern,
            out_shape=tuple(out_shapes),
            grid=(n // tile,),
            in_specs=in_specs + [_const_spec(x.shape) for x in flat],
            out_specs=tuple(out_specs),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 2**20),
        )(*ins, *flat)

    @jax.jit
    def chained(pos, acts, iters_arr):
        def body(c, _):
            outs = fn(pos * (1.0 + c * 1e-20), acts)
            return outs[0][0, 0] * 1e-20, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), iters_arr)
        return c

    return chained


def build(variant, n, tile):
    field = EONerfField(n_images=10, compute_dtype=DT)
    params = field.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 3)),
                        jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32),
                        method="init_all")
    w = pack_params(params)
    full = variant == "full"
    if full:
        flat = _pad_pe_rows(cast_matrices(flatten_weights(w), DT), with_transient=True)
        kern, n_out = kernel_full, 8
        kernel_args = 2
    else:
        flat = _pad_pe_rows(cast_matrices(density_subset(w), DT))
        kern = {"trunk": kernel_trunk, "nope": kernel_nope,
                "norelu": kernel_norelu, "nocast": kernel_nocast,
                "mm_only": kernel_mm_only, "mm_int2": kernel_mm_int2,
                "mm_int4": kernel_mm_int4, "mm_i8": kernel_mm_i8,
                "mm_i8_dyn": kernel_mm_i8_dyn,
                "mm_f8": kernel_mm_f8, "mm_k512": kernel_mm_k512,
                "mm_i8_k512": kernel_mm_i8_k512,
                "mm_merged2": kernel_mm_merged2,
                "mm_merged4": kernel_mm_merged4,
                "mm_seq2": kernel_mm_seq2,
                "trunk_int2": kernel_trunk_int2}[variant]
        n_out = 1
        kernel_args = 1

    def fn(pos, emb):
        ins = [pos, emb][:kernel_args]
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n, n_out), jnp.float32),
            grid=(n // tile,),
            in_specs=[_tile_spec(tile, 3), _tile_spec(tile, 4)][:kernel_args]
                     + [_const_spec(x.shape) for x in flat],
            out_specs=_tile_spec(tile, n_out),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        )(*ins, *flat)

    @jax.jit
    def chained(pos, emb, iters_arr):
        def body(c, _):
            out = fn(pos * (1.0 + c * 1e-20), emb)
            return out[0, 0] * 1e-20, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), iters_arr)
        return c

    return chained


def flops(variant, n):
    trunk = 2 * (64 * 256 + 6 * 256 * 256 + 320 * 256)
    heads_full = 2 * (256 + 256 * 256 + 256 * 128 + 128 * 3
                      + 320 * 128 + 3 * 128 * 128 + 2 * 128)
    per_pt = {"full": trunk + heads_full, "trunk": trunk + 512,
              "nope": trunk + 512, "norelu": trunk + 512,
              "nocast": trunk + 512, "mm_only": 2 * 8 * 256 * 256,
              "mm_merged2": 2 * 16 * 256 * 256,
              "mm_merged4": 2 * 32 * 256 * 256,
              "mm_seq2": 2 * 8 * 256 * 256,
              "trunk_int2": trunk + 512,
              "mm_int2": 2 * 8 * 256 * 256,
              "mm_int4": 2 * 8 * 256 * 256,
              "mm_i8": 2 * 8 * 256 * 256,
              "mm_i8_dyn": 2 * 8 * 256 * 256,
              "mm_f8": 2 * 8 * 256 * 256,
              "mm_k512": 2 * 4 * 512 * 512,
              "mm_i8_k512": 2 * 4 * 512 * 512,
              "mm_fwd_save": 2 * 8 * 256 * 256,
              "mm_bwd_rec": 2 * 24 * 256 * 256,
              "mm_bwd_saved": 2 * 16 * 256 * 256}[variant]
    return per_pt * n


def main(n=1040384, tile=2048, iters=10, only=None):
    n = (n // tile) * tile
    key = jax.random.PRNGKey(1)
    pos = jax.random.uniform(key, (n, 3), minval=-1, maxval=1)
    emb = jax.random.normal(key, (n, 4))
    iters_arr = jnp.zeros((iters,))
    variants = only.split(",") if only else (
        "full", "trunk", "nope", "norelu", "nocast", "mm_only")
    acts = None
    for variant in variants:
        print(f"building {variant}...", flush=True)
        if variant.startswith(("mm_fwd_save", "mm_bwd")):
            if acts is None:
                acts = jax.random.normal(key, (n, 2048), DT)
            chained = functools.partial(build_bwd(variant, n, tile),
                                        acts=acts)
            c = chained(pos, iters_arr=iters_arr)
            _ = float(c)
            t0 = time.perf_counter()
            c = chained(pos, iters_arr=iters_arr)
            _ = float(c)
            dt = (time.perf_counter() - t0) / iters
            f = flops(variant, n)
            print(f"{variant:12s} tile={tile}  {dt*1e3:7.2f} ms  "
                  f"{f/dt/1e12:6.1f} TFLOP/s  ({100*f/dt/1e12/197:4.1f}% peak)",
                  flush=True)
            continue
        chained = build(variant, n, tile)
        c = chained(pos, emb, iters_arr)
        _ = float(c)
        t0 = time.perf_counter()
        c = chained(pos, emb, iters_arr)
        _ = float(c)
        dt = (time.perf_counter() - t0) / iters
        f = flops(variant, n)
        print(f"{variant:8s} tile={tile}  {dt*1e3:7.2f} ms  "
              f"{f/dt/1e12:6.1f} TFLOP/s  ({100*f/dt/1e12/197:4.1f}% peak)",
              flush=True)


if __name__ == "__main__":
    only = None
    args = []
    for a in sys.argv[1:]:
        if a.isdigit():
            args.append(int(a))
        else:
            only = a
    main(*args, only=only)
