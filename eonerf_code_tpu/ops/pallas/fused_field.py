"""Fused EO-NeRF field evaluation as Pallas TPU kernels.

The training hot loop evaluates ~10^5..10^6 sample points per step through
the 8x256 trunk + heads (SURVEY §3.2). Left to XLA, every layer's (N, 256)
activation round-trips HBM, and the BACKWARD additionally re-reads every
saved activation — measured on-chip (scripts/profile_step.py) the XLA grad
step runs at ~56 TFLOP/s and anti-scales with batch size because the step
is HBM-bound (~50 GB of activation traffic per bs=8192 step). These kernels
remove that wall: ALL weights and the running activations stay in VMEM and
only points stream in / outputs + gradients stream out (~0.2 GB per step).

- `make_fused_field()(weights, pos, emb)` -> (sigma, albedo, t_s, t_beta):
  the per-sample heads of EONerfField.__call__ (the per-ray ambient head
  stays in XLA — it is O(rays), not O(samples)).
- `make_fused_density()(weights, pos)` -> sigma (shadow pass, occupancy).

Both are `jax.custom_vjp` ops whose BACKWARD is also one Pallas kernel per
tile: the forward is recomputed in VMEM (flash-style rematerialization) and
gradients for the inputs and every weight are produced in a single pass;
weight gradients accumulate in float32 across the sequential TPU grid into
constant-index output blocks (VMEM-resident until the final write-back).

v2 (round 2): weight matrices are pre-cast to the compute dtype OUTSIDE the
kernel (one tiny XLA cast per step) and live in VMEM at bfloat16; trunk
activations and the whole cotangent chain stay in the compute dtype (as in
the flax/XLA mixed-precision backward); relu masks are produced from the
f32 pre-activations during recompute. The decisive change was LAYOUT, not
residency: the positional encoding is built/backpropagated as a matmul
against a constant (3, 30) frequency-pattern matrix instead of ten 3-lane
concats / twenty 3-wide strided slices — cross-lane shuffles were costing
~45% of the kernel (45.6k -> 81k rays/s for the full bs=8192 train step on
v5e). Biases and all weight-gradient accumulation stay f32.

Numerics: matmuls run in the requested compute dtype (bfloat16 by default)
with float32 accumulation — matching the flax path's mixed-precision
recipe; parity tests pin forward outputs and gradients against flax at f32
bit level (tests/test_pallas_field.py).
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

POS_DEG = 10  # positional encoding degrees (eonerf.py:80)
PE_DIM = 3 + 6 * POS_DEG  # 63


class FieldWeights(NamedTuple):
    """Flat, kernel-ready view of the EONerfField per-sample parameters."""

    trunk_w: tuple  # 8 matrices; layer 5 takes the skip concat (319, 256)
    trunk_b: tuple  # 8 x (1, 256)
    sigma_w: jnp.ndarray  # (256, 1)
    sigma_b: jnp.ndarray  # (1, 1)
    bott_w: jnp.ndarray  # (256, 256)
    bott_b: jnp.ndarray  # (1, 256)
    alb_w0: jnp.ndarray  # (256, 128)
    alb_b0: jnp.ndarray  # (1, 128)
    alb_w1: jnp.ndarray  # (128, 3)
    alb_b1: jnp.ndarray  # (1, 3)
    tr_w: tuple  # 4 matrices; first is (260, 128)
    tr_b: tuple  # 4 x (1, 128)
    ts_w: jnp.ndarray  # (128, 1)
    ts_b: jnp.ndarray  # (1, 1)
    tb_w: jnp.ndarray  # (128, 1)
    tb_b: jnp.ndarray  # (1, 1)


def pack_params(params):
    """flax EONerfField params -> FieldWeights (biases as (1, d) rows)."""
    p = params["params"]

    def wb(scope, name):
        layer = p[scope][name]
        return layer["kernel"], layer["bias"].reshape(1, -1)

    trunk_w, trunk_b = zip(*(wb("trunk", f"hidden_{i}") for i in range(8)))
    sigma_w, sigma_b = wb("sigma_head", "output")
    bott_w, bott_b = wb("bottleneck", "output")
    alb_w0, alb_b0 = wb("albedo_mlp", "hidden_0")
    alb_w1, alb_b1 = wb("albedo_mlp", "output")
    tr_w, tr_b = zip(*(wb("transient_mlp", f"hidden_{i}") for i in range(4)))
    ts_w, ts_b = wb("transient_scalar", "output")
    tb_w, tb_b = wb("transient_beta", "output")
    return FieldWeights(tuple(trunk_w), tuple(trunk_b), sigma_w, sigma_b,
                        bott_w, bott_b, alb_w0, alb_b0, alb_w1, alb_b1,
                        tuple(tr_w), tuple(tr_b), ts_w, ts_b, tb_w, tb_b)


def flatten_weights(w: FieldWeights):
    return [*w.trunk_w, *w.trunk_b, w.sigma_w, w.sigma_b, w.bott_w, w.bott_b,
            w.alb_w0, w.alb_b0, w.alb_w1, w.alb_b1, *w.tr_w, *w.tr_b,
            w.ts_w, w.ts_b, w.tb_w, w.tb_b]


def unflatten_weights(flat):
    it = list(flat)
    return FieldWeights(tuple(it[0:8]), tuple(it[8:16]), it[16], it[17],
                        it[18], it[19], it[20], it[21], it[22], it[23],
                        tuple(it[24:28]), tuple(it[28:32]), it[32], it[33],
                        it[34], it[35])


N_WEIGHTS = 36
N_DENSITY_WEIGHTS = 18  # trunk (8+8) + sigma head (2)


def density_subset(w: FieldWeights):
    return [*w.trunk_w, *w.trunk_b, w.sigma_w, w.sigma_b]


def _is_bias(x):
    return x.ndim == 2 and x.shape[0] == 1


def cast_matrices(flat, dtype):
    """Weight MATRICES to the compute dtype (VMEM residency); biases stay
    f32 (they are added to f32 matmul accumulators)."""
    return [x if _is_bias(x) else x.astype(dtype) for x in flat]


# ---------------------------------------------------------------------------
# shared math (used identically in forward and backward-recompute)
# ---------------------------------------------------------------------------

PE_PAD = 64  # PE computed in a padded 64-lane layout (see _pe64)


def _pe_pattern64():
    """Constant (3, 64) matrix B with column layout [x(3) | sin-args(30) |
    cos-args(30) | pad]: xb64 = x @ B reproduces the degree-major frequency
    layout in ONE lane-aligned 64-wide array — no 3/33-offset concats
    anywhere (cross-lane shuffles are the enemy on the VPU). Built from
    traced iotas — Pallas kernels cannot capture host constants; boolean
    logic avoids i1 select_n (Mosaic: 'unsupported target bitwidth')."""
    k = jax.lax.broadcasted_iota(jnp.int32, (3, PE_PAD), 1)
    j = jax.lax.broadcasted_iota(jnp.int32, (3, PE_PAD), 0)
    deg = jnp.where(k < 33, (k - 3) // 3, (k - 33) // 3)
    hit = (((k < 3) & (k == j))
           | ((k >= 3) & (k < 33) & ((k - 3) % 3 == j))
           | ((k >= 33) & (k < 63) & ((k - 33) % 3 == j)))
    return jnp.where(hit, jnp.where(k < 3, 1.0, jnp.exp2(deg.astype(jnp.float32))), 0.0)


def _pe_phase(col):
    """Phase column vector turning one sin() into the [sin | cos] block:
    cos(y) = sin(y + pi/2) on the cos lanes (33..62)."""
    return jnp.where((col >= 33) & (col < 63), jnp.float32(jnp.pi / 2), 0.0)


def _pe64(x, dtype=jnp.float32):
    """pe64 (N, 64) f32 with layout [x | sin(x 2^i) | cos(x 2^i) | 0].

    f32 compute: exact sin+cos — bit-identical to the flax encoder (the
    parity contract). bf16 compute: ONE phased sin evaluates both blocks
    (cos y = sin(y + pi/2)); the f32 rounding of y + pi/2 perturbs the
    result by <=1e-4 absolute — two orders below the bf16 quantization the
    activations immediately undergo — and halves the kernel's transcendental
    cost (sin/cos were ~23% of the forward trunk kernel on v5e)."""
    xb = jax.lax.dot_general(x, _pe_pattern64(), (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, xb.shape, 1)
    if dtype == jnp.float32:
        s, c = jnp.sin(xb), jnp.cos(xb)
        return jnp.where(col < 3, xb, jnp.where(col < 33, s,
                         jnp.where(col < 63, c, 0.0)))
    a1 = jnp.sin(xb + _pe_phase(col))
    return jnp.where(col < 3, xb, jnp.where(col < 63, a1, 0.0))


def _pe64_with_deriv(x, dtype=jnp.float32):
    """(pe64, deriv64) for the backward: deriv is d(pe)/d(arg) per lane,
    [1 | cos | -sin | 0]. Same exact/phased split as _pe64; the phased path
    gets the derivative from a second phased sin (sin(y + phase + pi/2) =
    [cos | -sin] on the two blocks) — same 2-transcendental budget as the
    exact path."""
    xb = jax.lax.dot_general(x, _pe_pattern64(), (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, xb.shape, 1)
    if dtype == jnp.float32:
        s, c = jnp.sin(xb), jnp.cos(xb)
        pe = jnp.where(col < 3, xb, jnp.where(col < 33, s,
                       jnp.where(col < 63, c, 0.0)))
        deriv = jnp.where(col < 3, 1.0, jnp.where(col < 33, c,
                          jnp.where(col < 63, -s, 0.0)))
        return pe, deriv
    phase = _pe_phase(col)
    a1 = jnp.sin(xb + phase)
    a2 = jnp.sin(xb + phase + jnp.float32(jnp.pi / 2))
    pe = jnp.where(col < 3, xb, jnp.where(col < 63, a1, 0.0))
    deriv = jnp.where(col < 3, 1.0, jnp.where(col < 63, a2, 0.0))
    return pe, deriv


def _mm(a, w, b=None):
    """a @ w (+ b) with f32 accumulation; a and w are already in the
    compute dtype."""
    out = jax.lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out if b is None else out + b.astype(jnp.float32)


def _mm_t(g, w, dtype):
    """g @ w.T, output in the compute dtype (the cotangent chain stays in
    dtype end-to-end — matches the flax/XLA mixed-precision backward, which
    also carries bf16 cotangents; per-layer f32<->bf16 relayouts are pure
    VPU shuffle waste); Mosaic requires a 32-bit matmul accumulator, so the
    output is rounded to dtype right at the matmul."""
    return jax.lax.dot_general(g.astype(dtype), w, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32).astype(dtype)


def _outer(a, g_cd):
    """a.T @ g — weight-gradient contribution (both in compute dtype,
    f32 accumulation)."""
    return jax.lax.dot_general(a, g_cd, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _softplus(x):
    return jnp.logaddexp(x, 0.0)


# ---------------------------------------------------------------------------
# int8 trunk (optional): per-column weight scales + dynamic per-tile
# activation scales. v5e's MXU runs int8 at 2x the bf16 rate (394 vs 197
# TOPS nameplate); the trunk is ~82% of camera-pass and ~99% of shadow-pass
# matmul FLOPs, so quantizing ONLY the trunk (heads + the whole cotangent
# chain stay bf16) converts most of the step to the faster arithmetic.
# Gradients use the straight-through estimator: the backward recomputes the
# int8 forward (masks/activations consistent with what the forward actually
# produced) but dgrad/wgrad run bf16 against the unquantized weights.
# ---------------------------------------------------------------------------

N_Q8 = 16  # 8 int8 trunk matrices + 8 (1, 256) f32 per-column scale rows


def quantize_trunk_int8(flat_padded_f32):
    """XLA glue (runs per train step — weights change inside the scanned
    megastep): symmetric per-column int8 quantization of the 8 PADDED trunk
    matrices. Returns [w8 x8] + [scale x8] to append to the kernel args."""
    w8s, scales = [], []
    for wmat in flat_padded_f32[:8]:
        wf = wmat.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(wf), axis=0, keepdims=True), 1e-12) / 127.0
        w8s.append(jnp.round(wf / s).astype(jnp.int8))
        scales.append(s)
    return w8s + scales


def _q8_act(hf):
    """Dynamic per-tensor (per-tile) symmetric int8 activation quantization.
    Returns (h8, scale (1,1) f32)."""
    amax = jnp.max(jnp.abs(hf), axis=(0, 1), keepdims=True)
    inv = jnp.float32(127.0) / jnp.maximum(amax, 1e-12)
    h8 = jnp.round(hf * inv).astype(jnp.int8)
    return h8, 1.0 / inv


def _mm_q8(h8, w8, sw_row, s_act, b=None):
    """int8 x int8 -> int32 matmul, dequantized to f32 by the combined
    activation x per-column weight scale."""
    acc = jax.lax.dot_general(h8, w8, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (sw_row * s_act)
    return out if b is None else out + b.astype(jnp.float32)


def _trunk_fwd_q8(pe_cd, w: FieldWeights, q8, dtype, with_masks=False):
    """int8 trunk forward, same output contract as _trunk_fwd (post-relu
    activations in the compute dtype + optional relu masks). The running
    activation stays f32 between layers (quantization is the only rounding
    in the chain). The skip layer quantizes its two input halves SEPARATELY
    (h4 and pe have very different dynamic ranges; a joint scale would
    crush the positional lanes to a handful of int8 levels)."""
    w8s, sws = q8
    hf = pe_cd.astype(jnp.float32)
    pe8, pe_s = _q8_act(hf)
    acts, masks = [], []
    pre = _mm_q8(pe8, w8s[0], sws[0], pe_s, w.trunk_b[0])
    hf = jnp.maximum(pre, 0.0)
    acts.append(hf.astype(dtype))
    if with_masks:
        masks.append(_relu_mask(pre, dtype))
    for i in range(1, 8):
        if i == 5:
            h8, sa = _q8_act(hf)
            pre = (_mm_q8(h8, w8s[5][:256], sws[5], sa)
                   + _mm_q8(pe8, w8s[5][256:320], sws[5], pe_s)
                   + w.trunk_b[5].astype(jnp.float32))
        else:
            h8, sa = _q8_act(hf)
            pre = _mm_q8(h8, w8s[i], sws[i], sa, w.trunk_b[i])
        hf = jnp.maximum(pre, 0.0)
        acts.append(hf.astype(dtype))
        if with_masks:
            masks.append(_relu_mask(pre, dtype))
    return (acts, masks) if with_masks else acts


def _relu_mask(pre, dtype):
    """relu derivative as a 0/1 multiplier in the compute dtype, computed
    from the f32 pre-activation at recompute time (no bf16 cmpf on TPU, and
    no extra relayout)."""
    return (pre > 0).astype(dtype)


def _trunk_fwd(pe_cd, w: FieldWeights, dtype, with_masks=False):
    """Post-relu activations h0..h7 in the compute dtype; with_masks also
    returns the relu-derivative multipliers for the backward."""
    acts, masks = [], []
    pre = _mm(pe_cd, w.trunk_w[0], w.trunk_b[0])
    acts.append(jnp.maximum(pre, 0.0).astype(dtype))
    if with_masks:
        masks.append(_relu_mask(pre, dtype))
    for i in range(1, 8):
        inp = jnp.concatenate([acts[-1], pe_cd], axis=-1) if i == 5 else acts[-1]
        pre = _mm(inp, w.trunk_w[i], w.trunk_b[i])
        acts.append(jnp.maximum(pre, 0.0).astype(dtype))
        if with_masks:
            masks.append(_relu_mask(pre, dtype))
    return (acts, masks) if with_masks else acts


def _load_q8(q8_refs):
    """Kernel-side: materialize the 16 appended q8 refs into the
    (w8s, scales) pair _trunk_fwd_q8 expects."""
    return (tuple(r[:] for r in q8_refs[:8]),
            tuple(r[:] for r in q8_refs[8:16]))


def _i8_outer(a8, g8):
    """a8.T @ g8 with int32 accumulation, returned f32 (caller scales)."""
    return jax.lax.dot_general(a8, g8, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32
                               ).astype(jnp.float32)


def _trunk_bwd_q8(pe_cd, acts, masks, g_h, w: FieldWeights, q8, dtype,
                  dws, dbs):
    """int8 dgrad + wgrad for the trunk cotangent chain
    (trunk_quant="int8_full"). Per layer, ONE quantization of the
    weight-scale-folded cotangent serves both matmuls:

        gs  = g_pre * s_w          (fold per-column weight scales; VPU)
        dgrad: g_pre @ W^T  ~= (g8 @ w8^T) * s_g     (column scales cancel)
        wgrad: inp^T @ g_pre ~= (inp8^T @ g8) * s_in * s_g / s_w

    Bias grads reduce the UNQUANTIZED f32 cotangent; the skip layer's two
    input halves quantize separately (same reasoning as _trunk_fwd_q8 —
    their dynamic ranges differ wildly). Same output contract as
    _trunk_bwd."""
    w8s, sws = q8
    pe8, pe_s = _q8_act(pe_cd.astype(jnp.float32))
    g_pe = jnp.zeros(pe_cd.shape, dtype)
    for i in range(7, -1, -1):
        gf = (g_h * masks[i]).astype(jnp.float32)
        dbs[i] = jnp.sum(gf, axis=0, keepdims=True, dtype=jnp.float32)
        g8, s_g = _q8_act(gf * sws[i])
        col_s = s_g / sws[i]                        # (1, out) wgrad scales
        if i == 0:
            dws[i] = _i8_outer(pe8, g8) * (pe_s * col_s)
        elif i == 5:
            h8, s_h = _q8_act(acts[4].astype(jnp.float32))
            dws[i] = jnp.concatenate(
                [_i8_outer(h8, g8) * (s_h * col_s),
                 _i8_outer(pe8, g8) * (pe_s * col_s)], axis=0)
        else:
            h8, s_h = _q8_act(acts[i - 1].astype(jnp.float32))
            dws[i] = _i8_outer(h8, g8) * (s_h * col_s)
        g_in = (jax.lax.dot_general(g8, w8s[i], (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.int32
                                    ).astype(jnp.float32)
                * s_g).astype(dtype)
        if i == 5:
            g_h = g_in[:, :256]
            g_pe = g_pe + g_in[:, 256:]
        elif i == 0:
            g_pe = g_pe + g_in
        else:
            g_h = g_in
    return g_pe


def _trunk_bwd_any(pe_cd, acts, masks, g_h, w, dtype, dws, dbs, q8=None):
    if q8 is None:
        return _trunk_bwd(pe_cd, acts, masks, g_h, w, dtype, dws, dbs)
    return _trunk_bwd_q8(pe_cd, acts, masks, g_h, w, q8, dtype, dws, dbs)


def _trunk_fwd_any(pe_cd, w, dtype, q8=None, with_masks=False):
    if q8 is None:
        return _trunk_fwd(pe_cd, w, dtype, with_masks=with_masks)
    return _trunk_fwd_q8(pe_cd, w, q8, dtype, with_masks=with_masks)


def _trunk_bwd(pe_cd, acts, masks, g_h, w: FieldWeights, dtype, dws, dbs):
    """Backprop through the trunk. g_h arrives in the compute dtype and the
    chain stays there; weight/bias gradients accumulate f32. Returns d_pe
    (compute dtype)."""
    g_pe = jnp.zeros(pe_cd.shape, dtype)
    for i in range(7, -1, -1):
        g_pre = g_h * masks[i]
        if i == 0:
            inp = pe_cd
        elif i == 5:
            inp = jnp.concatenate([acts[4], pe_cd], axis=-1)
        else:
            inp = acts[i - 1]
        dws[i] = _outer(inp, g_pre)
        dbs[i] = jnp.sum(g_pre, axis=0, keepdims=True, dtype=jnp.float32)
        g_in = jax.lax.dot_general(g_pre, w.trunk_w[i],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32).astype(dtype)
        if i == 5:
            g_h = g_in[:, :256]
            g_pe = g_pe + g_in[:, 256:]
        elif i == 0:
            g_pe = g_pe + g_in
        else:
            g_h = g_in
    return g_pe


def _pe64_bwd(deriv64, g_pe):
    """d(pe64)/d(x): the per-lane derivative (from _pe64_with_deriv) applied
    as a lane-aligned multiply, then one tiny matmul by B^T — no strided
    slices. g_pe arrives in the compute dtype (the trunk chain), promoted by
    the f32 derivative multiply."""
    return jax.lax.dot_general(
        g_pe.astype(jnp.float32) * deriv64, _pe_pattern64(),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _field_fwd_kernel(dtype, pos_ref, emb_ref, *rest):
    weight_refs, out_ref = rest[:N_WEIGHTS], rest[N_WEIGHTS]
    w = unflatten_weights([r[:] for r in weight_refs])
    pe = _pe64(pos_ref[:].astype(jnp.float32), dtype).astype(dtype)
    h = _trunk_fwd(pe, w, dtype)[-1]
    sigma = _softplus(_mm(h, w.sigma_w, w.sigma_b))
    bott = _mm(h, w.bott_w, w.bott_b).astype(dtype)
    ah = jnp.maximum(_mm(bott, w.alb_w0, w.alb_b0), 0.0).astype(dtype)
    albedo = jax.nn.sigmoid(_mm(ah, w.alb_w1, w.alb_b1))
    emb64 = jnp.pad(emb_ref[:].astype(dtype), ((0, 0), (0, 60)))
    t = jnp.concatenate([bott, emb64], axis=-1)
    for i in range(4):
        t = jnp.maximum(_mm(t, w.tr_w[i], w.tr_b[i]), 0.0).astype(dtype)
    ts = jax.nn.sigmoid(_mm(t, w.ts_w, w.ts_b))
    tb = _softplus(_mm(t, w.tb_w, w.tb_b))
    pad = jnp.zeros_like(ts)
    out_ref[:] = jnp.concatenate([sigma, albedo, ts, tb, pad, pad], axis=-1)


def _field_bwd_kernel(dtype, pos_ref, emb_ref, g_ref, *rest):
    weight_refs = rest[:N_WEIGHTS]
    out_refs = rest[N_WEIGHTS:]  # d_pos, d_emb, then 36 weight-grad refs
    dpos_ref, demb_ref = out_refs[0], out_refs[1]
    dw_refs = out_refs[2:]
    w = unflatten_weights([r[:] for r in weight_refs])

    # ---- recompute forward, keeping activations + relu masks (dtype) ----
    x = pos_ref[:].astype(jnp.float32)
    emb = jnp.pad(emb_ref[:].astype(dtype), ((0, 0), (0, 60)))
    pe_f32, deriv64 = _pe64_with_deriv(x, dtype)
    pe = pe_f32.astype(dtype)
    acts, masks = _trunk_fwd(pe, w, dtype, with_masks=True)
    h = acts[-1]
    sig_pre = _mm(h, w.sigma_w, w.sigma_b)
    bott = _mm(h, w.bott_w, w.bott_b).astype(dtype)
    ah_pre = _mm(bott, w.alb_w0, w.alb_b0)
    ah = jnp.maximum(ah_pre, 0.0).astype(dtype)
    m_ah = _relu_mask(ah_pre, dtype)
    albedo = jax.nn.sigmoid(_mm(ah, w.alb_w1, w.alb_b1))
    t_in = jnp.concatenate([bott, emb], axis=-1)
    t_acts, t_masks = [], []
    t = t_in
    for i in range(4):
        pre = _mm(t, w.tr_w[i], w.tr_b[i])
        t = jnp.maximum(pre, 0.0).astype(dtype)
        t_acts.append(t)
        t_masks.append(_relu_mask(pre, dtype))
    ts = jax.nn.sigmoid(_mm(t, w.ts_w, w.ts_b))
    tb_pre = _mm(t, w.tb_w, w.tb_b)

    # ---- backward: narrow head grads in f32, wide chain in dtype ----
    g = g_ref[:].astype(jnp.float32)
    g_sigma, g_alb, g_ts, g_tb = g[:, 0:1], g[:, 1:4], g[:, 4:5], g[:, 5:6]

    g_sig_pre = g_sigma * jax.nn.sigmoid(sig_pre)
    g_ts_pre = g_ts * ts * (1.0 - ts)
    g_tb_pre = g_tb * jax.nn.sigmoid(tb_pre)

    grads = {}
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

    g_alb_pre = g_alb * albedo * (1.0 - albedo)
    grads["alb_w1"] = _outer(ah, g_alb_pre.astype(dtype))
    grads["alb_b1"] = jnp.sum(g_alb_pre, axis=0, keepdims=True)
    g_ah = m_ah * _mm_t(g_alb_pre, w.alb_w1, dtype)
    grads["alb_w0"] = _outer(bott, g_ah)
    grads["alb_b0"] = jnp.sum(g_ah, axis=0, keepdims=True, dtype=jnp.float32)
    g_bott = g_bott_t + jax.lax.dot_general(
        g_ah, w.alb_w0, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype)

    grads["bott_w"] = _outer(h, g_bott)
    grads["bott_b"] = jnp.sum(g_bott, axis=0, keepdims=True, dtype=jnp.float32)
    grads["sigma_w"] = _outer(h, g_sig_pre.astype(dtype))
    grads["sigma_b"] = jnp.sum(g_sig_pre, axis=0, keepdims=True)
    g_h = _mm_t(g_bott, w.bott_w, dtype) + _mm_t(g_sig_pre, w.sigma_w, dtype)

    trunk_dw = [None] * 8
    trunk_db = [None] * 8
    g_pe = _trunk_bwd(pe, acts, masks, g_h, w, dtype, trunk_dw, trunk_db)

    dpos_ref[:] = _pe64_bwd(deriv64, g_pe)
    demb_ref[:] = g_emb

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


def _density_fwd_kernel(dtype, pos_ref, *rest):
    weight_refs, out_ref = rest[:N_DENSITY_WEIGHTS], rest[N_DENSITY_WEIGHTS]
    tw = [r[:] for r in weight_refs[:8]]
    tb = [r[:] for r in weight_refs[8:16]]
    sw, sb = weight_refs[16][:], weight_refs[17][:]
    w = FieldWeights(tuple(tw), tuple(tb), sw, sb, *([None] * 12))
    pe = _pe64(pos_ref[:].astype(jnp.float32), dtype).astype(dtype)
    h = _trunk_fwd(pe, w, dtype)[-1]
    sigma = _softplus(_mm(h, sw, sb))
    out_ref[:] = sigma


def _density_bwd_kernel(dtype, pos_ref, g_ref, *rest):
    weight_refs = rest[:N_DENSITY_WEIGHTS]
    out_refs = rest[N_DENSITY_WEIGHTS:]
    dpos_ref = out_refs[0]
    dw_refs = out_refs[1:]
    tw = [r[:] for r in weight_refs[:8]]
    tb = [r[:] for r in weight_refs[8:16]]
    sw, sb = weight_refs[16][:], weight_refs[17][:]
    w = FieldWeights(tuple(tw), tuple(tb), sw, sb, *([None] * 12))

    x = pos_ref[:].astype(jnp.float32)
    pe_f32, deriv64 = _pe64_with_deriv(x, dtype)
    pe = pe_f32.astype(dtype)
    acts, masks = _trunk_fwd(pe, w, dtype, with_masks=True)
    h = acts[-1]
    sig_pre = _mm(h, sw, sb)

    g = g_ref[:].astype(jnp.float32)
    g_sig_pre = g * jax.nn.sigmoid(sig_pre)
    dsw = _outer(h, g_sig_pre.astype(dtype))
    dsb = jnp.sum(g_sig_pre, axis=0, keepdims=True)
    g_h = _mm_t(g_sig_pre, sw, dtype)

    trunk_dw = [None] * 8
    trunk_db = [None] * 8
    g_pe = _trunk_bwd(pe, acts, masks, g_h, w, dtype, trunk_dw, trunk_db)
    dpos_ref[:] = _pe64_bwd(deriv64, g_pe)

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
# pallas_call plumbing
# ---------------------------------------------------------------------------

def _tile_spec(tile, ncols):
    return pl.BlockSpec((tile, ncols), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


def _pad_rows(x, tile):
    n = x.shape[0]
    pad = (-n) % tile
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, *x.shape[1:]), x.dtype)], axis=0)
    return x


def _cparams(vmem_limit_mb):
    if vmem_limit_mb is None:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=int(vmem_limit_mb * 2**20))


def _shard_fwd(forward, mesh, axis, n_out=1):
    """shard_map a kernel forward over the point axis (weights replicated)."""
    from jax.sharding import PartitionSpec as P

    def sharded(weights, *pts):
        return jax.shard_map(
            forward, mesh=mesh,
            in_specs=(P(),) + (P(axis),) * len(pts),
            out_specs=P(axis) if n_out == 1 else (P(axis),) * n_out,
            check_vma=False)(weights, *pts)

    return sharded


def _shard_bwd(backward, mesh, axis, n_pt_grads):
    """shard_map a kernel backward: per-shard weight grads are psum'd over
    the point axis inside the map (they transpose a replicated input);
    per-point grads stay sharded."""
    from jax.sharding import PartitionSpec as P

    def body(weights, *args):
        out = backward(weights, *args)
        dw, pt_grads = out[0], out[1:]
        dw = jax.tree_util.tree_map(lambda x: jax.lax.psum(x, axis), dw)
        return (dw, *pt_grads)

    def sharded(weights, *args):
        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(),) + (P(axis),) * len(args),
            out_specs=(P(),) + (P(axis),) * n_pt_grads,
            check_vma=False)(weights, *args)

    return sharded



def _pad_pe_rows(flat, with_transient=False):
    """Pad trunk W0 (63->64 rows), W5 (319->320 rows) and — for the full
    field — transient W0 (260->320 rows, matching the 64-lane-padded
    embedding concat) with zeros so every kernel array is lane/sublane
    aligned."""
    out = list(flat)
    out[0] = jnp.pad(out[0], ((0, 1), (0, 0)))
    out[5] = jnp.pad(out[5], ((0, 1), (0, 0)))
    if with_transient:
        out[24] = jnp.pad(out[24], ((0, 60), (0, 0)))
    return out


def _unpad_pe_rows(flat, with_transient=False):
    """Inverse of _pad_pe_rows for the weight-gradient outputs."""
    out = list(flat)
    out[0] = out[0][:PE_DIM]
    out[5] = out[5][:256 + PE_DIM]
    if with_transient:
        out[24] = out[24][:260]
    return out


def make_fused_field(compute_dtype=jnp.bfloat16, tile=2048, bwd_tile=512,
                     interpret=False, vmem_limit_mb=None, mesh=None,
                     data_axis="data"):
    """Returns fused(weights: FieldWeights, pos (N,3), emb (N,4)) ->
    (sigma (N,), albedo (N,3), t_s (N,1), t_beta (N,1)) with a Pallas
    forward AND backward.

    With ``mesh``, the kernels are shard_map'ed over ``data_axis``: points
    shard, weights replicate, and weight gradients psum over ICI — the
    multi-chip data-parallel path (GSPMD cannot partition the custom call
    itself). N must divide by the axis size.

    VMEM budget (bf16): weights ~1.3 MB + one tile of activations; backward
    additionally holds the trunk activations for the tile (~4 MB at 1024)
    and the f32 weight-gradient accumulators (~2.6 MB)."""

    def _forward(weights, pos, emb):
        n = pos.shape[0]
        pos_p = _pad_rows(pos.astype(jnp.float32), tile)
        emb_p = _pad_rows(emb.astype(jnp.float32), tile)
        npad = pos_p.shape[0]
        flat = _pad_pe_rows(cast_matrices(flatten_weights(weights), compute_dtype),
                            with_transient=True)
        out = pl.pallas_call(
            functools.partial(_field_fwd_kernel, compute_dtype),
            out_shape=jax.ShapeDtypeStruct((npad, 8), jnp.float32),
            grid=(npad // tile,),
            in_specs=[_tile_spec(tile, 3), _tile_spec(tile, 4)]
                     + [_const_spec(wt.shape) for wt in flat],
            out_specs=_tile_spec(tile, 8),
            compiler_params=_cparams(vmem_limit_mb),
            interpret=interpret,
        )(pos_p, emb_p, *flat)
        return out[:n]

    def _backward(weights, pos, emb, g):
        n = pos.shape[0]
        pos_p = _pad_rows(pos.astype(jnp.float32), bwd_tile)
        emb_p = _pad_rows(emb.astype(jnp.float32), bwd_tile)
        g_p = _pad_rows(g.astype(jnp.float32), bwd_tile)
        npad = pos_p.shape[0]
        flat_f32 = flatten_weights(weights)
        flat = _pad_pe_rows(cast_matrices(flat_f32, compute_dtype),
                            with_transient=True)
        out_shapes = ([jax.ShapeDtypeStruct((npad, 3), jnp.float32),
                       jax.ShapeDtypeStruct((npad, 4), jnp.float32)]
                      + [jax.ShapeDtypeStruct(wt.shape, jnp.float32) for wt in flat])
        out_specs = ([_tile_spec(bwd_tile, 3), _tile_spec(bwd_tile, 4)]
                     + [_const_spec(wt.shape) for wt in flat])
        outs = pl.pallas_call(
            functools.partial(_field_bwd_kernel, compute_dtype),
            out_shape=tuple(out_shapes),
            grid=(npad // bwd_tile,),
            in_specs=[_tile_spec(bwd_tile, 3), _tile_spec(bwd_tile, 4),
                      _tile_spec(bwd_tile, 8)]
                     + [_const_spec(wt.shape) for wt in flat],
            out_specs=tuple(out_specs),
            compiler_params=_cparams(vmem_limit_mb),
            interpret=interpret,
        )(pos_p, emb_p, g_p, *flat)
        d_pos = outs[0][:n]
        d_emb = outs[1][:n]
        d_weights = unflatten_weights([d.astype(wt.dtype)
                                       for d, wt in zip(
                                           _unpad_pe_rows(outs[2:],
                                                          with_transient=True),
                                           flat_f32)])
        return d_weights, d_pos, d_emb

    if mesh is not None:
        _forward = _shard_fwd(_forward, mesh, data_axis)
        _backward = _shard_bwd(_backward, mesh, data_axis, n_pt_grads=2)

    @jax.custom_vjp
    def fused(weights, pos, emb):
        out = _forward(weights, pos, emb)
        return out[:, 0], out[:, 1:4], out[:, 4:5], out[:, 5:6]

    def fwd(weights, pos, emb):
        return fused(weights, pos, emb), (weights, pos, emb)

    def bwd(res, cot):
        weights, pos, emb = res
        g_sigma, g_alb, g_ts, g_tb = cot
        g = jnp.concatenate([g_sigma[:, None], g_alb, g_ts, g_tb,
                             jnp.zeros((pos.shape[0], 2), jnp.float32)], axis=-1)
        return _backward(weights, pos, emb, g)

    fused.defvjp(fwd, bwd)
    return fused


def make_fused_density(compute_dtype=jnp.bfloat16, tile=2048, bwd_tile=512,
                       interpret=False, vmem_limit_mb=None, mesh=None,
                       data_axis="data"):
    """Returns fused(weights: FieldWeights, pos (N,3)) -> sigma (N,) with a
    Pallas forward AND backward (gradients flow to pos and the trunk/sigma
    weights; head weights get zeros). ``mesh`` as in make_fused_field."""

    def _forward(weights, pos):
        n = pos.shape[0]
        pos_p = _pad_rows(pos.astype(jnp.float32), tile)
        npad = pos_p.shape[0]
        flat = _pad_pe_rows(cast_matrices(density_subset(weights), compute_dtype))
        out = pl.pallas_call(
            functools.partial(_density_fwd_kernel, compute_dtype),
            out_shape=jax.ShapeDtypeStruct((npad, 1), jnp.float32),
            grid=(npad // tile,),
            in_specs=[_tile_spec(tile, 3)] + [_const_spec(wt.shape) for wt in flat],
            out_specs=_tile_spec(tile, 1),
            compiler_params=_cparams(vmem_limit_mb),
            interpret=interpret,
        )(pos_p, *flat)
        return out[:n, 0]

    def _backward(weights, pos, g):
        n = pos.shape[0]
        pos_p = _pad_rows(pos.astype(jnp.float32), bwd_tile)
        g_p = _pad_rows(g.astype(jnp.float32).reshape(-1, 1), bwd_tile)
        npad = pos_p.shape[0]
        flat_f32 = density_subset(weights)
        flat = _pad_pe_rows(cast_matrices(flat_f32, compute_dtype))
        out_shapes = ([jax.ShapeDtypeStruct((npad, 3), jnp.float32)]
                      + [jax.ShapeDtypeStruct(wt.shape, jnp.float32) for wt in flat])
        out_specs = ([_tile_spec(bwd_tile, 3)] + [_const_spec(wt.shape) for wt in flat])
        outs = pl.pallas_call(
            functools.partial(_density_bwd_kernel, compute_dtype),
            out_shape=tuple(out_shapes),
            grid=(npad // bwd_tile,),
            in_specs=[_tile_spec(bwd_tile, 3), _tile_spec(bwd_tile, 1)]
                     + [_const_spec(wt.shape) for wt in flat],
            out_specs=tuple(out_specs),
            compiler_params=_cparams(vmem_limit_mb),
            interpret=interpret,
        )(pos_p, g_p, *flat)
        d_pos = outs[0][:n]
        d_flat = _unpad_pe_rows(outs[1:])
        z = jnp.zeros_like
        dw = FieldWeights(
            trunk_w=tuple(d.astype(w_.dtype) for d, w_ in zip(d_flat[0:8], flat_f32[0:8])),
            trunk_b=tuple(d.astype(w_.dtype) for d, w_ in zip(d_flat[8:16], flat_f32[8:16])),
            sigma_w=d_flat[16].astype(flat_f32[16].dtype),
            sigma_b=d_flat[17].astype(flat_f32[17].dtype),
            bott_w=z(weights.bott_w), bott_b=z(weights.bott_b),
            alb_w0=z(weights.alb_w0), alb_b0=z(weights.alb_b0),
            alb_w1=z(weights.alb_w1), alb_b1=z(weights.alb_b1),
            tr_w=tuple(z(a) for a in weights.tr_w),
            tr_b=tuple(z(a) for a in weights.tr_b),
            ts_w=z(weights.ts_w), ts_b=z(weights.ts_b),
            tb_w=z(weights.tb_w), tb_b=z(weights.tb_b))
        return dw, d_pos

    if mesh is not None:
        _forward = _shard_fwd(_forward, mesh, data_axis)
        _backward = _shard_bwd(_backward, mesh, data_axis, n_pt_grads=1)

    @jax.custom_vjp
    def fused(weights, pos):
        return _forward(weights, pos)

    def fwd(weights, pos):
        return fused(weights, pos), (weights, pos)

    def bwd(res, g):
        weights, pos = res
        return _backward(weights, pos, g)

    fused.defvjp(fwd, bwd)
    return fused
