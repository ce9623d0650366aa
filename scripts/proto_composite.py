"""Prototype benchmark for the in-kernel compositing building blocks.

Variants (all on a trunk-kernel-sized workload so costs are comparable):
  base      - trunk+sigma kernel, (N,1) sigma out (reference cost)
  reshape   - base + in-kernel (N_t,1)->(R,K) reshape of sigma, lane-scan
              exclusive cumsum within rows, exp, reshape back, out (N,1)
  colscan   - base + segmented exclusive cumsum directly on the (N_t,1)
              column (sublane shifts + masks), out (N,1)
  accmm     - base + reshape + scan + per-ray accumulation matmul
              Sel^T @ V -> (R_tile, 8) per-ray outputs (the full epilogue
              shape of the planned camera kernel)

Usage: python scripts/proto_composite.py [variant,variant|all] [n] [tile]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eonerf_code_tpu.models.eonerf import EONerfField
from eonerf_code_tpu.ops.pallas.fused_field import (
    FieldWeights, N_DENSITY_WEIGHTS, _const_spec, _mm, _pad_pe_rows, _pe64,
    _softplus, _tile_spec, _trunk_fwd, cast_matrices, density_subset,
    pack_params,
)

DT = jnp.bfloat16
KPAD = 128
RT = 16  # rays per tile; tile rows = RT * KPAD = 2048


def _density(pos_ref, weight_refs):
    tw = [r[:] for r in weight_refs[:8]]
    tb_ = [r[:] for r in weight_refs[8:16]]
    sw, sb = weight_refs[16][:], weight_refs[17][:]
    w = FieldWeights(tuple(tw), tuple(tb_), sw, sb, *([None] * 12))
    pe = _pe64(pos_ref[:].astype(jnp.float32), DT).astype(DT)
    h = _trunk_fwd(pe, w, DT)[-1]
    return _softplus(_mm(h, sw, sb))  # (N_t, 1) f32


def _lane_scan_excl(y):
    """Exclusive cumsum along lanes of (RT, KPAD): pre-shift then
    Hillis-Steele with static pad/slice shifts."""
    z = jnp.concatenate([jnp.zeros_like(y[:, :1]), y[:, :-1]], axis=1)
    d = 1
    while d < KPAD:
        shifted = jnp.concatenate([jnp.zeros_like(z[:, :d]), z[:, :-d]], axis=1)
        z = z + shifted
        d *= 2
    return z


def kernel_base(pos_ref, *rest):
    out_ref = rest[N_DENSITY_WEIGHTS]
    out_ref[:] = _density(pos_ref, rest[:N_DENSITY_WEIGHTS])


def kernel_reshape(pos_ref, sd_ref, *rest):
    out_ref = rest[N_DENSITY_WEIGHTS]
    sigma = _density(pos_ref, rest[:N_DENSITY_WEIGHTS])
    sig2 = sigma.reshape(RT, KPAD)  # (N_t,1) -> (RT,KPAD) relayout
    sdelta = sig2 * sd_ref[:]
    excl = _lane_scan_excl(sdelta)
    trans = jnp.exp(-excl)
    w = trans * (1.0 - jnp.exp(-sdelta))
    out_ref[:] = w.reshape(RT * KPAD, 1)  # relayout back


def kernel_colscan(pos_ref, sdcol_ref, *rest):
    out_ref = rest[N_DENSITY_WEIGHTS]
    sigma = _density(pos_ref, rest[:N_DENSITY_WEIGHTS])
    sdelta = sigma * sdcol_ref[:]
    # segmented exclusive scan along sublanes
    row = jax.lax.broadcasted_iota(jnp.int32, sdelta.shape, 0) % KPAD
    z = jnp.concatenate([jnp.zeros_like(sdelta[:1]), sdelta[:-1]], axis=0)
    z = jnp.where(row == 0, 0.0, z)
    d = 1
    while d < KPAD:
        shifted = jnp.concatenate([jnp.zeros_like(z[:d]), z[:-d]], axis=0)
        z = z + jnp.where(row >= d, shifted, 0.0)
        d *= 2
    trans = jnp.exp(-z)
    out_ref[:] = trans * (1.0 - jnp.exp(-sdelta))


def kernel_accmm(pos_ref, sd_ref, *rest):
    out_ref = rest[N_DENSITY_WEIGHTS]
    sigma = _density(pos_ref, rest[:N_DENSITY_WEIGHTS])
    sig2 = sigma.reshape(RT, KPAD)
    sdelta = sig2 * sd_ref[:]
    excl = _lane_scan_excl(sdelta)
    trans = jnp.exp(-excl)
    w = (trans * (1.0 - jnp.exp(-sdelta))).reshape(RT * KPAD, 1)
    # per-ray accumulation: Sel^T @ (w * V8); V8 stand-in = broadcast sigma
    i = jax.lax.broadcasted_iota(jnp.int32, (RT * KPAD, RT), 0)
    r = jax.lax.broadcasted_iota(jnp.int32, (RT * KPAD, RT), 1)
    sel = (i // KPAD == r).astype(jnp.float32)
    v8 = w * jnp.concatenate([sigma] * 8, axis=1)
    acc = jax.lax.dot_general(sel, v8, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out_ref[:] = acc  # (RT, 8)


def build(variant, n, tile):
    field = EONerfField(n_images=10, compute_dtype=DT)
    params = field.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 3)),
                       jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32),
                       method="init_all")
    flat = _pad_pe_rows(cast_matrices(density_subset(pack_params(params)), DT))
    nt = RT * KPAD
    assert tile == nt
    kern = {"base": kernel_base, "reshape": kernel_reshape,
            "colscan": kernel_colscan, "accmm": kernel_accmm}[variant]
    extra_in = {"base": [], "reshape": [("rk", jnp.float32)],
                "colscan": [("col", jnp.float32)],
                "accmm": [("rk", jnp.float32)]}[variant]
    out_kind = "acc" if variant == "accmm" else "col"

    def fn(pos, sd_rk, sd_col):
        n_tiles = n // tile
        ins = [pos]
        in_specs = [_tile_spec(tile, 3)]
        for kind, _ in extra_in:
            if kind == "rk":
                ins.append(sd_rk)
                in_specs.append(pl.BlockSpec((RT, KPAD), lambda i: (i, 0),
                                             memory_space=pltpu.VMEM))
            else:
                ins.append(sd_col)
                in_specs.append(_tile_spec(tile, 1))
        in_specs += [_const_spec(x.shape) for x in flat]
        if out_kind == "acc":
            out_shape = jax.ShapeDtypeStruct((n // KPAD, 8), jnp.float32)
            out_specs = pl.BlockSpec((RT, 8), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
        else:
            out_shape = jax.ShapeDtypeStruct((n, 1), jnp.float32)
            out_specs = _tile_spec(tile, 1)
        return pl.pallas_call(
            kern, out_shape=out_shape, grid=(n_tiles,),
            in_specs=in_specs, out_specs=out_specs,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        )(*ins, *flat)

    @jax.jit
    def chained(pos, sd_rk, sd_col, iters_arr):
        def body(c, _):
            out = fn(pos * (1.0 + c * 1e-20), sd_rk, sd_col)
            return out[0, 0] * 1e-20, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), iters_arr)
        return c

    return chained


def main(only="all", n=1040384, tile=2048, iters=10):
    n = (n // tile) * tile
    key = jax.random.PRNGKey(1)
    pos = jax.random.uniform(key, (n, 3), minval=-1, maxval=1)
    sd_rk = jax.random.uniform(key, (n // KPAD, KPAD)) * 0.1
    sd_col = sd_rk.reshape(n, 1)
    iters_arr = jnp.zeros((iters,))
    variants = (["base", "reshape", "colscan", "accmm"] if only == "all"
                else only.split(","))
    for v in variants:
        print(f"building {v}...", flush=True)
        chained = build(v, n, tile)
        c = chained(pos, sd_rk, sd_col, iters_arr)
        _ = float(c)
        t0 = time.perf_counter()
        c = chained(pos, sd_rk, sd_col, iters_arr)
        _ = float(c)
        dt = (time.perf_counter() - t0) / iters
        print(f"{v:8s}  {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    main(*args) if args else main()
