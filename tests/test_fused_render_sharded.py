"""Multi-chip path of the fused RENDER ops (camera + shadow): shard_map
over the data axis on the ray dimension, weights replicated, weight grads
psum'd. Verified against the unsharded ops on the 8-virtual-device CPU
mesh, for every trunk_quant tier (none / int8 fwd / int8_full).

The backward comparison feeds a FIXED cotangent through jax.vjp: with
identical primal inputs the sharded and unsharded backwards are
bit-identical (tile contents and in-tile reduction order coincide; the
psum tree only reorders f32 sums of identical per-tile contributions that
each land on the same values). Comparing loss-driven grads instead would
mix in eps-level jit-vs-eager forward differences, which the quantized
tiers amplify through discontinuous int8 rounding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from eonerf_code_tpu.models.eonerf import EONerfField
from eonerf_code_tpu.ops.pallas.fused_field import pack_params
from eonerf_code_tpu.ops.pallas.fused_render import (
    make_fused_camera,
    make_fused_coarse,
    make_fused_shadow,
)
from eonerf_code_tpu.ops.sampling import set_last_valid


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), ("data",))


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    field = EONerfField(n_images=6)
    params = field.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 3)),
                        jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32),
                        method="init_all")
    r, k = 64, 12  # r divisible by the 8-device axis
    o = rng.uniform(-0.5, 0.5, (r, 3)).astype(np.float32)
    o[:, 2] = 0.95
    d = np.tile(np.array([0.03, -0.02, -1.0], np.float32), (r, 1))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    z = np.sort(rng.uniform(0.0, 2.0, (r, k)).astype(np.float32), axis=1)
    delta = np.diff(z, axis=1, append=2.2).astype(np.float32)
    mask = rng.random((r, k)) > 0.25
    emb = rng.normal(size=(r, 4)).astype(np.float32)
    rayin = np.hstack([o, d, emb, np.zeros((r, 6), np.float32)])
    w = pack_params(params)
    gacc = rng.normal(size=(r, 8)).astype(np.float32)
    ggeo = rng.normal(size=(r,)).astype(np.float32)
    return w, (jnp.asarray(rayin), jnp.asarray(z), jnp.asarray(delta),
               jnp.asarray(mask), jnp.asarray(gacc), jnp.asarray(ggeo))


TIERS = [False, True, "full"]


def _assert_leaves_equal(g, gr, bound=1e-7):
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(gr)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)
        assert rel <= bound, f"rel-L2 {rel} for leaf shape {a.shape}"


@pytest.mark.parametrize("tier", TIERS)
def test_camera_matches_unsharded(mesh, setup, tier):
    w, (rayin, z, delta, mask, gacc, _) = setup
    deltam = set_last_valid(delta, mask, 1e10) * mask
    kw = dict(compute_dtype=jnp.float32, tile_target=64, bwd_tile_target=64,
              interpret=True, trunk_quant=tier)
    cam = make_fused_camera(**kw)
    cam_sh = make_fused_camera(mesh=mesh, **kw)

    acc = jax.jit(lambda w_, r_: cam(w_, r_, z, deltam))(w, rayin)
    acc_sh = jax.jit(lambda w_, r_: cam_sh(w_, r_, z, deltam))(w, rayin)
    # quant tiers: CPU matmul scheduling differs between the two jitted
    # programs at eps level, and int8 rounding turns eps into LSB flips
    fwd_rtol = 1e-6 if tier is False else 1e-4
    np.testing.assert_allclose(np.asarray(acc_sh), np.asarray(acc),
                               rtol=fwd_rtol, atol=1e-6)

    _, vjp = jax.vjp(lambda w_, r_: cam(w_, r_, z, deltam), w, rayin)
    _, vjp_sh = jax.vjp(lambda w_, r_: cam_sh(w_, r_, z, deltam), w, rayin)
    _assert_leaves_equal(vjp_sh(gacc), vjp(gacc))


def test_camera_saved_acts_matches_unsharded(mesh, setup):
    """The saved-activations backward through shard_map: the activation
    stream is an extra per-point output (fwd) / input (bwd), sharded on
    rays like everything else."""
    w, (rayin, z, delta, mask, gacc, _) = setup
    deltam = set_last_valid(delta, mask, 1e10) * mask
    kw = dict(compute_dtype=jnp.float32, tile_target=64, bwd_tile_target=64,
              interpret=True, save_acts=True)
    cam = make_fused_camera(**kw)
    cam_sh = make_fused_camera(mesh=mesh, **kw)
    _, vjp = jax.vjp(lambda w_, r_: cam(w_, r_, z, deltam), w, rayin)
    _, vjp_sh = jax.vjp(lambda w_, r_: cam_sh(w_, r_, z, deltam), w, rayin)
    _assert_leaves_equal(vjp_sh(gacc), vjp(gacc))


def test_shadow_saved_acts_matches_unsharded(mesh, setup):
    w, (rayin, z, delta, mask, _, ggeo) = setup
    deltam = delta * mask
    maskf = mask.astype(jnp.float32)
    kw = dict(compute_dtype=jnp.float32, tile_target=64, bwd_tile_target=64,
              interpret=True, save_acts=True)
    sh = make_fused_shadow(**kw)
    sh_sh = make_fused_shadow(mesh=mesh, **kw)
    _, vjp = jax.vjp(lambda w_, r_: sh(w_, r_, z, deltam, maskf), w, rayin)
    _, vjp_sh = jax.vjp(lambda w_, r_: sh_sh(w_, r_, z, deltam, maskf),
                        w, rayin)
    _assert_leaves_equal(vjp_sh(jnp.asarray(ggeo)), vjp(jnp.asarray(ggeo)))


def test_coarse_matches_unsharded(mesh, setup):
    """The forward-only coarse-weights op through shard_map."""
    w, (rayin, z, delta, mask, _, _) = setup
    deltam = set_last_valid(delta, mask, 1e10) * mask
    kw = dict(compute_dtype=jnp.float32, tile_target=64, interpret=True)
    co = make_fused_coarse(**kw)
    co_sh = make_fused_coarse(mesh=mesh, **kw)
    cw = jax.jit(lambda w_, r_: co(w_, r_, z, deltam))(w, rayin)
    cw_sh = jax.jit(lambda w_, r_: co_sh(w_, r_, z, deltam))(w, rayin)
    np.testing.assert_allclose(np.asarray(cw_sh), np.asarray(cw),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("tier", TIERS)
def test_shadow_matches_unsharded(mesh, setup, tier):
    w, (rayin, z, delta, mask, _, ggeo) = setup
    deltam = delta * mask
    maskf = mask.astype(jnp.float32)
    kw = dict(compute_dtype=jnp.float32, tile_target=64, bwd_tile_target=64,
              interpret=True, trunk_quant=tier)
    sh = make_fused_shadow(**kw)
    sh_sh = make_fused_shadow(mesh=mesh, **kw)

    geo = jax.jit(lambda w_, r_: sh(w_, r_, z, deltam, maskf))(w, rayin)
    geo_sh = jax.jit(lambda w_, r_: sh_sh(w_, r_, z, deltam, maskf))(w, rayin)
    fwd_rtol = 1e-6 if tier is False else 1e-4
    np.testing.assert_allclose(np.asarray(geo_sh), np.asarray(geo),
                               rtol=fwd_rtol, atol=1e-6)

    _, vjp = jax.vjp(lambda w_, r_: sh(w_, r_, z, deltam, maskf), w, rayin)
    _, vjp_sh = jax.vjp(lambda w_, r_: sh_sh(w_, r_, z, deltam, maskf),
                        w, rayin)
    _assert_leaves_equal(vjp_sh(ggeo), vjp(ggeo))
