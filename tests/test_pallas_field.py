"""Pallas fused-field kernels must match the flax EONerfField bit-for-bit
in f32 (same matmul order, f32 accumulation) — forward AND gradients.

Runs in interpreter mode on CPU; the compiled TPU path is exercised by
bench.py / the pallas-enabled trainer on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eonerf_code_tpu.models.eonerf import EONerfField
from eonerf_code_tpu.ops.pallas.fused_field import (
    make_fused_density,
    make_fused_field,
    pack_params,
)


@pytest.fixture(scope="module")
def setup(rng):
    field = EONerfField(n_images=6)
    params = field.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 3)),
                        jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32),
                        method="init_all")
    n = 96
    pos = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    emb_table = params["params"]["transient_encoder"]["embedding"]
    idx = jnp.asarray(rng.integers(0, 6, n).astype(np.int32))
    emb = emb_table[idx]
    return field, params, pos, emb, idx


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(3)


def flax_reference(field, params, pos, idx):
    """Per-sample heads via the flax path, with dummy sun dirs."""
    sun = jnp.zeros((pos.shape[0], 3))
    sigma, albedo, _amb, t_s, t_b = field.apply(
        params, pos[:, None, :], sun, idx)
    return sigma[:, 0], albedo[:, 0], t_s[:, 0], t_b[:, 0]


class TestForwardParity:
    def test_field_forward(self, setup):
        field, params, pos, emb, idx = setup
        fused = make_fused_field(compute_dtype=jnp.float32, tile=32,
                                 bwd_tile=32, interpret=True)
        w = pack_params(params)
        sigma, albedo, t_s, t_b = fused(w, pos, emb)
        r_sigma, r_alb, r_ts, r_tb = flax_reference(field, params, pos, idx)
        np.testing.assert_allclose(np.asarray(sigma), np.asarray(r_sigma),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(albedo), np.asarray(r_alb),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(t_s), np.asarray(r_ts),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(t_b), np.asarray(r_tb),
                                   rtol=1e-5, atol=1e-6)

    def test_density_forward(self, setup):
        field, params, pos, emb, idx = setup
        fused = make_fused_density(compute_dtype=jnp.float32, tile=32,
                                   bwd_tile=32, interpret=True)
        w = pack_params(params)
        sigma = fused(w, pos)
        ref = field.apply(params, pos, method="density")
        np.testing.assert_allclose(np.asarray(sigma), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_padding_irrelevant(self, setup):
        field, params, pos, emb, idx = setup
        fused = make_fused_field(compute_dtype=jnp.float32, tile=64,
                                 bwd_tile=64, interpret=True)
        w = pack_params(params)
        # 96 points with tile 64 -> one padded tile; results must match a
        # tile that divides evenly
        fused32 = make_fused_field(compute_dtype=jnp.float32, tile=32,
                                   bwd_tile=32, interpret=True)
        a = fused(w, pos, emb)
        b = fused32(w, pos, emb)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-6, atol=1e-7)


class TestGradientParity:
    def test_field_grads(self, setup):
        field, params, pos, emb, idx = setup
        fused = make_fused_field(compute_dtype=jnp.float32, tile=32,
                                 bwd_tile=32, interpret=True)
        w = pack_params(params)

        def loss_fused(w, pos, emb):
            sigma, albedo, t_s, t_b = fused(w, pos, emb)
            return (jnp.sum(sigma * 0.3) + jnp.sum(albedo**2)
                    + jnp.sum(t_s * 1.7) + jnp.sum(jnp.sqrt(t_b + 1e-3)))

        def loss_ref(params, pos, idx):
            s, a, ts, tb = flax_reference(field, params, pos, idx)
            return (jnp.sum(s * 0.3) + jnp.sum(a**2)
                    + jnp.sum(ts * 1.7) + jnp.sum(jnp.sqrt(tb + 1e-3)))

        gw, gpos, gemb = jax.grad(loss_fused, argnums=(0, 1, 2))(w, pos, emb)
        gref_params, gref_pos = jax.grad(loss_ref, argnums=(0, 1))(params, pos, idx)
        gw_ref = pack_params(gref_params)

        np.testing.assert_allclose(np.asarray(gpos), np.asarray(gref_pos),
                                   rtol=2e-4, atol=2e-5)
        for name in ("sigma_w", "bott_w", "alb_w0", "alb_w1", "ts_w", "tb_w"):
            np.testing.assert_allclose(
                np.asarray(getattr(gw, name)), np.asarray(getattr(gw_ref, name)),
                rtol=2e-4, atol=2e-5, err_msg=name)
        for i in range(8):
            np.testing.assert_allclose(
                np.asarray(gw.trunk_w[i]), np.asarray(gw_ref.trunk_w[i]),
                rtol=2e-4, atol=2e-5, err_msg=f"trunk_w[{i}]")
            np.testing.assert_allclose(
                np.asarray(gw.trunk_b[i]), np.asarray(gw_ref.trunk_b[i]),
                rtol=2e-4, atol=2e-5, err_msg=f"trunk_b[{i}]")
        # embedding grad: scatter per-point grads back by index
        gemb_table = np.zeros((6, 4), np.float32)
        np.add.at(gemb_table, np.asarray(idx), np.asarray(gemb))
        ref_emb = np.asarray(
            jax.grad(loss_ref)(params, pos, idx)["params"]["transient_encoder"]["embedding"])
        np.testing.assert_allclose(gemb_table, ref_emb, rtol=2e-4, atol=2e-5)

    def test_density_grads(self, setup):
        field, params, pos, emb, idx = setup
        fused = make_fused_density(compute_dtype=jnp.float32, tile=32,
                                   bwd_tile=32, interpret=True)
        w = pack_params(params)

        def loss_fused(w, pos):
            return jnp.sum(jnp.tanh(fused(w, pos)))

        def loss_ref(params, pos):
            return jnp.sum(jnp.tanh(field.apply(params, pos, method="density")))

        gw, gpos = jax.grad(loss_fused, argnums=(0, 1))(w, pos)
        gref_params, gref_pos = jax.grad(loss_ref, argnums=(0, 1))(params, pos)
        gw_ref = pack_params(gref_params)
        # position grads chain through the tanh'd sigma with values O(10);
        # f32 association-order noise shows up at ~1e-4 absolute
        np.testing.assert_allclose(np.asarray(gpos), np.asarray(gref_pos),
                                   rtol=1e-3, atol=5e-4)
        np.testing.assert_allclose(np.asarray(gw.sigma_w), np.asarray(gw_ref.sigma_w),
                                   rtol=2e-4, atol=2e-5)
        for i in range(8):
            np.testing.assert_allclose(
                np.asarray(gw.trunk_w[i]), np.asarray(gw_ref.trunk_w[i]),
                rtol=2e-4, atol=2e-5, err_msg=f"trunk_w[{i}]")
        # head grads are exactly zero for the density path
        assert float(jnp.abs(gw.bott_w).max()) == 0.0


class TestBf16Chain:
    def test_bf16_grads_track_f32(self, setup):
        """The bf16 cotangent chain (v2) must stay within bf16 rounding of
        the f32 kernel gradients — guards the masks/dtype restructuring."""
        field, params, pos, emb, idx = setup
        f16 = make_fused_field(compute_dtype=jnp.bfloat16, tile=32,
                               bwd_tile=32, interpret=True)
        f32 = make_fused_field(compute_dtype=jnp.float32, tile=32,
                               bwd_tile=32, interpret=True)
        w = pack_params(params)

        def loss(fused):
            def fn(w, pos, emb):
                sigma, albedo, t_s, t_b = fused(w, pos, emb)
                return (jnp.sum(sigma * 0.3) + jnp.sum(albedo**2)
                        + jnp.sum(t_s * 1.7) + jnp.sum(t_b))
            return fn

        g16, gp16 = jax.grad(loss(f16), argnums=(0, 1))(w, pos, emb)
        g32, gp32 = jax.grad(loss(f32), argnums=(0, 1))(w, pos, emb)
        def rel_l2(a, b):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)

        # thresholds = 1.4x the deviation the FLAX bf16 backward itself shows
        # vs f32 on this workload (0.143 / 0.044 / 0.022 for layers 0/4/7):
        # bf16 cotangent noise grows toward the input, identically in both
        # implementations.
        for i, bound in ((0, 0.20), (4, 0.07), (7, 0.04)):
            err = rel_l2(g16.trunk_w[i], g32.trunk_w[i])
            assert err < bound, f"trunk_w[{i}] rel L2 {err}"
        # d_pos runs through the full chain + PE vjp — noisiest, like layer 0
        assert rel_l2(gp16, gp32) < 0.20
