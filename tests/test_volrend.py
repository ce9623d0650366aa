"""Volume-rendering identities (SURVEY §4's suggested seams): empty-field
transmittance, brute-force parity, opaque-slab depth, exit transmittance."""

import jax
import jax.numpy as jnp
import numpy as np

from eonerf_code_tpu.ops.sampling import cube_mask, intervals_from_z, set_last_valid, stratified_z_vals
from eonerf_code_tpu.ops.volrend import accumulate, exit_transmittance, render_weights


def brute_force_weights(sigma, delta, mask):
    """Naive per-ray loop implementing the nerfacc definition."""
    r, k = sigma.shape
    w = np.zeros((r, k))
    t = np.zeros((r, k))
    a = np.zeros((r, k))
    for i in range(r):
        acc = 0.0
        for j in range(k):
            s = sigma[i, j] if mask[i, j] else 0.0
            t[i, j] = np.exp(-acc)
            a[i, j] = 1 - np.exp(-s * delta[i, j])
            w[i, j] = t[i, j] * a[i, j]
            acc += s * delta[i, j]
    return w, t, a


class TestRenderWeights:
    def test_empty_field(self):
        sigma = jnp.zeros((4, 16))
        delta = jnp.full((4, 16), 0.1)
        w, t, a = render_weights(sigma, delta)
        np.testing.assert_allclose(t, 1.0)
        np.testing.assert_allclose(w, 0.0)

    def test_matches_brute_force(self, rng):
        sigma = rng.random((8, 32)).astype(np.float32) * 5
        delta = rng.random((8, 32)).astype(np.float32) * 0.1
        mask = rng.random((8, 32)) > 0.3
        w, t, a = render_weights(jnp.asarray(sigma), jnp.asarray(delta), jnp.asarray(mask))
        w_ref, t_ref, a_ref = brute_force_weights(sigma, delta, mask)
        np.testing.assert_allclose(np.asarray(w), w_ref, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(t), t_ref, rtol=1e-5, atol=1e-7)

    def test_opaque_slab_depth(self):
        # density concentrated in sample 10 -> all weight there
        k = 64
        sigma = jnp.zeros((1, k)).at[0, 10].set(1e6)
        delta = jnp.full((1, k), 2.0 / k)
        z_mid = jnp.linspace(0, 2, k)[None]
        w, _, _ = render_weights(sigma, delta)
        depth = accumulate(w, z_mid)
        np.testing.assert_allclose(float(depth[0]), float(z_mid[0, 10]), rtol=1e-5)
        np.testing.assert_allclose(float(accumulate(w)[0]), 1.0, rtol=1e-6)

    def test_infinite_last_delta_saturates_weights(self):
        sigma = jnp.full((3, 16), 0.5)
        delta = jnp.full((3, 16), 0.01)
        mask = jnp.ones((3, 16), dtype=bool)
        delta_inf = set_last_valid(delta, mask, 1e10)
        w, _, _ = render_weights(sigma, delta_inf, mask)
        np.testing.assert_allclose(np.asarray(accumulate(w)), 1.0, rtol=1e-6)


class TestSetLastValid:
    def test_respects_mask_tail(self):
        mask = jnp.asarray([[True, True, True, False, False],
                            [True, True, True, True, True],
                            [False, False, False, False, False]])
        delta = jnp.ones((3, 5))
        out = np.asarray(set_last_valid(delta, mask, 99.0))
        assert out[0, 2] == 99.0 and out[0, 4] == 1.0
        assert out[1, 4] == 99.0
        assert out[2, 4] == 99.0  # all-invalid ray: harmless (density masked to 0)


class TestExitTransmittance:
    def test_matches_explicit_product(self, rng):
        sigma = rng.random((16, 32)).astype(np.float64) * 3
        delta = rng.random((16, 32)).astype(np.float64) * 0.05
        mask = np.ones((16, 32), dtype=bool)
        mask[:, 25:] = False  # out-of-cube tail
        t = np.asarray(exit_transmittance(jnp.asarray(sigma), jnp.asarray(delta), jnp.asarray(mask)))
        # exclusive T at the last valid sample (index 24): product over j < 24
        expected = np.exp(-(sigma[:, :24] * delta[:, :24]).sum(1))
        np.testing.assert_allclose(t, expected, rtol=1e-10)

    def test_no_valid_samples_is_fully_lit(self):
        sigma = jnp.full((2, 8), 10.0)
        delta = jnp.full((2, 8), 0.1)
        mask = jnp.zeros((2, 8), dtype=bool)
        np.testing.assert_allclose(np.asarray(exit_transmittance(sigma, delta, mask)), 1.0)


class TestSampling:
    def test_stratified_bounds_and_order(self):
        key = jax.random.PRNGKey(0)
        near = jnp.zeros((32,))
        z = stratified_z_vals(key, near, near + 2.0, 128, perturb=True)
        assert z.shape == (32, 128)
        assert float(z.min()) >= 0.0 and float(z.max()) <= 2.0
        assert bool(jnp.all(jnp.diff(z, axis=-1) > 0))  # jitter keeps ordering

    def test_unperturbed_is_linspace(self):
        key = jax.random.PRNGKey(0)
        near = jnp.asarray([1.0])
        z = stratified_z_vals(key, near, near + 2.0, 5, perturb=False)
        np.testing.assert_allclose(np.asarray(z[0]), [1.0, 1.5, 2.0, 2.5, 3.0], rtol=1e-6)

    def test_intervals(self):
        z = jnp.asarray([[0.0, 1.0, 3.0]])
        ts, te, zm, dl = intervals_from_z(z)
        np.testing.assert_allclose(np.asarray(zm[0]), [0.5, 2.0])
        np.testing.assert_allclose(np.asarray(dl[0]), [1.0, 2.0])

    def test_cube_mask(self):
        xyz = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.5, -0.99, 0.2], [0, 0, -1.01]])
        np.testing.assert_array_equal(np.asarray(cube_mask(xyz)), [True, False, True, False])
