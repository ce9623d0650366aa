"""Golden-value test of the irradiance + radiometric composite: feed a stub
field with constant outputs and recompute the reference equations by hand
(sat_rendering.py:264-306)."""

import jax
import jax.numpy as jnp
import numpy as np

from eonerf_code_tpu.render.satellite import RenderConfig, render_rays
from tests.test_render import make_rays


class _ConstField:
    """Opaque slab below z=0 with constant head outputs."""

    beta_min = 0.05
    rpc_correction = False

    ALBEDO = np.array([0.6, 0.5, 0.4])
    AMBIENT = np.array([0.3, 0.35, 0.5])
    TS = 0.8
    A = np.array([1.1, 0.9, 1.0])
    B = np.array([0.02, -0.01, 0.0])

    def apply(self, params, *args, method=None):
        if method == "density":
            (pos,) = args
            return jnp.where(pos[..., 2] < 0.0, 1e5, 0.0)
        if method == "radiometric":
            (idx,) = args
            a = jnp.broadcast_to(jnp.asarray(self.A, jnp.float32), (*idx.shape, 3))
            b = jnp.broadcast_to(jnp.asarray(self.B, jnp.float32), (*idx.shape, 3))
            return a, b, jnp.zeros_like(a)
        pos, sun_d, img_idx = args
        sigma = jnp.where(pos[..., 2] < 0.0, 1e5, 0.0)
        alb = jnp.broadcast_to(jnp.asarray(self.ALBEDO, jnp.float32), (*pos.shape[:-1], 3))
        amb = jnp.broadcast_to(jnp.asarray(self.AMBIENT, jnp.float32), (*sun_d.shape[:-1], 3))
        ts = jnp.full((*pos.shape[:-1], 1), self.TS)
        tb = jnp.full((*pos.shape[:-1], 1), 0.1)
        return sigma, alb, amb, ts, tb


def test_composite_matches_hand_computation():
    rng = np.random.default_rng(5)
    field = _ConstField()
    rays = make_rays(rng, 8)
    cfg = RenderConfig(n_samples=256, sc_n_samples=256, perturb=False)
    out = render_rays(field, None, rays, jax.random.PRNGKey(0), cfg, shadows=True)

    # the slab is opaque -> opacity ~ 1, accumulated heads equal the constants
    opacity = np.asarray(out["opacity"])[:, 0]
    np.testing.assert_allclose(opacity, 1.0, atol=1e-5)
    geo = np.asarray(out["geo_shadows"])[:, 0]

    s = geo * field.TS
    albedo = field.ALBEDO[None]
    ambient_acc = field.AMBIENT[None] * opacity[:, None] * 0.2
    rgb_expected = albedo * s[:, None] + (1 - s[:, None]) * ambient_acc * albedo
    rgb_expected = np.clip(field.A[None] * rgb_expected + field.B[None], 0, 1)
    np.testing.assert_allclose(np.asarray(out["rgb"]), rgb_expected, atol=2e-3)

    # beta accumulates the constant + beta_min
    np.testing.assert_allclose(np.asarray(out["beta"])[:, 0], 0.1 + 0.05, atol=1e-4)
    # shadowless = A*albedo + b, not clipped by s
    expected_shadowless = np.broadcast_to(field.A * field.ALBEDO + field.B, (8, 3))
    np.testing.assert_allclose(np.asarray(out["shadowless_rgb"]),
                               expected_shadowless, atol=1e-4)
