"""Coarse-to-fine PE frequency regularization (BARF-style): the mask math,
the parameter-space folding identity, and the trainer wiring.

The reference allocates `freq_mask` on its encoder and leaves it all-ones
forever (radiance_fields/mlp.py:182,207); here it is implemented for real
as the standard companion of RPC bundle adjustment."""

import jax
import jax.numpy as jnp
import numpy as np

from eonerf_code_tpu.models.encoders import (
    barf_alpha, barf_freq_mask, sinusoidal_encode, sinusoidal_latent_dim,
)
from eonerf_code_tpu.models.freq_reg import mask_trunk_pe
from eonerf_code_tpu.models.mlp import MLP


class TestMask:
    def test_alpha_ramp(self):
        assert float(barf_alpha(0, 100, 500, 10)) == 0.0
        assert float(barf_alpha(100, 100, 500, 10)) == 0.0
        np.testing.assert_allclose(float(barf_alpha(300, 100, 500, 10)), 5.0)
        assert float(barf_alpha(500, 100, 500, 10)) == 10.0
        assert float(barf_alpha(9999, 100, 500, 10)) == 10.0

    def test_mask_endpoints_and_layout(self):
        L, x_dim = 10, 3
        m0 = np.asarray(barf_freq_mask(0.0, x_dim, 0, L))
        m_full = np.asarray(barf_freq_mask(float(L), x_dim, 0, L))
        assert m0.shape == (sinusoidal_latent_dim(x_dim, 0, L),)
        # identity always passes; all bands off at alpha=0
        np.testing.assert_allclose(m0[:3], 1.0)
        np.testing.assert_allclose(m0[3:], 0.0)
        np.testing.assert_allclose(m_full, 1.0)
        # alpha=2.5: bands 0,1 fully on, band 2 eased, bands 3+ off —
        # degree-major, mirrored in the sin and cos halves
        m = np.asarray(barf_freq_mask(2.5, x_dim, 0, L))
        sin = m[3:33].reshape(L, x_dim)
        cos = m[33:63].reshape(L, x_dim)
        np.testing.assert_allclose(sin, cos)
        np.testing.assert_allclose(sin[0], 1.0)
        np.testing.assert_allclose(sin[1], 1.0)
        np.testing.assert_allclose(sin[2], 0.5)  # cos-eased midpoint
        np.testing.assert_allclose(sin[3:], 0.0)
        # monotone in alpha
        for a in (0.5, 1.5, 7.7):
            lo = np.asarray(barf_freq_mask(a, x_dim, 0, L))
            hi = np.asarray(barf_freq_mask(a + 0.3, x_dim, 0, L))
            assert (hi >= lo - 1e-7).all()

    def test_param_fold_identity(self):
        """trunk(pe * mask) == masked-params trunk(pe), including through
        skip concats — the identity that lets the fused kernels (which build
        PE in-kernel) anneal without kernel changes."""
        L, x_dim = 6, 3
        latent = sinusoidal_latent_dim(x_dim, 0, L)
        mlp = MLP(output_dim=8, net_depth=6, net_width=32, skip_layer=2)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(17, x_dim)),
                        jnp.float32)
        pe = sinusoidal_encode(x, 0, L)
        params = mlp.init(jax.random.PRNGKey(1), pe)
        mask = barf_freq_mask(2.3, x_dim, 0, L)

        ref = mlp.apply(params, pe * mask)
        masked = mask_trunk_pe({"params": {"trunk": params["params"]}}, mask)
        got = mlp.apply({"params": masked["params"]["trunk"]}, pe)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def test_field_density_fold_identity(self):
        """Same identity on the real EONerfField (depth 8, skip at 4)."""
        from eonerf_code_tpu.models.eonerf import EONerfField

        field = EONerfField(n_images=2)
        params = field.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 3)),
                            jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32),
                            method="init_all")
        x = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, (11, 3)),
                        jnp.float32)
        mask = barf_freq_mask(4.6, 3, 0, field.pos_enc_deg)
        masked = mask_trunk_pe(params, mask)
        got = field.apply(masked, x, method="density")

        # reference: mask the encoder output by monkey-level recompute
        pe = sinusoidal_encode(x, 0, field.pos_enc_deg) * mask
        import flax.linen as nn

        trunk = MLP(net_depth=field.net_depth, net_width=field.net_width,
                    skip_layer=field.skip_layer)
        h = trunk.apply({"params": params["params"]["trunk"]}, pe)
        sw = params["params"]["sigma_head"]["output"]["kernel"]
        sb = params["params"]["sigma_head"]["output"]["bias"]
        ref = nn.softplus(h @ sw + sb)[..., 0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref).ravel(),
                                   rtol=1e-5, atol=1e-6)


class TestConfigValidation:
    def test_start_without_end_rejected(self):
        from eonerf_code_tpu.config import TrainConfig
        import pytest

        with pytest.raises(ValueError, match="freq_reg_end_step"):
            TrainConfig(root_dir=".", freq_reg_start_step=2000)
        with pytest.raises(ValueError, match="must be <"):
            TrainConfig(root_dir=".", freq_reg_start_step=5000,
                        freq_reg_end_step=4000)

    def test_layout_mismatch_rejected(self):
        """A mask whose length does not match trunk layer 0 must raise, not
        silently corrupt arbitrary layers (e.g. a net whose width equals the
        PE latent dim)."""
        import jax, pytest

        mlp = MLP(output_dim=4, net_depth=2, net_width=63, skip_layer=None)
        x = jnp.zeros((2, 63))
        params = mlp.init(jax.random.PRNGKey(0), x)
        mask = barf_freq_mask(2.0, 3, 0, 10)  # 63 wide — matches width, but
        wrapped = {"params": {"trunk": params["params"]}}
        # hidden_0 input dim IS 63 here, so the fold applies to layer 0 and
        # leaves the (63, 63) hidden_1 alone (name-matched, not shape-matched)
        out = mask_trunk_pe(wrapped, mask)
        np.testing.assert_allclose(
            np.asarray(out["params"]["trunk"]["hidden_1"]["kernel"]),
            np.asarray(params["params"]["hidden_1"]["kernel"]))
        # and a genuine layout mismatch raises
        with pytest.raises(ValueError, match="PE layout mismatch"):
            mask_trunk_pe(wrapped, barf_freq_mask(2.0, 3, 0, 8))


class TestTrainerWiring:
    def test_pe_mask_block_shapes_and_off(self, tmp_path):
        from eonerf_code_tpu.config import TrainConfig
        from eonerf_code_tpu.data.synthetic import SyntheticSceneSpec, generate_scene
        from eonerf_code_tpu.train.loop import Trainer

        spec = SyntheticSceneSpec(n_views=2, n_test_views=1, img_size=16,
                                  dsm_resolution=4.0)
        scene = generate_scene(str(tmp_path / "scene"), spec)
        base = dict(
            root_dir=scene["root_dir"], img_dir=scene["img_dir"],
            gt_dir=scene["gt_dir"], logs_dir=str(tmp_path / "logs"),
            aoi_id=scene["aoi_id"], batch_size=64, max_train_steps=8,
            n_samples=8, net_depth=2, net_width=16, occ_enabled=False,
            val_freq=10**9, chunk=256, steps_per_call=4, sampler="uniform")
        tr_off = Trainer(TrainConfig(exp_name="off", **base))
        assert tr_off._pe_mask_block(0, 4) is None

        tr_on = Trainer(TrainConfig(exp_name="on", freq_reg_end_step=6,
                                    freq_reg_start_step=2, **base))
        m = tr_on._pe_mask_block(0, 4)
        assert m.shape == (4, 63)
        # step 0-2: alpha 0 -> identity only
        np.testing.assert_allclose(np.asarray(m[0, 3:]), 0.0)
        np.testing.assert_allclose(np.asarray(m[0, :3]), 1.0)
        # ramp is monotone across the block
        assert float(m[3].sum()) > float(m[1].sum())
        # trains end-to-end through the masked megastep
        stats = tr_on.run(log_every=4)
        assert stats["steps"] == 8
        # past the ramp the masks are exactly all-ones
        np.testing.assert_allclose(np.asarray(tr_on._pe_mask_block(6, 2)), 1.0)

    def test_consumers_see_masked_params_mid_ramp(self, tmp_path):
        """Every out-of-loss consumer (occ updates, validation renders,
        entropy probe) must read params through the step's PE mask: the
        masked trunk rows get zero gradient and sit at RANDOM init, so raw
        params mid-ramp mix trained structure with noise. Eval of a
        mid-ramp checkpoint applies the same mask at restore."""
        from eonerf_code_tpu.config import TrainConfig
        from eonerf_code_tpu.data.synthetic import SyntheticSceneSpec, generate_scene
        from eonerf_code_tpu.models.freq_reg import mask_trunk_pe
        from eonerf_code_tpu.train.loop import Trainer

        spec = SyntheticSceneSpec(n_views=2, n_test_views=1, img_size=16,
                                  dsm_resolution=4.0)
        scene = generate_scene(str(tmp_path / "scene"), spec)
        cfg = TrainConfig(
            root_dir=scene["root_dir"], img_dir=scene["img_dir"],
            gt_dir=scene["gt_dir"], logs_dir=str(tmp_path / "logs"),
            exp_name="ramp", aoi_id=scene["aoi_id"], batch_size=64,
            max_train_steps=6, n_samples=8, net_depth=2, net_width=16,
            occ_enabled=False, val_freq=10**9, chunk=256, steps_per_call=3,
            sampler="uniform", freq_reg_end_step=100, save_freq=6)
        tr = Trainer(cfg)
        tr.run(log_every=10**9)
        assert tr.step == 6 < cfg.freq_reg_end_step
        # mid-ramp: _reg_params is the masked view, not raw
        masked = tr._reg_params()
        k_raw = np.asarray(tr.params["params"]["trunk"]["hidden_0"]["kernel"])
        k_masked = np.asarray(masked["params"]["trunk"]["hidden_0"]["kernel"])
        assert not np.allclose(k_raw, k_masked)
        expected = mask_trunk_pe(tr.params, np.asarray(tr._pe_mask_block(6, 1))[0])
        np.testing.assert_allclose(
            k_masked,
            np.asarray(expected["params"]["trunk"]["hidden_0"]["kernel"]))

        # eval restore of the mid-ramp checkpoint applies the same mask
        from eonerf_code_tpu.eval.run import load_run

        _, _, params = load_run(tr.log_dir)
        np.testing.assert_allclose(
            np.asarray(params["params"]["trunk"]["hidden_0"]["kernel"]),
            np.asarray(expected["params"]["trunk"]["hidden_0"]["kernel"]),
            rtol=1e-6, atol=1e-7)
