"""Weight-entropy geometry-quality gate for occupancy tightening.

The occupied-fraction stability gate can pass on a stable-but-WRONG grid
(the wide-envelope divergence documented in STATUS round 2); the entropy
gate requires the probe rays' compositing-weight distributions to look
surface-like before the sampler is allowed to trust the grid."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eonerf_code_tpu.ops.volrend import weight_entropy


class TestWeightEntropy:
    def test_delta_distribution_is_zero(self):
        w = jnp.zeros((3, 32)).at[:, 7].set(0.9)
        h = weight_entropy(w)
        assert float(jnp.max(h)) < 0.02

    def test_uniform_distribution_is_one(self):
        w = jnp.full((3, 32), 1.0 / 32)
        h = weight_entropy(w)
        np.testing.assert_allclose(np.asarray(h), 1.0, atol=1e-5)

    def test_floaters_raise_entropy(self):
        surface = jnp.zeros((1, 64)).at[:, 40].set(0.8)
        floaters = surface.at[:, 5].set(0.25).at[:, 20].set(0.25)
        assert float(weight_entropy(floaters)[0]) > \
            float(weight_entropy(surface)[0]) + 0.1

    def test_scale_invariant(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.random((4, 16)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(weight_entropy(w)),
                                   np.asarray(weight_entropy(w * 7.3)),
                                   rtol=1e-4)


@pytest.fixture()
def trainer(tmp_path):
    from eonerf_code_tpu.config import preset
    from eonerf_code_tpu.data.synthetic import SyntheticSceneSpec, generate_scene
    from eonerf_code_tpu.train.loop import Trainer

    info = generate_scene(str(tmp_path / "scene"),
                          SyntheticSceneSpec(n_views=2, n_test_views=1,
                                             img_size=24))
    cfg = preset("synthetic", root_dir=info["root_dir"],
                 img_dir=info["img_dir"], logs_dir=str(tmp_path / "logs"),
                 max_train_steps=4, batch_size=64, n_samples=8,
                 net_width=32, occ_enabled=True, n_grid=16,
                 occ_tighten=True, occ_tighten_start_step=2,
                 occ_entropy_max=0.9, steps_per_call=4)
    return Trainer(cfg)


class TestGateWiring:
    def test_gate_blocks_until_entropy_drops(self, trainer):
        tr = trainer
        tr._occ_frac_hist = [0.30, 0.31, 0.30, 0.30, 0.30]  # frac-stable
        # no probe history yet -> gate closed even though frac is stable
        assert tr._occ_for_sampling(step=2) is None
        tr._entropy_hist = [0.95]                           # unresolved
        assert tr._occ_for_sampling(step=2) is None
        tr._entropy_hist = [0.95, 0.42]                     # resolved
        assert tr._occ_for_sampling(step=2) is tr.occ_grid

    def test_probe_returns_unit_interval_scalar(self, trainer):
        h = trainer._weight_entropy()
        assert 0.0 <= h <= 1.0

    def test_disabled_gate_preserves_old_behavior(self, trainer):
        tr = trainer
        tr.cfg.occ_entropy_max = None
        tr._occ_frac_hist = [0.30, 0.31, 0.30, 0.30, 0.30]
        assert tr._occ_for_sampling(step=2) is tr.occ_grid

    def test_history_survives_save_restore(self, trainer, tmp_path):
        import dataclasses

        from eonerf_code_tpu.train.loop import Trainer

        tr = trainer
        tr._occ_frac_hist = [0.3] * 5
        tr._entropy_hist = [0.9, 0.4]
        path = tr.save(epoch_tag=1)
        cfg2 = dataclasses.replace(tr.cfg, ckpt_path=path,
                                   exp_name="resumed")
        tr2 = Trainer(cfg2)
        assert tr2._entropy_hist == [0.9, 0.4]
        assert tr2._occ_frac_hist == [0.3] * 5

    def test_runs_with_gate_enabled(self, trainer):
        # smoke: occ updates run the probe + log the scalar without error
        trainer.cfg.occ_update_every = 2
        trainer.run(max_steps=4)
        assert len(trainer._entropy_hist) >= 1
        assert all(0.0 <= h <= 1.0 for h in trainer._entropy_hist)
