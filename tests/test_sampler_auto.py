"""Automatic sampler selection from the scene altitude envelope (VERDICT
round-2 item 3): compact -> occupancy tightening, wide -> hierarchical,
explicit flags always win, and the resolved flags round-trip through
opts.json so eval/resume never re-guess."""

import os

import pytest

from eonerf_code_tpu.config import TrainConfig
from eonerf_code_tpu.data.synthetic import SyntheticSceneSpec, generate_scene
from eonerf_code_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def compact_scene(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("compact"))
    return generate_scene(out, SyntheticSceneSpec(
        n_views=2, n_test_views=1, img_size=24))  # envelope 34 m


@pytest.fixture(scope="module")
def tall_scene(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tall"))
    return generate_scene(out, SyntheticSceneSpec(
        n_views=2, n_test_views=1, img_size=24, box_height=80.0,
        min_alt=-2.0, max_alt=220.0))


def _cfg(scene, tmp_path, name, **kw):
    base = dict(root_dir=scene["root_dir"], img_dir=scene["img_dir"],
                logs_dir=str(tmp_path), exp_name=name, batch_size=64,
                max_train_steps=1, n_samples=16, net_depth=2, net_width=32,
                n_grid=16, val_freq=10**9)
    base.update(kw)
    return TrainConfig(**base)


def test_envelope_accessor(compact_scene, tall_scene, tmp_path):
    tr = Trainer(_cfg(compact_scene, tmp_path, "env_c", occ_enabled=False))
    lo, hi = tr.train_ds.alt_envelope()
    assert hi - lo == pytest.approx(34.0)
    tr = Trainer(_cfg(tall_scene, tmp_path, "env_t", occ_enabled=False))
    lo, hi = tr.train_ds.alt_envelope()
    assert hi - lo == pytest.approx(222.0)


def test_auto_compact_picks_tightening(compact_scene, tmp_path):
    tr = Trainer(_cfg(compact_scene, tmp_path, "auto_c"))
    assert tr.cfg.sampler == "tighten"
    assert tr.cfg.occ_tighten is True
    assert tr.cfg.n_importance == 0
    assert tr.rcfg.occ_tighten is True


def test_auto_compact_no_grid_is_uniform(compact_scene, tmp_path):
    tr = Trainer(_cfg(compact_scene, tmp_path, "auto_cu", occ_enabled=False))
    assert tr.cfg.sampler == "uniform"
    assert tr.cfg.occ_tighten is False and tr.cfg.n_importance == 0


def test_auto_tall_picks_hierarchical(tall_scene, tmp_path):
    tr = Trainer(_cfg(tall_scene, tmp_path, "auto_t"))
    assert tr.cfg.sampler == "hierarchical"
    assert tr.cfg.occ_tighten is False
    # validated shape: 3/4 coarse + half-of-coarse fine (16 -> 12+6)
    assert tr.cfg.n_samples == 12 and tr.cfg.n_importance == 6
    assert tr.rcfg.n_importance == 6


def test_explicit_flags_win(tall_scene, tmp_path):
    tr = Trainer(_cfg(tall_scene, tmp_path, "expl",
                      occ_tighten=True, occ_tighten_start_step=0))
    assert tr.cfg.sampler == "tighten"
    assert tr.cfg.n_importance == 0


def test_resolution_round_trips_and_is_idempotent(tall_scene, tmp_path):
    tr = Trainer(_cfg(tall_scene, tmp_path, "rt"))
    opts = os.path.join(tr.log_dir, "opts.json")
    cfg2 = TrainConfig.load(opts)
    # opts.json carries the RESOLVED flags
    assert cfg2.sampler == "hierarchical"
    assert (cfg2.n_samples, cfg2.n_importance) == (12, 6)
    # re-constructing a Trainer from the saved opts must not re-shrink
    cfg2.exp_name = "rt2"
    tr2 = Trainer(cfg2)
    assert (tr2.cfg.n_samples, tr2.cfg.n_importance) == (12, 6)
