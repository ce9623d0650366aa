"""CLI surface: reference flag names map onto TrainConfig; dead reference
flags are tolerated with a warning instead of crashing."""

import numpy as np
import pytest

from eonerf_code_tpu.cli import build_parser, config_from_args


class TestCLI:
    def test_reference_flag_names(self):
        cfg = config_from_args([
            "--root_dir", "/data/root", "--img_dir", "/data/img",
            "--gt_dir", "/data/gt", "--exp_name", "run1",
            "--model", "eo-nerf", "--img_downscale", "2",
            "--max_train_steps", "300000", "--fc_units", "256",
            "--fc_layers", "8", "--n_samples", "128", "--batch_size", "1024",
            "--geometric_shadows", "--radiometric_normalization",
        ])
        assert cfg.root_dir == "/data/root"
        assert cfg.net_width == 256 and cfg.net_depth == 8
        assert cfg.max_train_steps == 300000
        assert cfg.radiometric_normalization  # also forced by model == eo-nerf
        assert cfg.geometric_shadows

    def test_dead_reference_flags_tolerated(self, capsys):
        cfg = config_from_args([
            "--root_dir", "/r", "--noise_std", "0.5", "--sc_lambda", "0.1",
        ])
        assert cfg.root_dir == "/r"
        err = capsys.readouterr().err
        assert "ignoring flag --noise_std 0.5" in err

    def test_n_importance_is_real_now(self):
        cfg = config_from_args(["--root_dir", "/r", "--n_importance", "64"])
        assert cfg.n_importance == 64

    def test_sc_n_samples_flag(self, tmp_path):
        from eonerf_code_tpu.config import TrainConfig

        cfg = config_from_args(["--root_dir", "/r", "--n_samples", "128",
                                "--sc_n_samples", "64"])
        assert cfg.sc_n_samples == 64
        p = str(tmp_path / "opts.json")
        cfg.save(p)
        assert TrainConfig.load(p).sc_n_samples == 64
        # default -1 = auto rule: min(n, max(n//2, 64)) — the round-4
        # on-chip A/B operating point; 0 = follow n_samples (reference rule)
        dflt = config_from_args(["--root_dir", "/r"])
        assert dflt.sc_n_samples == -1
        assert dflt.resolve_sc_n_samples() == 64          # n=128 -> 64
        ref = config_from_args(["--root_dir", "/r", "--sc_n_samples", "0"])
        assert ref.resolve_sc_n_samples() == ref.n_samples
        # tiny camera counts never get MORE shadow samples than camera ones
        assert TrainConfig(n_samples=32).resolve_sc_n_samples() == 32
        # only -1/0 are sentinels: other negatives fail loudly at resolve
        # time instead of flowing into the shadow-march shape math
        with pytest.raises(ValueError, match="sc_n_samples"):
            TrainConfig(sc_n_samples=-2).resolve_sc_n_samples()

    def test_subset_flag_maps(self):
        cfg = config_from_args(["--root_dir", "/r", "--subset_Nviews", "9"])
        assert cfg.subset_n_views == 9

    def test_resume_flag(self):
        cfg = config_from_args(["--root_dir", "/r", "--ckpt_path", "/ck/epoch=3"])
        assert cfg.ckpt_path == "/ck/epoch=3"

    def test_config_json_roundtrip(self, tmp_path):
        from eonerf_code_tpu.config import TrainConfig

        cfg = config_from_args(["--root_dir", "/r", "--batch_size", "2048"])
        p = str(tmp_path / "opts.json")
        cfg.save(p)
        cfg2 = TrainConfig.load(p)
        assert cfg2.batch_size == 2048 and cfg2.root_dir == "/r"


def test_extension_flags_round_trip():
    from eonerf_code_tpu.cli import config_from_args

    cfg = config_from_args([
        "--root_dir", "/x", "--occ_tighten", "--occ_tighten_start_step", "500",
        "--use_pallas", "false", "--lr_decay_steps", "3000",
        "--first_shadow_step", "6000", "--steps_per_call", "50",
        "--device_eval", "--compute_dtype", "bfloat16"])
    assert cfg.occ_tighten is True
    assert cfg.occ_tighten_shadows is None  # follows occ_tighten
    assert cfg.occ_tighten_start_step == 500
    assert cfg.use_pallas is False
    assert cfg.lr_decay_steps == 3000
    assert cfg.first_shadow_step == 6000
    assert cfg.steps_per_call == 50
    assert cfg.device_eval is True

    cfg2 = config_from_args(["--root_dir", "/x", "--occ_tighten",
                             "--no_occ_tighten_shadows"])
    assert cfg2.occ_tighten_shadows is False
