"""Bundle-adjusted RPC export (eval/export.py + eval CLI --export_rpc):
the learned scene-frame offsets fold back into per-view RPC metadata."""

import json
import os

import numpy as np
import pytest

from eonerf_code_tpu.config import TrainConfig
from eonerf_code_tpu.data.synthetic import SyntheticSceneSpec, generate_scene
from eonerf_code_tpu.eval.export import export_adjusted_rpcs
from eonerf_code_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def trained_ba(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("rpc_export")
    spec = SyntheticSceneSpec(n_views=3, n_test_views=1, img_size=32,
                              dsm_resolution=4.0, rpc_bias_px=2.0, seed=4)
    scene = generate_scene(str(tmp / "scene"), spec)
    cfg = TrainConfig(
        root_dir=scene["root_dir"], img_dir=scene["img_dir"],
        gt_dir=scene["gt_dir"], logs_dir=str(tmp / "logs"), exp_name="ba",
        aoi_id=scene["aoi_id"], batch_size=128, max_train_steps=60,
        n_samples=16, net_depth=2, net_width=32, occ_enabled=False,
        rpc_correction=True, freq_reg_end_step=40, sampler="uniform",
        val_freq=10**9, chunk=1024, steps_per_call=10, save_freq=60)
    tr = Trainer(cfg)
    tr.run(log_every=10**9)
    return tmp, scene, tr


class TestExport:
    def test_exported_metadata_consistent(self, trained_ba):
        tmp, scene, tr = trained_ba
        out_dir = str(tmp / "rpc_adjusted")
        exported = export_adjusted_rpcs(str(tmp / "logs" / "ba"), out_dir)
        assert len(exported) == 3
        emb = np.asarray(
            tr.params["params"]["ray_correction_enc"]["embedding"])
        assert np.abs(emb).max() > 0  # offsets trained

        for name in scene["names"][:3]:
            info = exported[name]
            with open(info["path"]) as f:
                meta = json.load(f)
            with open(os.path.join(scene["root_dir"], name + ".json")) as f:
                orig = json.load(f)
            # corrected offsets = published offsets - applied shift
            np.testing.assert_allclose(
                meta["rpc"]["col_offset"],
                orig["rpc"]["col_offset"] - info["d_col"], rtol=0, atol=1e-9)
            np.testing.assert_allclose(
                meta["rpc"]["row_offset"],
                orig["rpc"]["row_offset"] - info["d_row"], rtol=0, atol=1e-9)
            # polynomials and scales pass through untouched
            assert meta["rpc"]["col_num"] == orig["rpc"]["col_num"]
            assert meta["rpc"]["col_scale"] == orig["rpc"]["col_scale"]
            # audit record present and matches
            np.testing.assert_allclose(meta["rpc_adjustment_px"]["d_col"],
                                       info["d_col"])

    def test_rejects_non_ba_run(self, trained_ba, tmp_path):
        tmp, scene, _ = trained_ba
        cfg = TrainConfig(
            root_dir=scene["root_dir"], img_dir=scene["img_dir"],
            gt_dir=scene["gt_dir"], logs_dir=str(tmp_path / "logs"),
            exp_name="noba", aoi_id=scene["aoi_id"], batch_size=128,
            max_train_steps=10, n_samples=8, net_depth=2, net_width=16,
            occ_enabled=False, sampler="uniform", val_freq=10**9,
            chunk=512, steps_per_call=5, save_freq=10,
            cache_dir=str(tmp_path / "cache"))
        Trainer(cfg).run(log_every=10**9)
        with pytest.raises(ValueError, match="rpc_correction"):
            export_adjusted_rpcs(str(tmp_path / "logs" / "noba"),
                                 str(tmp_path / "out"))

    def test_cli_flag(self, trained_ba, tmp_path):
        from eonerf_code_tpu.cli import eval_cli

        tmp, scene, _ = trained_ba
        out = eval_cli([
            "ba", "--logs_dir", str(tmp / "logs"),
            "--output_dir", str(tmp_path / "eval"), "--export_rpc"])
        assert out["rpc_adjusted_views"] == 3
        assert os.path.isdir(out["rpc_adjusted_dir"])
