"""The multi-AOI CLI user surface: train S scenes in one program from flags
alone, and hand each scene to the existing single-AOI eval stack."""

import os

import jax
import numpy as np
import pytest

from eonerf_code_tpu.data.synthetic import SyntheticSceneSpec, generate_scene
from eonerf_code_tpu.train.multi import main_multi_train, parse_args


@pytest.fixture(scope="module")
def two_scene_dirs(tmp_path_factory):
    infos = []
    for i, (box_h, aoi) in enumerate([(20.0, "SYN_300"), (10.0, "SYN_301")]):
        out = str(tmp_path_factory.mktemp(f"cli_aoi{i}"))
        spec = SyntheticSceneSpec(n_views=3, n_test_views=1, img_size=32,
                                  box_height=box_h, seed=i)
        infos.append(generate_scene(out, spec, aoi_id=aoi))
    return infos


def test_cli_trains_and_writes_eval_compatible_runs(two_scene_dirs, tmp_path):
    infos = two_scene_dirs
    argv = ["--root_dirs", ",".join(i["root_dir"] for i in infos),
            "--img_dirs", ",".join(i["img_dir"] for i in infos),
            "--gt_dirs", ",".join(i["gt_dir"] for i in infos),
            "--aoi_ids", "SYN_300,SYN_301",
            "--logs_dir", str(tmp_path), "--exp_name", "pod",
            "--scene_axis", "2", "--data_axis", "4",
            "--max_train_steps", "6", "--batch_size", "64",
            "--n_samples", "12", "--fc_layers", "2", "--fc_units", "32",
            "--first_shadow_step", "4", "--log_every", "2"]
    stats = main_multi_train(argv)
    assert stats["steps"] == 6 and stats["scenes"] == 2

    from eonerf_code_tpu.eval.run import load_run

    params_by_scene = []
    for aoi in ("SYN_300", "SYN_301"):
        run_dir = os.path.join(str(tmp_path), "pod", aoi)
        assert os.path.exists(os.path.join(run_dir, "opts.json"))
        assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
        # the single-AOI eval loader consumes the run directly
        cfg, field, params = load_run(run_dir)
        assert cfg.aoi_id == aoi and cfg.use_pallas is False
        assert cfg.exp_name == aoi
        assert cfg.net_depth == 2 and cfg.net_width == 32
        leaves = jax.tree_util.tree_leaves(params)
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
        params_by_scene.append(params)

    # scenes trained independently — different parameters
    a = np.asarray(params_by_scene[0]["params"]["trunk"]["hidden_0"]["kernel"])
    b = np.asarray(params_by_scene[1]["params"]["trunk"]["hidden_0"]["kernel"])
    assert not np.allclose(a, b)


def test_cli_arg_validation():
    with pytest.raises(SystemExit):
        main_multi_train(["--root_dirs", "a,b", "--img_dirs", "onlyone",
                          "--exp_name", "x"])
    with pytest.raises(SystemExit):
        # duplicate derived run names (same basename) must be rejected
        main_multi_train(["--root_dirs", "/p/s1,/q/s1",
                          "--img_dirs", "/p/i,/q/i", "--exp_name", "x"])


def test_default_aoi_ids_from_basenames():
    args = parse_args(["--root_dirs", "/data/JAX_068,/data/JAX_004",
                       "--img_dirs", "/i1,/i2", "--exp_name", "e"])
    from eonerf_code_tpu.train.multi import _split
    assert _split(args.aoi_ids) == []
