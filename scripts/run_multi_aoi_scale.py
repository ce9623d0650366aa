#!/usr/bin/env python
"""Production-scale validation of the multi-AOI scene-parallel trainer.

Two JAX_068-sized synthetic city blocks (the run_production_scale.py spec,
different seeds) train in ONE jit program on the attached chip — the
framework's pod-scale flagship (BASELINE.json configs[4]) exercised at the
reference's per-AOI operating point: bf16 + fused Pallas kernels, sampler
auto, saved-activations backward, sc auto, the validated production
schedule (lr_decay 3000, shadows from 6000), pod checkpoints + resume.
Each scene then evaluates through the standard eval stack to a registered
DSM MAE.

    python scripts/run_multi_aoi_scale.py [workdir] [steps]

The reference has no multi-AOI mode (one process per AOI,
/root/reference/opt.py:36-37); the single-AOI baseline for these scenes is
MAE 0.33-0.36 m @ 20k steps (BASELINE.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eonerf_code_tpu.data.synthetic import SyntheticSceneSpec, generate_scene  # noqa: E402


def main(workdir="/tmp/eonerf_multi_prod", steps=20000):
    scenes = []
    for i, (aoi, seed) in enumerate([("SYN_810", 7), ("SYN_811", 13)]):
        spec = SyntheticSceneSpec(
            n_views=10, n_test_views=2, img_size=320, extent=400.0,
            n_buildings=9, box_size=60.0, box_height=24.0,
            dsm_resolution=1.0, radiometric_jitter=0.08, seed=seed)
        t0 = time.time()
        scenes.append(generate_scene(os.path.join(workdir, f"scene{i}"),
                                     spec, aoi_id=aoi))
        print(f"scene {aoi} generated in {time.time()-t0:.0f}s", flush=True)

    from eonerf_code_tpu.train.multi import main_multi_train

    argv = [
        "--root_dirs", ",".join(s["root_dir"] for s in scenes),
        "--img_dirs", ",".join(s["img_dir"] for s in scenes),
        "--gt_dirs", ",".join(s["gt_dir"] for s in scenes),
        "--aoi_ids", ",".join(s["aoi_id"] for s in scenes),
        "--logs_dir", os.path.join(workdir, "logs"),
        "--exp_name", "pod",
        "--max_train_steps", str(int(steps)),
        "--batch_size", "4096", "--n_samples", "96",
        "--compute_dtype", "bfloat16",
        # the validated single-AOI production schedule
        # (scripts/run_production_scale.py)
        "--lr_decay_steps", "3000", "--first_shadow_step", "6000",
        "--save_freq", "5000", "--resume",
        "--log_every", "1000",
    ]
    stats = main_multi_train(argv)
    print(f"aggregate: {stats['rays_per_sec']:,.0f} rays/s over "
          f"{stats['scenes']} scenes in one program", flush=True)

    from eonerf_code_tpu.eval.run import eval_eonerf

    for s in scenes:
        out = eval_eonerf(os.path.join("pod", s["aoi_id"]),
                          os.path.join(workdir, "logs"),
                          os.path.join(workdir, "eval"),
                          dsm=True, gt_dir=s["gt_dir"], dsm_resolution=1.0,
                          chunk=16384)
        print(f"{s['aoi_id']}: registered MAE {out['mae']:.3f} m", flush=True)
    return stats


if __name__ == "__main__":
    main(*(sys.argv[1:3] or ["/tmp/eonerf_multi_prod"]))
