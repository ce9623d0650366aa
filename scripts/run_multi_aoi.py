#!/usr/bin/env python
"""Multi-AOI scene-parallel training demo (BASELINE configs[4] shape).

Generates two synthetic AOIs and trains both IN ONE jit program over a
("scene", "data") mesh — independent per-AOI models, ray batches sharded
over the data axis. Runs on whatever devices exist (forces an 8-device
virtual CPU topology when only one chip is visible, like the driver's
multichip dryrun).

    python scripts/run_multi_aoi.py [workdir] [steps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(workdir="/tmp/eonerf_multiaoi", steps=60):
    import jax

    if os.environ.get("_EONERF_MULTIAOI_CHILD") == "1":
        # pin CPU BEFORE any backend init (the dev image's sitecustomize
        # force-registers the remote TPU plugin over JAX_PLATFORMS)
        jax.config.update("jax_platforms", "cpu")
    elif len(jax.devices()) < 2:
        # re-exec under a virtual multi-device CPU topology
        import subprocess

        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8").strip()
        env["_EONERF_MULTIAOI_CHILD"] = "1"
        raise SystemExit(subprocess.run(
            [sys.executable, os.path.abspath(__file__), workdir, str(steps)],
            env=env).returncode)

    import numpy as np

    from eonerf_code_tpu.data.satellite import SatelliteDataset
    from eonerf_code_tpu.data.synthetic import SyntheticSceneSpec, generate_scene
    from eonerf_code_tpu.parallel.mesh import make_mesh
    from eonerf_code_tpu.parallel.multi_aoi import MultiAOITrainer

    datasets = []
    for i, (box_h, aoi) in enumerate([(24.0, "SYN_A"), (12.0, "SYN_B")]):
        info = generate_scene(os.path.join(workdir, aoi),
                              SyntheticSceneSpec(n_views=4, n_test_views=1,
                                                 img_size=48, box_height=box_h,
                                                 seed=i),
                              aoi_id=aoi)
        datasets.append(SatelliteDataset(info["root_dir"], info["img_dir"],
                                         split="train"))

    n_dev = len(jax.devices())
    mesh = make_mesh(n_data=n_dev // 2, n_scene=2)
    print(f"mesh: {dict(mesh.shape)} over {n_dev} devices", flush=True)
    trainer = MultiAOITrainer(datasets, mesh, n_samples=32, batch_size=512,
                              net_depth=4, net_width=64)
    losses = trainer.train_steps(int(steps) // 2, shadows=False)
    print(f"step {trainer.step}: per-scene losses {np.asarray(losses)}", flush=True)
    losses = trainer.train_steps(int(steps) - int(steps) // 2, shadows=True)
    print(f"step {trainer.step}: per-scene losses {np.asarray(losses)} (shadows on)",
          flush=True)
    return np.asarray(losses)


if __name__ == "__main__":
    main(*(sys.argv[1:3] or []))
