#!/usr/bin/env python
"""A/B: shadow-march sample count (``--sc_n_samples``).

The shadow pass is a sigma-only march toward the sun from each camera
ray's surface point (reference semantics: /root/reference/sat_rendering.py:87-118,
which hardcodes n_samples-1 shadow samples). Halving it cuts ~1/3 of the
step's trunk-pass matmul FLOPs (camera 4.1 + shadow 3 -> 1.5 units with
recompute), so it is the single biggest remaining throughput lever — IF
sun-visibility quality holds. This script measures that.

Arms (production mode — run on chip, same schedule as
run_production_scale.py):
  scfull — sc_n_samples = n_samples (96)  [parity baseline]
  sc64   — 64 shadow samples
  sc48   — 48
  sc32   — 32

    python scripts/ab_sc_samples.py [workdir] [steps] [arm ...]
    python scripts/ab_sc_samples.py /tmp/ab_sc --small   # CPU directional

--small trains a reduced scene through the full shadow phase on CPU
(float32, uniform sampling) — a directional quality signal only; the
throughput side needs the chip (EONERF_BENCH_SC_SAMPLES in bench.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eonerf_code_tpu.config import TrainConfig  # noqa: E402
from eonerf_code_tpu.data.synthetic import SyntheticSceneSpec, generate_scene  # noqa: E402
from eonerf_code_tpu.train.loop import Trainer  # noqa: E402

ARMS = {
    "scfull": dict(sc_n_samples=0),
    "sc64": dict(sc_n_samples=64),
    "sc48": dict(sc_n_samples=48),
    "sc32": dict(sc_n_samples=32),
    # --small mode swaps these for fractions of its n_samples (see below)
}


def run_arm(scene, workdir, name, steps, small=False, mid=False):
    overrides = dict(ARMS[name])
    if mid:
        # mid-scale CPU arm (~1 step/s on one core): big enough for the
        # shadow phase to shape geometry, small enough to finish in ~1 h
        ratio = {"scfull": 0, "sc64": 32, "sc48": 24, "sc32": 16}
        overrides["sc_n_samples"] = ratio[name]
        size = dict(batch_size=512, n_samples=48, net_depth=4, net_width=96,
                    occ_enabled=False, sampler="uniform", chunk=4096,
                    steps_per_call=25, compute_dtype="float32",
                    lr_decay_steps=1200, first_shadow_step=800,
                    first_beta_step=10**9)
    elif small:
        # keep the RATIO of the production arm: n_samples=32 here, so
        # sc64/96 -> 21, sc48/96 -> 16, sc32/96 -> 11. Toy scale sized for
        # a single CPU core — directional only.
        ratio = {"scfull": 0, "sc64": 21, "sc48": 16, "sc32": 11}
        overrides["sc_n_samples"] = ratio[name]
        size = dict(batch_size=256, n_samples=32, net_depth=2, net_width=64,
                    occ_enabled=False, sampler="uniform", chunk=2048,
                    steps_per_call=25, compute_dtype="float32",
                    lr_decay_steps=600, first_shadow_step=400,
                    first_beta_step=10**9)
    else:
        size = dict(batch_size=4096, n_samples=96, net_depth=8, net_width=256,
                    occ_enabled=True, occ_tighten=True,
                    occ_tighten_start_step=2000, chunk=8192, steps_per_call=50,
                    compute_dtype="bfloat16",
                    lr_decay_steps=3000, first_shadow_step=6000,
                    first_beta_step=12000)
    cfg = TrainConfig(
        root_dir=scene["root_dir"], img_dir=scene["img_dir"], gt_dir=scene["gt_dir"],
        logs_dir=os.path.join(workdir, "logs"), exp_name=f"sc_{name}",
        aoi_id=scene["aoi_id"], cache_dir=os.path.join(workdir, "cache"),
        max_train_steps=steps, val_freq=10**9, **size, **overrides)
    trainer = Trainer(cfg)
    t0 = time.time()
    stats = trainer.run(max_steps=steps, log_every=2000)

    from eonerf_code_tpu.utils import metrics as M
    import jax.numpy as jnp

    sample = trainer.val_ds.get_val_sample(0)
    pred = trainer.render_view(sample, depth_only=True)
    mae = trainer._val_mae(sample, pred)
    test = trainer.val_ds.get_val_sample(1)
    out = trainer.render_view(test)
    psnr = float(M.psnr(jnp.asarray(test["rgbs"]), out["rgb"]))
    print(f"ARM {name}: MAE={mae:.3f} m  PSNR={psnr:.2f} dB  "
          f"rays/s={stats['rays_per_sec']:,.0f}  wall={time.time()-t0:.0f}s  "
          f"[sc_n_samples={cfg.sc_n_samples or cfg.n_samples}]", flush=True)
    return mae, psnr


def main():
    argv = sys.argv[1:]
    small = "--small" in argv
    mid = "--mid" in argv
    argv = [a for a in argv if a not in ("--small", "--mid")]
    if small or mid:
        # pin CPU BEFORE any backend init (the dev image's sitecustomize
        # force-registers the remote TPU plugin over JAX_PLATFORMS)
        import jax

        jax.config.update("jax_platforms", "cpu")
    workdir = argv[0] if argv else "/tmp/ab_sc"
    steps = int(argv[1]) if len(argv) > 1 else \
        (2000 if small else 4000 if mid else 20000)
    arms = argv[2:] or list(ARMS)

    if small:
        spec = SyntheticSceneSpec(
            n_views=5, n_test_views=1, img_size=64, extent=100.0,
            n_buildings=3, box_size=24.0, box_height=18.0,
            dsm_resolution=2.0, radiometric_jitter=0.05, seed=7)
    elif mid:
        spec = SyntheticSceneSpec(
            n_views=6, n_test_views=1, img_size=96, extent=160.0,
            n_buildings=4, box_size=32.0, box_height=20.0,
            dsm_resolution=1.5, radiometric_jitter=0.05, seed=7)
    else:
        spec = SyntheticSceneSpec(
            n_views=10, n_test_views=2, img_size=320, extent=400.0,
            n_buildings=9, box_size=60.0, box_height=24.0,
            dsm_resolution=1.0, radiometric_jitter=0.08, seed=7)
    scene = generate_scene(os.path.join(workdir, "scene"), spec)

    results = {}
    for name in arms:
        results[name] = run_arm(scene, workdir, name, steps, small=small,
                                mid=mid)
    print("\n== summary ==")
    for name, (mae, psnr) in results.items():
        print(f"  {name:8s} MAE={mae:.3f} m  PSNR={psnr:.2f} dB")


if __name__ == "__main__":
    main()
