"""Anatomize the train step on the real chip: where does the time go, and
why does throughput anti-scale with batch size?

Variants (each a single jitted program; timed via chained dependency +
scalar fetch, same methodology as bench.py):
  fwd        - loss forward only (camera + shadow + losses), no grad
  grad       - value_and_grad + adam (the bench step)
  grad_remat - same but the field evaluations are jax.checkpoint'ed
  grad_pallas- same but the field is the fused Pallas kernels

Usage: python scripts/profile_step.py [bs ...]
"""

import sys
import time

import numpy as np


def make_batch(n_rays, n_images=10, seed=0):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    o = np.zeros((n_rays, 3), np.float32)
    o[:, 0] = rng.uniform(-0.9, 0.9, n_rays)
    o[:, 1] = rng.uniform(-0.9, 0.9, n_rays)
    o[:, 2] = 0.999
    d = np.tile(np.array([0.05, 0.02, -1.0], np.float32), (n_rays, 1))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    sun = np.tile(np.array([0.3, 0.2, -0.93], np.float32), (n_rays, 1))
    sun /= np.linalg.norm(sun, axis=1, keepdims=True)
    rays = np.hstack([o, d, np.zeros((n_rays, 1), np.float32),
                      2.0 * np.ones((n_rays, 1), np.float32), sun]).astype(np.float32)
    return {
        "rays": jnp.asarray(rays),
        "ts": jnp.asarray(rng.integers(0, n_images, n_rays).astype(np.int32)),
        "rgbs": jnp.asarray(rng.random((n_rays, 3)).astype(np.float32)),
    }


def flops_per_ray(n_samples=128):
    """Approximate matmul FLOPs per ray for the full grad step."""
    k = n_samples - 1
    trunk = 63 * 256 + 6 * 256 * 256 + 319 * 256
    heads = 256 * 1 + 256 * 256 + 256 * 128 + 128 * 3 + 260 * 128 + 3 * 128 * 128 + 2 * 128
    cam_fwd = (trunk + heads) * k
    sh_fwd = (trunk + 256) * k
    fwd = 2 * (cam_fwd + sh_fwd)          # MACs -> FLOPs
    return fwd * 3                         # fwd + ~2x for bwd


def build(variant, n_images=10, n_samples=128, scan_steps=20, dtype_name="bfloat16"):
    import jax
    import jax.numpy as jnp
    import optax

    from eonerf_code_tpu.data.rays import satrays_from_tensor
    from eonerf_code_tpu.models.eonerf import EONerfField
    from eonerf_code_tpu.models.fused import PallasField
    from eonerf_code_tpu.render.satellite import RenderConfig, render_rays
    from eonerf_code_tpu.utils import metrics as M

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    base_field = EONerfField(n_images=n_images, compute_dtype=dtype)
    params = base_field.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 3)),
                             jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32),
                             method="init_all")
    field = PallasField(base_field) if variant == "grad_pallas" else base_field
    optimizer = optax.adam(5e-4)
    opt_state = optimizer.init(params)
    rcfg = RenderConfig(n_samples=n_samples, sc_n_samples=n_samples)

    def loss_fn(p, batch, key):
        rays = satrays_from_tensor(batch["rays"], batch["ts"])
        out = render_rays(field, p, rays, key, rcfg, shadows=True)
        loss, _ = M.uncertainty_aware_loss(batch["rgbs"], out["rgb"], out["beta"])
        return loss

    if variant == "grad_remat":
        loss_fn = jax.checkpoint(loss_fn, static_argnums=())

    if variant == "fwd":
        @jax.jit
        def step(params, opt_state, batch, keys):
            def body(carry, key):
                # chain through a param perturbation so scan iterations are
                # sequentially dependent like the real step
                p, o = carry
                loss = loss_fn(p, batch, key)
                return (jax.tree.map(lambda a: a, p), o), loss
            (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), keys)
            return params, opt_state, losses[-1]
    else:
        @jax.jit
        def step(params, opt_state, batch, keys):
            def body(carry, key):
                p, o = carry
                loss, grads = jax.value_and_grad(loss_fn)(p, batch, key)
                updates, o = optimizer.update(grads, o, p)
                return (optax.apply_updates(p, updates), o), loss
            (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), keys)
            return params, opt_state, losses[-1]

    def run(params, opt_state, batch, key):
        keys = jax.random.split(key, scan_steps)
        return step(params, opt_state, batch, keys)

    return run, params, opt_state, scan_steps


def time_variant(variant, bs, iters=4, scan_steps=20, n_samples=128):
    import jax
    run, params, opt_state, scan_steps = build(variant, scan_steps=scan_steps,
                                               n_samples=n_samples)
    batch = make_batch(bs)
    key = jax.random.PRNGKey(0)
    p, o = params, opt_state
    t0 = time.perf_counter()
    p, o, loss = run(p, o, batch, jax.random.fold_in(key, 0))
    _ = float(loss)
    compile_s = time.perf_counter() - t0
    p, o, loss = run(p, o, batch, jax.random.fold_in(key, 1))
    _ = float(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        p, o, loss = run(p, o, batch, jax.random.fold_in(key, 100 + i))
    _ = float(loss)
    dt = time.perf_counter() - t0
    per_step_ms = dt / (iters * scan_steps) * 1e3
    rays_s = bs * iters * scan_steps / dt
    gflop_ray = flops_per_ray(n_samples) / 1e9
    tflops = rays_s * gflop_ray / 1e3
    return dict(per_step_ms=round(per_step_ms, 2), rays_s=round(rays_s),
                est_tflops=round(tflops, 1), compile_s=round(compile_s, 1))


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1024, 4096, 8192]
    variants = ["fwd", "grad", "grad_remat", "grad_pallas"]
    for v in variants:
        for bs in sizes:
            try:
                r = time_variant(v, bs)
                print(f"{v:12s} bs={bs:6d}  {r}", flush=True)
            except Exception as e:
                print(f"{v:12s} bs={bs:6d}  FAILED: {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
