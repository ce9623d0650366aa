"""Tile-size scan for the fused Pallas field kernels (v2) on the real chip.

Times the full grad megastep (camera + shadow + losses + adam) with the
PallasField at a grid of (tile, bwd_tile), plus the XLA baseline.

Usage: python scripts/scan_pallas_tiles.py [bs]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from scripts.profile_step import make_batch  # noqa: E402


def build(tile, bwd_tile, vmem=None, n_images=10, n_samples=128, scan_steps=20,
          save_acts=False, sc_n_samples=0):
    import jax
    import jax.numpy as jnp
    import optax

    from eonerf_code_tpu.data.rays import satrays_from_tensor
    from eonerf_code_tpu.models.eonerf import EONerfField
    from eonerf_code_tpu.models.fused import PallasField
    from eonerf_code_tpu.render.satellite import RenderConfig, render_rays
    from eonerf_code_tpu.utils import metrics as M

    base = EONerfField(n_images=n_images, compute_dtype=jnp.bfloat16)
    params = base.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 3)),
                       jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32),
                       method="init_all")
    field = (PallasField(base, tile=tile, bwd_tile=bwd_tile,
                        vmem_limit_mb=vmem, save_acts=save_acts) if tile else base)
    optimizer = optax.adam(5e-4)
    opt_state = optimizer.init(params)
    rcfg = RenderConfig(n_samples=n_samples,
                        sc_n_samples=sc_n_samples or n_samples)

    def loss_fn(p, batch, key):
        rays = satrays_from_tensor(batch["rays"], batch["ts"])
        out = render_rays(field, p, rays, key, rcfg, shadows=True)
        loss, _ = M.uncertainty_aware_loss(batch["rgbs"], out["rgb"], out["beta"])
        return loss

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


def time_cfg(tile, bwd_tile, vmem, bs, iters=4, save_acts=False, sc_n_samples=0):
    import jax
    run, params, opt_state, scan_steps = build(tile, bwd_tile, vmem,
                                               save_acts=save_acts,
                                               sc_n_samples=sc_n_samples)
    batch = make_batch(bs)
    key = jax.random.PRNGKey(0)
    p, o = params, opt_state
    p, o, loss = run(p, o, batch, jax.random.fold_in(key, 0))
    _ = float(loss)
    p, o, loss = run(p, o, batch, jax.random.fold_in(key, 1))
    _ = float(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        p, o, loss = run(p, o, batch, jax.random.fold_in(key, 100 + i))
    _ = float(loss)
    dt = time.perf_counter() - t0
    return bs * iters * scan_steps / dt


def main():
    import os

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    # EONERF_SCAN_SAVED=1 + EONERF_SCAN_SC=64 scan at the production
    # operating point (saved activations, auto shadow count) — the saved
    # backward has no recompute workspace, so larger bwd tiles may fit
    save_acts = os.environ.get("EONERF_SCAN_SAVED", "0") == "1"
    sc = int(os.environ.get("EONERF_SCAN_SC", "0"))
    if os.environ.get("EONERF_SCAN_CONFIGS"):
        configs = [tuple(int(v) if v != "None" else None for v in c.split(":"))
                   for c in os.environ["EONERF_SCAN_CONFIGS"].split(",")]
    else:
        configs = [(None, None, None),
                   (1024, 512, None), (2048, 512, None), (4096, 512, None),
                   (2048, 1024, 32), (4096, 1024, 32), (4096, 2048, 64),
                   (8192, 2048, 96)]
    for tile, bwd, vmem in configs:
        label = "xla" if tile is None else f"tile={tile} bwd={bwd} vmem={vmem}"
        try:
            r = time_cfg(tile, bwd, vmem, bs, save_acts=save_acts,
                         sc_n_samples=sc)
            print(f"{label:22s} bs={bs} saved={save_acts} sc={sc}  "
                  f"{r:,.0f} rays/s", flush=True)
        except Exception as e:
            print(f"{label:22s} bs={bs}  FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
