"""Kernel-isolation microbench: what do the fused kernels cost alone vs the
full train step? Separates kernel time from XLA glue (sampling/RNG, volume
rendering, losses, adam).

Per bs=8192 train step the field kernels see M = 8192*127 camera points
(fwd + bwd) and the same again for the shadow density (fwd + bwd). This
script times exactly those four kernel invocations chained over `iters`
repetitions, plus fwd-only, and prints implied rays/s-equivalents.
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main(bs=8192, n_samples=128, iters=20):
    import jax
    import jax.numpy as jnp

    from eonerf_code_tpu.models.eonerf import EONerfField
    from eonerf_code_tpu.ops.pallas.fused_field import (
        make_fused_density, make_fused_field, pack_params)

    m = bs * (n_samples - 1)
    field = EONerfField(n_images=10, compute_dtype=jnp.bfloat16)
    params = field.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 3)),
                        jnp.zeros((2, 3)), jnp.zeros((2,), jnp.int32),
                        method="init_all")
    w = pack_params(params)
    fused = make_fused_field(jnp.bfloat16, tile=2048, bwd_tile=1024,
                             vmem_limit_mb=32)
    dens = make_fused_density(jnp.bfloat16, tile=2048, bwd_tile=1024,
                              vmem_limit_mb=32)
    key = jax.random.PRNGKey(1)
    pos = jax.random.uniform(key, (m, 3), minval=-1, maxval=1)
    emb = jax.random.normal(key, (m, 4))

    def field_loss(w, pos):
        sigma, albedo, ts, tb = fused(w, pos, emb)
        return jnp.sum(sigma) * 1e-6 + jnp.sum(albedo) * 1e-6 + jnp.sum(ts + tb) * 1e-6

    def dens_loss(w, pos):
        return jnp.sum(dens(w, pos)) * 1e-6

    @jax.jit
    def grad_step(w, pos):
        # chained: field fwd+bwd AND density fwd+bwd, like one train step
        l1, g1 = jax.value_and_grad(field_loss)(w, pos)
        l2, g2 = jax.value_and_grad(dens_loss)(w, pos)
        return l1 + l2, jax.tree.map(lambda a, b: a + b, g1, g2)

    @jax.jit
    def fwd_step(w, pos):
        return field_loss(w, pos) + dens_loss(w, pos)

    for name, fn, out_scalar in (("fwd ", fwd_step, True),
                                 ("grad", grad_step, False)):
        # warmup
        r = fn(w, pos)
        _ = float(r if out_scalar else r[0])
        t0 = time.perf_counter()
        acc = 0.0
        for i in range(iters):
            r = fn(w, pos)
            acc = acc + (r if out_scalar else r[0])
        _ = float(acc)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name} kernels-only: {dt*1e3:8.2f} ms  -> "
              f"{bs/dt:,.0f} rays/s-equiv", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
