"""Profiling hooks (SURVEY §5: the reference has none — only wall-clock
prints every 1000 steps).

- `trace(log_dir)`: context manager around `jax.profiler.trace`, viewable
  in TensorBoard's profile plugin / Perfetto.
- `device_timer`: robust wall-clock timing of device work on REMOTE-ATTACHED
  backends (axon): completion is forced by fetching a host scalar derived
  from the result, because `block_until_ready` alone is not a reliable
  barrier through the tunnel (measured: it returns before execution
  completes, inflating throughput ~20x).
- `Throughput`: a rays/sec counter (the north-star metric).
"""

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force_completion(tree):
    """Synchronize with device work by reducing one leaf to a host scalar."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jnp.sum(leaf).astype(jnp.float32))


def device_timer(fn, *args, iters=10, warmup=2, **kwargs):
    """Average seconds per call of a device function, tunnel-safe."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    force_completion(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    force_completion(out)
    return (time.perf_counter() - t0) / iters


class Throughput:
    def __init__(self):
        self.t0 = time.time()
        self.units = 0

    def add(self, n):
        self.units += n

    def per_sec(self):
        dt = time.time() - self.t0
        return self.units / dt if dt > 0 else 0.0
