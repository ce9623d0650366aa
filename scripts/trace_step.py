"""Capture a device trace of the scanned production megastep and print the
per-op time breakdown (top HLO ops by self-time).

Usage: python scripts/trace_step.py [bs] [scan_steps] [outdir]
"""

import os
import sys

sys.path.insert(0, "/root/repo")


def capture(bs=8192, scan_steps=5, outdir="/tmp/trace_step"):
    import jax

    from bench import build_step, make_batch

    train_step, params, opt_state = build_step(scan_steps=scan_steps)
    batch = make_batch(bs)
    key = jax.random.PRNGKey(0)
    p, o = params, opt_state
    # warmup/compile outside the trace
    for i in range(2):
        p, o, loss = train_step(p, o, batch, jax.random.fold_in(key, i))
    _ = float(loss)

    jax.profiler.start_trace(outdir)
    p, o, loss = train_step(p, o, batch, jax.random.fold_in(key, 99))
    _ = float(loss)
    jax.profiler.stop_trace()
    print("trace done", flush=True)
    return outdir


def summarize(outdir):
    """Per-op device-time breakdown; see scripts/xplane_summary.py (run with
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python — this image's
    tensorboard_plugin_profile converter is incompatible with its TF)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from xplane_summary import summarize as xs

    xs(outdir)


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    ss = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    outdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/trace_step"
    capture(bs, ss, outdir)
    summarize(outdir)
