"""Capture a device trace of the scanned production megastep and print the
per-op time breakdown (top HLO ops by self-time).

Usage: python scripts/trace_step.py [bs] [scan_steps] [outdir]
"""

import glob
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
    """Parse the xplane and print top ops by device self-time."""
    paths = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane found under", outdir)
        return
    path = max(paths, key=os.path.getmtime)
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data([path], "framework_op_stats", {})
    import csv
    import io

    rows = list(csv.DictReader(io.StringIO(data)))
    if not rows:
        print("no rows")
        return
    key_time = None
    for cand in ("total_self_time_us", "self_time_us", "Total self-time (us)",
                 "avg_self_time_us"):
        if cand in rows[0]:
            key_time = cand
            break
    print("columns:", list(rows[0].keys()))
    rows.sort(key=lambda r: -float(r.get(key_time, 0) or 0))
    tot = sum(float(r.get(key_time, 0) or 0) for r in rows)
    print(f"total self time: {tot/1e3:.2f} ms")
    for r in rows[:30]:
        t = float(r.get(key_time, 0) or 0)
        name = r.get("operation", r.get("op_name", r.get("Operation", "?")))
        cat = r.get("category", r.get("type", ""))
        print(f"{t/1e3:9.3f} ms {100*t/tot:5.1f}%  {cat:18s} {name[:90]}")


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    ss = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    outdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/trace_step"
    capture(bs, ss, outdir)
    summarize(outdir)
