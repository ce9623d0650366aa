"""Parse a JAX .xplane.pb trace directly and print per-op device time.

The tensorboard_plugin_profile converter in this image is incompatible with
the installed TF, so aggregate the XSpace proto ourselves: TPU device
planes -> XLA op lines -> event durations, grouped by HLO op name.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
       python scripts/xplane_summary.py [trace_dir] [top_n]
"""

import glob
import os
import re
import sys


def load_xspace(trace_dir):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs, path


def _opcode(text):
    m = re.search(r"\)\s*([a-z0-9\-_]+)\(", text)
    if m:
        return m.group(1)
    m = re.search(r"=\s*\S+\s+([a-z0-9\-_]+)\(", text)
    return m.group(1) if m else "?"


def summarize(trace_dir, top_n=40):
    xs, path = load_xspace(trace_dir)
    print("xplane:", path)
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        by_op = {}    # individual op -> [ps, count]
        by_cat = {}   # opcode -> [ps, count]
        total_ps = 0
        for line in plane.lines:
            if "XLA Ops" not in line.name and line.name != "Ops":
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                cat = _opcode(name)
                if cat in ("while",):   # container: children counted separately
                    continue
                a = by_op.setdefault(name, [0, 0])
                a[0] += ev.duration_ps
                a[1] += 1
                c = by_cat.setdefault(cat, [0, 0])
                c[0] += ev.duration_ps
                c[1] += 1
                total_ps += ev.duration_ps
        if not by_op:
            continue
        print(f"\n== plane {plane.name}: total op time {total_ps/1e9:.3f} ms "
              "(copy-start overlaps compute; while excluded) ==")
        print("-- by opcode --")
        for cat, (ps, cnt) in sorted(by_cat.items(), key=lambda kv: -kv[1][0])[:15]:
            print(f"{ps/1e9:9.3f} ms {100*ps/max(total_ps,1):5.1f}% x{cnt:<6d} {cat}")
        print("-- top individual non-copy ops --")
        rows = [(n, v) for n, v in by_op.items()
                if not n.startswith(("%copy-start", "%copy-done"))]
        rows.sort(key=lambda kv: -kv[1][0])
        for name, (ps, cnt) in rows[:top_n]:
            print(f"{ps/1e9:9.3f} ms {100*ps/max(total_ps,1):5.1f}% x{cnt:<5d} {name[:140]}")


if __name__ == "__main__":
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_step"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    summarize(trace_dir, top_n)
