"""scripts/supervise.py: stall detection + restart via the launcher's
auto-resume. Uses a fake child that stalls on its first launch and
completes on its second, so the test exercises the full kill/relaunch
cycle without any device."""

import os
import sys
import textwrap

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from supervise import supervise  # noqa: E402

CHILD = textwrap.dedent("""
    import os, sys, time
    metrics, sentinel = sys.argv[1], sys.argv[2]
    with open(metrics, "a") as f:
        f.write("tick\\n")
    if os.path.exists(sentinel):      # second launch: finish cleanly
        sys.exit(0)
    open(sentinel, "w").close()       # first launch: stall forever
    time.sleep(3600)
""")


def test_restarts_stalled_child_then_succeeds(tmp_path):
    metrics = str(tmp_path / "metrics.jsonl")
    sentinel = str(tmp_path / "launched_once")
    rc = supervise([sys.executable, "-c", CHILD, metrics, sentinel],
                   metrics, stall_sec=15, grace_sec=5, max_restarts=2,
                   startup_sec=15)
    assert rc == 0
    assert os.path.exists(sentinel)          # first launch happened
    with open(metrics) as f:
        assert f.read().count("tick") == 2   # both launches progressed


def test_gives_up_after_max_restarts(tmp_path):
    metrics = str(tmp_path / "m.jsonl")
    rc = supervise([sys.executable, "-c", "import sys; sys.exit(3)"],
                   metrics, stall_sec=15, grace_sec=5, max_restarts=1,
                   startup_sec=15)
    assert rc == 1
