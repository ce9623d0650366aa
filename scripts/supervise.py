#!/usr/bin/env python
"""Stall-detecting supervisor for long training runs.

A remote-attached accelerator (the axon tunnel here, but the same applies
to any preemptible/flaky device fabric) can wedge a client mid-run: the
process stays alive but no step ever completes, so a plain `timeout` burns
the whole budget doing nothing. This supervisor watches the run's
metrics.jsonl for *progress* (new bytes) and kills + relaunches the child
when none appears for `--stall-sec`. Recovery relies on the trainer's
checkpoint/resume path (train/loop.py restore + the occ-gate sidecar) and
the launcher's auto-resume (e.g. scripts/run_production_scale.py picks up
the newest checkpoint in its workdir).

    python scripts/supervise.py --metrics /path/logs/exp/metrics.jsonl \
        --stall-sec 600 --max-restarts 5 -- \
        python scripts/run_production_scale.py /path 100000

The child is killed by PID (never by name), gets SIGTERM then SIGKILL
after `--grace-sec`, and the supervisor exits with the child's exit code
once the child finishes on its own.
"""

import argparse
import os
import signal
import subprocess
import sys
import time


def _size(path):
    try:
        return os.stat(path).st_size
    except OSError:
        return -1


def _terminate(proc, grace_sec):
    """SIGTERM the process group, escalate to SIGKILL after grace_sec.
    Group-kill covers grandchildren (`timeout`, shell wrappers)."""
    try:
        os.killpg(proc.pid, signal.SIGTERM)
    except (ProcessLookupError, PermissionError):
        proc.terminate()
    try:
        proc.wait(timeout=grace_sec)
        return
    except subprocess.TimeoutExpired:
        pass
    try:
        os.killpg(proc.pid, signal.SIGKILL)
    except (ProcessLookupError, PermissionError):
        proc.kill()
    proc.wait()


def supervise(cmd, metrics, stall_sec, grace_sec, max_restarts, startup_sec):
    restarts = 0
    while True:
        t0 = time.time()
        proc = subprocess.Popen(cmd, start_new_session=True)
        last_size = _size(metrics)
        last_progress = time.time()
        grew_this_launch = False
        while True:
            rc = proc.poll()
            if rc is not None:
                if rc == 0:
                    print(f"[supervise] child exited 0 after "
                          f"{time.time()-t0:.0f}s", flush=True)
                    return 0
                print(f"[supervise] child exited {rc}", flush=True)
                break  # crashed: restart (counts against the budget)
            time.sleep(10)
            size = _size(metrics)
            if size != last_size:
                last_size = size
                last_progress = time.time()
                grew_this_launch = True
                continue
            # until the FIRST write of this launch, allow the startup
            # budget (device init + restore + compile produce no metrics —
            # on resume the file already exists, so emptiness is no signal)
            budget = stall_sec if grew_this_launch \
                else max(stall_sec, startup_sec)
            if time.time() - last_progress > budget:
                print(f"[supervise] no metrics progress for {budget}s — "
                      f"killing pid {proc.pid}", flush=True)
                _terminate(proc, grace_sec)
                break
        restarts += 1
        if restarts > max_restarts:
            print(f"[supervise] giving up after {max_restarts} restarts",
                  flush=True)
            return 1
        print(f"[supervise] restart {restarts}/{max_restarts}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--metrics", required=True,
                    help="metrics.jsonl whose growth signals progress")
    ap.add_argument("--stall-sec", type=int, default=600)
    ap.add_argument("--grace-sec", type=int, default=30)
    ap.add_argument("--startup-sec", type=int, default=1800,
                    help="stall budget before the FIRST metrics write "
                         "(device init + compile can be slow)")
    ap.add_argument("--max-restarts", type=int, default=5)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- then the training command")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given (use: supervise.py [opts] -- cmd ...)")
    sys.exit(supervise(cmd, args.metrics, args.stall_sec, args.grace_sec,
                       args.max_restarts, args.startup_sec))


if __name__ == "__main__":
    main()
