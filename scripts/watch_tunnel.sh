#!/bin/bash
# Poll the axon TPU tunnel; when it answers, run bench.py once and save the
# JSON line. Used after a tunnel outage to re-confirm the headline number
# without babysitting (see STATUS.md round-3 "bench watchdog").
#   bash scripts/watch_tunnel.sh [out.json] [poll_seconds]
OUT="${1:-/tmp/bench_recheck.json}"
POLL="${2:-300}"
cd "$(dirname "$0")/.."
while true; do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
assert float(jnp.sum(x @ x)) == 256.0 ** 3
" >/dev/null 2>&1; then
    echo "$(date -Is) tunnel up — running bench" >&2
    # bench exits non-zero (and prints a canned error line) when the
    # tunnel flaps between the probe and the run; only a rc=0 result
    # counts as a fresh measurement — otherwise keep polling
    if timeout 1500 python bench.py > "$OUT.full" 2>&1; then
      tail -1 "$OUT.full" > "$OUT"
      echo "$(date -Is) bench done -> $OUT" >&2
      exit 0
    fi
    echo "$(date -Is) bench failed (rc!=0, tunnel flap?) — keep polling" >&2
  fi
  echo "$(date -Is) tunnel down, retry in ${POLL}s" >&2
  sleep "$POLL"
done
