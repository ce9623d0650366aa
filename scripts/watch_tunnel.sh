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
    timeout 1500 python bench.py | tail -1 > "$OUT"
    echo "$(date -Is) bench done -> $OUT" >&2
    exit 0
  fi
  echo "$(date -Is) tunnel down, retry in ${POLL}s" >&2
  sleep "$POLL"
done
