#!/bin/bash
# Keep re-running the battery (which skips .done sections) whenever the TPU
# relay is reachable, until every section completes or max wait elapses.
# Probe = a tiny dispatch under a short timeout (the first dispatch HANGS
# forever when the relay is down — never probe without a timeout).
#   bash kernel_bench/relay_watch.sh [max_wait_seconds]
set -u
cd /root/repo
MAX=${1:-21600}
START=$(date +%s)
while true; do
  if timeout 90 env PYTHONPATH=/root/repo:/root/.axon_site python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 8)); (x @ x).block_until_ready()" >/dev/null 2>&1; then
    echo "RELAY UP ($(date)) — starting/resuming battery"
    if bash kernel_bench/run_battery.sh; then
      echo "BATTERY COMPLETE ($(date))"
      exit 0
    fi
    echo "battery interrupted ($(date)); will resume"
  else
    echo "relay down ($(date)); retrying in 120s"
  fi
  now=$(date +%s)
  if [ $((now - START)) -gt "$MAX" ]; then
    echo "giving up after ${MAX}s ($(date))"
    exit 1
  fi
  sleep 120
done
