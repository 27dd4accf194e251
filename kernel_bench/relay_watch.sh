#!/bin/bash
# Wait for the TPU relay to come back, then run the full battery once.
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
    echo "RELAY UP ($(date)) — starting battery"
    exec bash kernel_bench/run_battery.sh
  fi
  now=$(date +%s)
  if [ $((now - START)) -gt "$MAX" ]; then
    echo "RELAY STILL DOWN after ${MAX}s — giving up ($(date))"
    exit 1
  fi
  echo "relay down ($(date)); retrying in 120s"
  sleep 120
done
