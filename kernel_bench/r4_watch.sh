#!/bin/bash
# Relay watcher for the round-4 measurement sections.  Probes the relay
# under a timeout (a first dispatch during an outage hangs forever), then
# runs each r4_measure section under its own timeout, leaving .done markers
# so an interrupted campaign resumes where it stopped.
#   bash kernel_bench/r4_watch.sh [max_wait_seconds]
set -u
cd /root/repo
MAX=${1:-21600}
START=$(date +%s)
LOGS=kernel_bench/battery_logs
mkdir -p "$LOGS"
SECTIONS="gate bwd grad fwd4k fwd2k"
while true; do
  if timeout 90 env PYTHONPATH=/root/repo:/root/.axon_site python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 8)); (x @ x).block_until_ready()" >/dev/null 2>&1; then
    echo "RELAY UP ($(date)) — running r4 sections"
    all_ok=1
    for s in $SECTIONS; do
      [ -f "$LOGS/r4_$s.done" ] && continue
      echo "-- section $s ($(date))"
      if timeout 2700 env PYTHONPATH=/root/repo:/root/.axon_site \
          python -u kernel_bench/r4_measure.py "$s" \
          > "$LOGS/r4_$s.log" 2>&1; then
        touch "$LOGS/r4_$s.done"
      else
        echo "section $s failed/timed out ($(date))"
        all_ok=0
        break
      fi
    done
    if [ "$all_ok" = 1 ]; then
      echo "R4 MEASURE COMPLETE ($(date))"
      exit 0
    fi
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
