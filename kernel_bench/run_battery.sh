#!/bin/bash
# Round-3 on-chip measurement battery. Run when the TPU relay is up:
#   bash kernel_bench/run_battery.sh
# Logs land in /tmp/battery/ AND kernel_bench/battery_logs/.
# compile_smoke gates everything else.
#
# RESUMABLE: a section that finished with rc=0 leaves /tmp/battery/<name>.done
# and is skipped on re-runs (the relay drops mid-battery some days; the
# relay_watch.sh loop re-invokes this script until it completes).  FORCE=1
# re-runs everything.
set -u
mkdir -p /tmp/battery
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  if [ -z "${FORCE:-}" ] && [ -f "/tmp/battery/$name.done" ]; then
    echo "=== $name: already done, skipping ==="
    return 0
  fi
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$t" "$@" > "/tmp/battery/$name.log" 2>&1
  local rc=$?
  cp "/tmp/battery/$name.log" "kernel_bench/battery_logs/$name.log"
  tail -3 "/tmp/battery/$name.log"
  echo "--- $name rc=$rc"
  [ $rc -eq 0 ] && touch "/tmp/battery/$name.done"
  return $rc
}

run compile_smoke 1800 python -u kernel_bench/compile_smoke.py || {
  echo "SMOKE FAILED - stopping battery"; exit 1; }
run r5_measure 9600 python -u kernel_bench/r5_measure.py
run r4_measure 7200 python -u kernel_bench/r4_measure.py
run train_mfu 3600 python -u kernel_bench/bench_train_mfu.py phases int8
run flash_bwd 3600 python -u kernel_bench/bench_flash_bwd.py
run r3_measure 4800 python -u kernel_bench/r3_measure.py
run int8_paged 2400 python -u kernel_bench/r2_measure.py --only int8_prefill,paged_int8
run fused_dropout 1200 python -u kernel_bench/bench_fused_dropout.py
run train_precision 2400 python -u kernel_bench/bench_train_precision.py
run serving 2400 python -u kernel_bench/bench_serving.py
run serving_prefill 2400 python -u kernel_bench/bench_serving.py prefill
run speculative 3600 python -u kernel_bench/bench_speculative.py
run sweep_prod 4800 python -u kernel_bench/speed_test_flash_attention.py \
  --out kernel_bench/results_speed_test_tpu_v5e.csv
run sweep_reference 4800 python -u kernel_bench/speed_test_flash_attention.py \
  --reference --out kernel_bench/results_speed_test_tpu_v5e_reference.csv
run bench_headline 1200 python -u bench.py
# MT curve on the r5 genuine corpus (41,252 pairs): per-epoch
# checkpoints make this section itself resumable across relay drops.
run mt_curve 7200 python -u -m flashattn_tpu.training.translation \
  --dataset-name deen-fixture --n-epochs 12 --resume true \
  --workdir workdir_fixture_r5
echo "BATTERY DONE $(date)"
