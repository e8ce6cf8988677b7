#!/bin/bash
# Round-5 chip queue #3: in-context A/Bs chosen from queue #2's results.
# Waits for queue #2, then:
#   1. headline bench with CTDB_GROUPED_NSUB=2 (standalone nsub A/B showed
#      nsub2 ~5.7% faster per layer; does it move the END-TO-END headline?)
#   2. refreshed sft_train_step rows (rowwise int8 Adam + sliced chunked CE
#      + best ce_chunk from the queue-2 sweep) via bench_sweep.
set -u
cd /root/repo

log() { echo "[r5q3 $(date +%H:%M:%S)] $*"; }

log "waiting for queue #2"
while [ ! -f /tmp/r5q2_done_calib ]; do
  sleep 60
done
log "queue #2 done"

if [ ! -f /tmp/r5q3_done_nsub_headline ]; then
  log "1/2 headline A/B: default vs CTDB_GROUPED_NSUB=2"
  { echo "=== default nsub"
    CTDB_BENCH_BUDGET_S=900 timeout 1800 python bench.py
    echo "=== nsub2"
    CTDB_GROUPED_NSUB=2 CTDB_BENCH_BUDGET_S=900 timeout 1800 python bench.py
  } > /tmp/r5q3_nsub_headline.log 2>&1 && touch /tmp/r5q3_done_nsub_headline
  log "nsub headline rc=$?"
  sleep 60
fi

if [ ! -f /tmp/r5q3_done_sft ]; then
  # One section per process: HBM freed by a previous section in the same
  # process is not reliably reusable on the axon pool (bench_sweep --only
  # help text / CLAUDE.md reclamation lag).
  log "2/2 refreshed sft_train_step rows (rowwise Adam, sliced chunked CE)"
  { timeout 3600 python bench_sweep.py --only sft_train_step_int8_adam
    sleep 150
    timeout 3600 python bench_sweep.py --only sft_train_step_moe
  } > /tmp/r5q3_sft.log 2>&1 && touch /tmp/r5q3_done_sft
  log "sft rc=$?"
fi
log "queue #3 complete"
