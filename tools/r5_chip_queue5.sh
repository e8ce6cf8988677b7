#!/bin/bash
# Round-5 chip queue #5 (final): refresh the train rows with the flash-
# attention train default (PERF train_attention_ab: 0.516 -> 0.423 s/step)
# and re-capture BENCH_LOCAL_r05.json with the nsub2 default headline.
# One section per process (axon HBM reclamation lag, CLAUDE.md).
set -u
cd /root/repo

log() { echo "[r5q5 $(date +%H:%M:%S)] $*"; }

for sec in sft_train_step sft_train_step_int8_adam sft_train_step_moe; do
  if [ ! -f /tmp/r5q5_done_$sec ]; then
    log "bench_sweep --only $sec"
    timeout 3600 python bench_sweep.py --only $sec \
      > /tmp/r5q5_$sec.log 2>&1 && touch /tmp/r5q5_done_$sec
    log "$sec rc=$?"
    sleep 150
  fi
done

if [ ! -f /tmp/r5q5_done_bench ]; then
  log "bench.py --full -> BENCH_LOCAL_r05.json (nsub2 headline)"
  CTDB_BENCH_BUDGET_S=1500 timeout 3600 python bench.py --full \
    --out BENCH_LOCAL_r05.json > /tmp/r5q5_bench.log 2>&1 \
    && touch /tmp/r5q5_done_bench
  log "bench rc=$?"
fi
log "queue #5 complete"
