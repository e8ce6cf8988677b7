#!/bin/bash
# Round-5 chip work queue: runs the pending measurements in sequence the
# moment the axon TPU backend is reachable.  Survives builder session
# restarts (run under setsid/nohup; logs to /tmp/r5q_*.log).
# Ordered by value-per-minute (VERDICT r4 item 2): compile gate (validates
# every Pallas path incl. the nsub pair kernels), nsub A/B (item 4),
# train-step decomposition (item 5), moe_max ladder (item 2/7),
# bench --full -> BENCH_LOCAL_r05.json (item 2).
set -u
cd /root/repo

log() { echo "[r5q $(date +%H:%M:%S)] $*"; }

wait_for_tpu() {
  until timeout 590 python -c "import jax; assert jax.default_backend() == 'tpu'" 2>/dev/null; do
    log "backend still unavailable; retrying in 60s"
    sleep 60
  done
}

log "waiting for TPU backend"
wait_for_tpu
log "TPU back"

if [ ! -f /tmp/r5q_done_gate ]; then
  log "0/5 tpu_compile_check (all Pallas paths incl. nsub)"
  timeout 2400 python tools/tpu_compile_check.py > /tmp/r5q_gate.log 2>&1 \
    && touch /tmp/r5q_done_gate
  log "gate rc=$?"
  sleep 60
fi

if [ ! -f /tmp/r5q_done_nsub ]; then
  log "1/5 nsub kernel sweep (batch 8)"
  timeout 3600 python tools/xprof_sweep_r3.py --batches 8 \
    --variants man_both_kloop,man_nsub2,man_nsub4,man_nsub8 \
    > /tmp/r5q_nsub.log 2>&1 && touch /tmp/r5q_done_nsub
  log "nsub rc=$?"
  sleep 150
fi

if [ ! -f /tmp/r5q_done_xtrain ]; then
  log "2/5 xprof_train decomposition (dense 6L remat sweep, moe 2L)"
  timeout 3600 python tools/xprof_train.py --layers 6 \
    --variants full,dots,none > /tmp/r5q_xtrain_dense.log 2>&1
  log "dense rc=$?"
  sleep 150
  timeout 2400 python tools/xprof_train.py --layers 2 --model llada-moe-7b \
    --opt-dtype int8 --variants full > /tmp/r5q_xtrain_moe.log 2>&1 \
    && touch /tmp/r5q_done_xtrain
  log "moe rc=$?"
  sleep 150
fi

if [ ! -f /tmp/r5q_done_moemax ]; then
  log "3/5 sft_train_step_moe_max ladder"
  timeout 5400 python bench_sweep.py --only sft_train_step_moe_max \
    > /tmp/r5q_moemax.log 2>&1 && touch /tmp/r5q_done_moemax
  log "moe_max rc=$?"
  sleep 150
fi

if [ ! -f /tmp/r5q_done_bench ]; then
  log "4/5 bench.py --full -> BENCH_LOCAL_r05.json"
  CTDB_BENCH_BUDGET_S=1500 timeout 5400 python bench.py --full \
    --out BENCH_LOCAL_r05.json > /tmp/r5q_bench.log 2>&1 \
    && touch /tmp/r5q_done_bench
  log "bench rc=$?"
fi
log "queue complete"
