#!/bin/bash
# Round-5 chip queue #2: follow-up measurements that depend on queue #1's
# results and this round's code (direct flash kernel, rowwise int8 Adam,
# ce_chunk sweep).  Waits for queue #1 to finish, then runs in
# value-per-minute order.  Restart-safe via /tmp/r5q2_done_* stamps.
set -u
cd /root/repo

log() { echo "[r5q2 $(date +%H:%M:%S)] $*"; }

log "waiting for queue #1 (bench --full) to finish"
while [ ! -f /tmp/r5q_done_bench ]; do
  sleep 60
done
log "queue #1 done"

# 1. Compile gate for the new direct flash kernel (CLAUDE.md: every new
#    Pallas path must compile on the real chip before CPU green means
#    anything).
if [ ! -f /tmp/r5q2_done_gate ]; then
  log "1/5 flash_direct compile gate"
  timeout 1800 python tools/tpu_compile_check.py --only flash_direct \
    > /tmp/r5q2_gate.log 2>&1 && touch /tmp/r5q2_done_gate
  log "gate rc=$?"
  sleep 30
fi

# 2. Direct-kernel A/B at the single-prompt serving shapes (VERDICT r4
#    item 6: crossover >=1.0 at B=1 S<=512 or a committed negative).
if [ ! -f /tmp/r5q2_done_direct ] && [ -f /tmp/r5q2_done_gate ]; then
  log "2/5 flash --direct A/B (B=1 and B=8)"
  { timeout 1800 python tools/flash_group_ab.py --seqs 320,512,1024 \
      --groups 16 --direct --batch 1
    timeout 1800 python tools/flash_group_ab.py --seqs 320,512 \
      --groups 16 --direct --batch 8
  } > /tmp/r5q2_direct.log 2>&1 && touch /tmp/r5q2_done_direct
  log "direct rc=$?"
  sleep 30
fi

# 3. ce_chunk sweep on the dense 6L decomposition config (round-5 finding:
#    the chunk-loop backward accumulates a full [D,V] head cotangent per
#    chunk; traffic ~ seq/chunk).  int8 opt => bf16 accum, the production
#    memory config.
if [ ! -f /tmp/r5q2_done_cechunk ]; then
  log "3/5 ce_chunk sweep (dense 6L, int8 Adam)"
  timeout 3600 python tools/xprof_train.py --layers 6 --variants full \
    --opt-dtype int8 --ce-chunks 256,512,1024,2048 \
    > /tmp/r5q2_cechunk.log 2>&1 && touch /tmp/r5q2_done_cechunk
  log "ce_chunk rc=$?"
  sleep 150
fi

# 4. Rowwise int8-Adam epilogue A/B: rerun the MoE 2L decomposition with
#    the layout-native optimizer (this morning's run measured the flat
#    layout at 142 ms epilogue).
if [ ! -f /tmp/r5q2_done_rowwise ]; then
  log "4/5 MoE 2L decomposition with rowwise int8 Adam"
  timeout 2400 python tools/xprof_train.py --layers 2 --model llada-moe-7b \
    --opt-dtype int8 --variants full > /tmp/r5q2_rowwise.log 2>&1 \
    && touch /tmp/r5q2_done_rowwise
  log "rowwise rc=$?"
  sleep 150
fi

# 5. MoE layer-time calibration: the r5 nsub sweep measured man_both_kloop
#    at 4.758 ms/layer where round 3 committed 2.35 for the same pinned
#    variant — rerun the r3 ladder (auto pipeline + manual) twice to tell
#    an environment shift from a code regression.
if [ ! -f /tmp/r5q2_done_calib ]; then
  log "5/5 nsub calibration (r3 variants, 2 reps)"
  { timeout 2400 python tools/xprof_sweep_r3.py --batches 8 \
      --variants tm64,r2auto,man_both_kloop,man_nsub2
    sleep 60
    timeout 2400 python tools/xprof_sweep_r3.py --batches 8 \
      --variants man_both_kloop,man_nsub2
  } > /tmp/r5q2_calib.log 2>&1 && touch /tmp/r5q2_done_calib
  log "calib rc=$?"
fi
log "queue #2 complete"
