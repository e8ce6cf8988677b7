#!/bin/bash
# Round-5 chip queue #4: final decomposition rows with the fori-loop
# rowwise int8 Adam + ce_chunk 512 defaults (committed 743ab09), for the
# STATUS epilogue A/B table: flat (142 ms) -> map-rowwise -> fori-rowwise.
set -u
cd /root/repo

log() { echo "[r5q4 $(date +%H:%M:%S)] $*"; }

log "waiting for queue #3"
while [ ! -f /tmp/r5q3_done_sft ]; do
  sleep 60
done
log "queue #3 done"

if [ ! -f /tmp/r5q4_done_moe ]; then
  log "1/2 MoE 2L decomposition (fori-rowwise int8 Adam, ce512)"
  timeout 2400 python tools/xprof_train.py --layers 2 --model llada-moe-7b \
    --opt-dtype int8 --variants full --ce-chunks 512 \
    > /tmp/r5q4_moe.log 2>&1 && touch /tmp/r5q4_done_moe
  log "moe rc=$?"
  sleep 150
fi

if [ ! -f /tmp/r5q4_done_dense ]; then
  log "2/3 dense 6L decomposition (fori-rowwise int8 Adam, ce512, full+dots)"
  timeout 3600 python tools/xprof_train.py --layers 6 --variants full,dots \
    --opt-dtype int8 --ce-chunks 512 > /tmp/r5q4_dense.log 2>&1 \
    && touch /tmp/r5q4_done_dense
  log "dense rc=$?"
  sleep 150
fi

# Flash vs reference attention in the TRAIN step: the reference default
# dates from before the round-4 head-grouped/fused-rope kernel; the ce512
# trace shows ~86 ms/step of materialized [H,S,S] f32 score fusions.
if [ ! -f /tmp/r5q4_done_attn ]; then
  log "3/3 train attention A/B (--attn pallas, full+dots)"
  timeout 3600 python tools/xprof_train.py --layers 6 --variants full,dots \
    --opt-dtype int8 --ce-chunks 512 --attn pallas \
    > /tmp/r5q4_attn.log 2>&1 && touch /tmp/r5q4_done_attn
  log "attn rc=$?"
fi
log "queue #4 complete"
