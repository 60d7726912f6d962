#!/bin/bash
# Round-4 TPU queue, part 13: post-queue12 remainder.  Waits for
# queue12's done marker (never runs concurrently — ONE TPU process),
# then fills the cheap gaps:
#   1. Xception 25-ep short-recipe sweep row — the §2f table currently
#      quotes a mid-anneal point of a 100-ep schedule for Xception;
#      this makes the backbone comparison apples-to-apples (reuses the
#      sweep dataset cache, so ~15 min).
#   2. TTA eval retry if queue12's TTA step never printed a result
#      (e.g. the long run missed its deadline but a checkpoint exists).
# Gates: nothing new after ${QUEUE13_HARD_DEADLINE:-22:10}.  Touch
# /tmp/stop_queue13 to stop between steps.
cd /root/repo
HARD_DEADLINE="${QUEUE13_HARD_DEADLINE:-22:10}"

echo "QUEUE13 waiting for queue12 to finish ($(date +%H:%M:%S))"
until [ -f /tmp/r4_queue12.done ]; do
  [ -f /tmp/stop_queue13 ] && echo "QUEUE13 STOPPED while waiting" && exit 0
  # bail out if queue12's process is gone without a done marker (crash/
  # wipe) AND nothing holds the device — then we may proceed
  if [ -f /tmp/queue12.pid ] && ! kill -0 "$(cat /tmp/queue12.pid)" 2>/dev/null; then
    echo "QUEUE13: queue12 process gone without done marker; proceeding"
    break
  fi
  sleep 120
done

past_hard_deadline() {
  [[ "$(date +%H:%M)" > "$HARD_DEADLINE" ]]
}

step() {
  [ -f /tmp/stop_queue13 ] && echo "QUEUE13 STOPPED before: $1" && exit 0
  past_hard_deadline && echo "QUEUE13 hard deadline passed; skipping: $1" \
    && return 1
  echo "QUEUE13 STEP: $1 ($(date +%H:%M:%S))"
}

# ---- 1. Xception 25-ep short-recipe row ----
if step "backbone sweep: Xception 25ep"; then
  env SPNET_LOGDIR=logs/r4_sweep_Xception \
    python -u scripts/dataset_a_run.py 25 32 1e-4 40960 bfloat16 331 \
    > /tmp/r4_sweep_Xception.log 2>&1
  grep -q DATASET_A_RESULT /tmp/r4_sweep_Xception.log \
    || echo "QUEUE13: Xception sweep died without result"
fi

# ---- 2. TTA retry if queue12 never got one ----
if ! grep -q EVAL_TTA_RESULT /tmp/r4_tta_long.log 2>/dev/null; then
  if [ -d logs/r4_long_ckpt ] && step "TTA retry on long-run checkpoint"; then
    python -u scripts/eval_tta.py logs/r4_long_ckpt synth \
      >> /tmp/r4_tta_long.log 2>&1
  fi
fi

echo "QUEUE13 DONE ($(date +%H:%M:%S))" | tee /tmp/r4_queue13.done
