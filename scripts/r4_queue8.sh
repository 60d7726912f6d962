#!/bin/bash
# Round-4 TPU queue, part 8: runs AFTER queue7 drains (waits on its
# done-file).  Purpose: make sure the HIGH (bf16x3) matmul-precision
# 331 run — the last live accuracy suspect after the trainer
# differential — happens even if queue7's internal deadline skipped it,
# and leave the TPU free well before the round ends (the driver runs
# bench.py on the real chip at round end; a queue still holding the
# device would wedge it).
# Touch /tmp/stop_queue8 to abort.
cd /root/repo

# hard gate: do not START the ~1.5h HIGH run if it could not finish
# comfortably before the round's end-of-session bench.
START_DEADLINE="${QUEUE8_START_DEADLINE:-11:30}"

echo "QUEUE8 waiting for queue7 to finish ($(date +%H:%M:%S))"
until [ -f /tmp/r4_queue7.done ]; do
  [ -f /tmp/stop_queue8 ] && echo "QUEUE8 STOPPED while waiting" && exit 0
  sleep 60
done
echo "QUEUE8 queue7 done ($(date +%H:%M:%S))"

if grep -q DATASET_A_RESULT /tmp/r4_prec2.log 2>/dev/null; then
  echo "QUEUE8: HIGH-precision run already completed in queue7; nothing to do"
  echo done > /tmp/r4_queue8.done
  exit 0
fi

now=$(date +%H:%M)
if [[ "$now" > "$START_DEADLINE" ]]; then
  echo "QUEUE8: past start deadline ($now > $START_DEADLINE); skipping HIGH run"
  echo skipped > /tmp/r4_queue8.done
  exit 0
fi

echo "QUEUE8 STEP: precision retry 331 f32 + HIGH (bf16x3) 100ep ($(date +%H:%M:%S))"
for attempt in 1 2; do
  [ -f /tmp/stop_queue8 ] && echo "QUEUE8 STOPPED" && exit 0
  env SPNET_CKPT=logs/r4_prec_ckpt SPNET_LOGDIR=logs/r4_prec \
    SPNET_MATMUL_PRECISION=high \
    python -u scripts/dataset_a_run.py 100 16 4e-5 40960 float32 331 \
    >> /tmp/r4_prec2.log 2>&1
  grep -q DATASET_A_RESULT /tmp/r4_prec2.log && break
  echo "  attempt $attempt died without result; sleeping 90s before retry"
  sleep 90
done

echo "QUEUE8 DONE ($(date +%H:%M:%S))" | tee /tmp/r4_queue8.done
