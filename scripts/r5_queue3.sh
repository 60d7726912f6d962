#!/bin/bash
# Round-5 queue, part 3 — after queue2 drains (or 19:30):
#   1. dataset-D matched-cadence retry with pregather DISABLED
#      (the r4 offline arm ran 3,440-step pregather=False programs
#      fine; the two round-5 crashes both had in-program pregather
#      copies >= 2 GB, so that's the live suspect).
#   2. refgen-384 residual breakdown on the refgen val split.
#   3. resume the paused full-suite determinism loop (TPU idle).
#   4. archive /tmp result logs into docs/run_logs/ (wipe-proof).
cd /root/repo
DEADLINE_EPOCH=$(date -d 'today 19:30' +%s)
fits() { [ "$(( $(date +%s) + $1 * 60 ))" -lt "$DEADLINE_EPOCH" ]; }
until [ -f /tmp/r5_queue2.done ] || [ "$(date +%s)" -gt "$DEADLINE_EPOCH" ] \
      || ! kill -0 "$(cat /tmp/r5_queue2.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
sleep 30

if ! grep -q DATASET_D_RESULT /tmp/r5_datasetd.log 2>/dev/null && fits 50; then
  echo "QUEUE_R5C: dataset-D retry, pregather=0 ($(date +%H:%M:%S))"
  SPNET_PREGATHER=0 SPNET_MAX_SCAN_STEPS=1120 \
    python -u scripts/dataset_d_run.py --arm onthefly --rep 42 \
    >> /tmp/r5_datasetd.log 2>&1
  grep -o 'DATASET_D_RESULT.*' /tmp/r5_datasetd.log | tail -1 | head -c 600
fi

if [ -d logs/refgen384_ck ] && fits 20; then
  echo "QUEUE_R5C: refgen breakdown ($(date +%H:%M:%S))"
  timeout 1800 python -u scripts/eval_breakdown.py logs/refgen384_ck refgen \
    > /tmp/r5_refgen_breakdown.log 2>&1
  grep -o 'BREAKDOWN.*' /tmp/r5_refgen_breakdown.log | tail -1 | head -c 600
fi

if [ -f /tmp/r5_suite_pid ]; then
  kill -CONT "$(cat /tmp/r5_suite_pid)" 2>/dev/null && \
    echo "QUEUE_R5C: suite loop resumed"
fi

mkdir -p docs/run_logs
for f in r5_refgen384 r5_refgen384_tta r5_datasetd r5_kerash5 r5_movie \
         r5_nativefull r5_tta_native r5_mfu r5_bigprog r5_bench \
         r5_refgen_breakdown; do
  [ -f /tmp/$f.log ] && grep -v "^WARNING" /tmp/$f.log | tail -800 \
    > docs/run_logs/${f}.log
done
echo "QUEUE_R5C DONE ($(date +%H:%M:%S))" | tee /tmp/r5_queue3.done
