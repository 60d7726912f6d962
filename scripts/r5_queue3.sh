#!/bin/bash
# Round-5 queue, part 3 — after queue2 drains (or the 19:30 deadline):
#   1. refgen-384 residual breakdown on the refgen val split (names the
#      cause if the single sweep is short of 96.5).
#   2. resume the paused full-suite determinism loop (host-only; the
#      TPU is idle from here).
#   3. archive /tmp result logs into docs/run_logs/ (wipe-proof).
cd /root/repo
DEADLINE_EPOCH=$(date -d 'today 19:30' +%s)
until [ -f /tmp/r5_queue2.done ] || [ "$(date +%s)" -gt "$DEADLINE_EPOCH" ] \
      || ! kill -0 "$(cat /tmp/r5_queue2.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
sleep 30

if [ -d logs/refgen384_ck ]; then
  echo "QUEUE_R5C: refgen breakdown ($(date +%H:%M:%S))"
  timeout 1800 python -u scripts/eval_breakdown.py logs/refgen384_ck refgen \
    > /tmp/r5_refgen_breakdown.log 2>&1
  grep -o 'BREAKDOWN.*' /tmp/r5_refgen_breakdown.log | tail -1 | head -c 600
fi

# resume the paused determinism suite (pid recorded by the suite10 loop)
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
