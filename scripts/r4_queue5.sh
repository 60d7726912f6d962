#!/bin/bash
# Round-4 TPU queue, part 5: perf experiments that must wait for the
# accuracy queue (r4_queue4.sh) to drain.  Polls for the queue-4 done
# marker, then owns the TPU.  Touch /tmp/stop_queue5 to stop between
# steps.
cd /root/repo

while [ ! -f /tmp/r4_queue4.done ]; do
  [ -f /tmp/stop_queue5 ] && echo "QUEUE5 STOPPED while waiting" && exit 0
  sleep 60
done

step() {
  [ -f /tmp/stop_queue5 ] && echo "QUEUE5 STOPPED before: $1" && exit 0
  echo "QUEUE5 STEP: $1 ($(date +%H:%M:%S))"
}

step "mixed-precision recipe RESUME retry (its 20:24 relaunch died at a relay outage before epoch 64)"
SPNET_CKPT=logs/r4_mixed_ckpt SPNET_LOGDIR=logs/r4_mixed \
  SPNET_BACKBONE_DTYPE=bfloat16 \
  python -u scripts/dataset_a_run.py 100 16 4e-5 40960 float32 331 \
  >> /tmp/r4_mixed.log 2>&1

step "scan-unroll A/B on the production bench"
for u in 1 2 4; do
  [ -f /tmp/stop_queue5 ] && echo "QUEUE5 STOPPED at unroll:$u" && exit 0
  echo "--- unroll=$u ---"
  SPNET_SCAN_UNROLL=$u python -u bench.py 2>&1 | tail -1
done > /tmp/r4_unroll_ab.log 2>&1

echo "QUEUE5 DONE ($(date +%H:%M:%S))" > /tmp/r4_queue5.done
