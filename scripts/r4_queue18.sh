#!/bin/bash
# Round-4 TPU queue, part 18 (session 7) — runs after queue17 drains.
# One step: the dataset-D arms at MATCHED val cadence (epoch_repeats=42
# folds the on-the-fly arm's 504 per-pass val sweeps into 12 — the same
# protocol the offline arm gets).  The first rerun (queue16,
# /tmp/r4_datasetd2.log) proved accuracy: on-the-fly 87.88 % ring-acc vs
# offline 86.67 % at equal images-seen; this run removes the val-sweep
# wall-clock handicap.
cd /root/repo
HARD_DEADLINE_EPOCH=$(date -d 'tomorrow 06:45' +%s)
[ "$(date +%H)" -lt 14 ] && HARD_DEADLINE_EPOCH=$(date -d 'today 06:45' +%s)

past_hard_deadline() { [ "$(date +%s)" -gt "$HARD_DEADLINE_EPOCH" ]; }

probe_ok() {
  rm -f /tmp/probe18.log
  setsid bash -c 'echo $$ > /tmp/probe18.pid; exec python -u -c "
import jax, jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum())
print(\"TPU PROBE OK\", float(f(jnp.ones((256, 256)))), flush=True)
" > /tmp/probe18.log 2>&1' &
  for i in $(seq 1 60); do
    sleep 5
    grep -q "TPU PROBE OK" /tmp/probe18.log 2>/dev/null && return 0
  done
  kill "$(cat /tmp/probe18.pid)" 2>/dev/null
  sleep 90
  return 1
}

wait_for_relay() {
  until probe_ok; do
    [ -f /tmp/stop_queue18 ] && echo "QUEUE18 STOPPED while waiting" && exit 0
    past_hard_deadline && echo "QUEUE18 deadline while relay down" && exit 0
    echo "  relay still down ($(date +%H:%M:%S))"
    sleep 120
  done
}

echo "QUEUE18 waiting for queue17 to finish ($(date +%H:%M:%S))"
until [ -f /tmp/r4_queue17.done ]; do
  [ -f /tmp/stop_queue18 ] && echo "QUEUE18 STOPPED while waiting" && exit 0
  past_hard_deadline && echo "QUEUE18 deadline passed while waiting" && exit 0
  if [ -f /tmp/queue17.pid ] && ! kill -0 "$(cat /tmp/queue17.pid)" 2>/dev/null; then
    echo "QUEUE18: queue17 process gone without done marker; proceeding"
    break
  fi
  sleep 120
done
wait_for_relay

echo "QUEUE18 STEP: dataset-D arms at matched val cadence ($(date +%H:%M:%S))"
for attempt in 1 2 3; do
  python -u scripts/dataset_d_run.py 1280 12 >> /tmp/r4_datasetd3.log 2>&1
  grep -q DATASET_D_RESULT /tmp/r4_datasetd3.log && break
  echo "  attempt $attempt died ($(date +%H:%M:%S)); re-probing relay"
  sleep 90
  wait_for_relay
done
grep -o 'DATASET_D_RESULT.*' /tmp/r4_datasetd3.log | tail -1 | head -c 600

echo "QUEUE18 DONE ($(date +%H:%M:%S))" | tee /tmp/r4_queue18.done
