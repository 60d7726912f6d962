#!/bin/bash
# Round-5 queue, part 5 (session 11): post-queue4 confirm + pickups.
# Waits for queue4 (pid file) to exit, then picks up the steps queue4
# deadline-skipped, value order: movie .bmp predict (VERDICT #6,
# ~15 min), keras real-.h5 finetune (VERDICT #7, ~20 min), dataset-D
# matched-cadence (VERDICT #4, ~50 min) — each only if its marker is
# absent — then, margin permitting, the 2-variant confirm sweep (the
# driver's own end-of-round bench re-validates the new default anyway,
# so the sweep's unique value is only the u3 stack).
# Hard deadline-gated at 03:30 so the chip is free for the driver's
# end-of-round bench.  Touch /tmp/stop_queue_r5e to stop between steps.
cd /root/repo
DEADLINE_EPOCH=$(date -d 'tomorrow 03:30' +%s)
[ "$(date +%H)" -lt 12 ] && DEADLINE_EPOCH=$(date -d 'today 03:30' +%s)
past_deadline() { [ "$(date +%s)" -gt "$DEADLINE_EPOCH" ]; }
fits() { [ "$(( $(date +%s) + $1 * 60 ))" -lt "$DEADLINE_EPOCH" ]; }

echo "QUEUE_R5E waiting for queue4 to exit ($(date +%H:%M:%S))"
while [ -f /tmp/r5_queue4.pid ] \
    && kill -0 "$(cat /tmp/r5_queue4.pid)" 2>/dev/null; do
  [ -f /tmp/stop_queue_r5e ] && echo "QUEUE_R5E STOPPED" && exit 0
  past_deadline && echo "QUEUE_R5E deadline while queue4 runs" && exit 0
  sleep 60
done
sleep 30

# an orphaned queue4 training child could still hold the device; the
# probe hangs on the claim in that case, so loop it with a bound
probe_ok() {
  rm -f /tmp/probe_r5e.log
  setsid bash -c 'echo $$ > /tmp/probe_r5e.pid; exec python -u -c "
import jax, jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum())
print(\"TPU PROBE OK\", float(f(jnp.ones((256, 256)))), flush=True)
" > /tmp/probe_r5e.log 2>&1' &
  for i in $(seq 1 60); do
    sleep 5
    grep -q "TPU PROBE OK" /tmp/probe_r5e.log 2>/dev/null && return 0
  done
  kill "$(cat /tmp/probe_r5e.pid)" 2>/dev/null
  sleep 90
  return 1
}
wait_for_relay() {
  until probe_ok; do
    [ -f /tmp/stop_queue_r5e ] && echo "QUEUE_R5E STOPPED" && exit 0
    past_deadline && echo "QUEUE_R5E deadline while device busy" && exit 0
    echo "  device still busy/down ($(date +%H:%M:%S))"
    sleep 120
  done
}
wait_for_relay

archive() {
  mkdir -p docs/run_logs
  for f in r5_bench_confirm r5_movie r5_kerash5 r5_datasetd; do
    [ -f /tmp/$f.log ] && grep -v "^WARNING" /tmp/$f.log | tail -400 \
      > docs/run_logs/${f}.log
  done
}

step() {
  [ -f /tmp/stop_queue_r5e ] && echo "QUEUE_R5E STOPPED before: $1" && exit 0
  fits "$2" || { echo "QUEUE_R5E: no margin for: $1"; return 1; }
  wait_for_relay
  echo "QUEUE_R5E STEP: $1 ($(date +%H:%M:%S))"
  return 0
}

# ---- 1. movie pickup (only if queue4 skipped it) ----
if ! grep -q MOVIE_RESULT /tmp/r5_movie.log 2>/dev/null \
    && step "movie .bmp predict pickup" 20; then
  python -u scripts/movie_predict.py >> /tmp/r5_movie.log 2>&1
  grep -o 'MOVIE_RESULT.*' /tmp/r5_movie.log | tail -1 | head -c 400
fi
archive

# ---- 2. keras-h5 pickup ----
if ! grep -q KERAS_H5_RESULT /tmp/r5_kerash5.log 2>/dev/null \
    && step "keras .h5 finetune pickup" 30; then
  python -u scripts/keras_h5_finetune.py >> /tmp/r5_kerash5.log 2>&1
  grep -o 'KERAS_H5_RESULT.*' /tmp/r5_kerash5.log | tail -1 | head -c 400
fi
archive

# ---- 3. dataset-D pickup ----
if ! grep -q DATASET_D_RESULT /tmp/r5_datasetd.log 2>/dev/null \
    && step "dataset-D matched-cadence pickup" 55; then
  env SPNET_PREGATHER=0 SPNET_MAX_SCAN_STEPS=1120 \
    python -u scripts/dataset_d_run.py --arm onthefly --rep 42 \
    >> /tmp/r5_datasetd.log 2>&1
  grep -o 'DATASET_D_RESULT.*' /tmp/r5_datasetd.log | tail -1 | head -c 600
fi
archive

# ---- 4. confirm sweep (~20 min, lowest priority) ----
if step "confirm sweep" 25; then
  python -u scripts/r5_confirm_sweep.py > /tmp/r5_bench_confirm.log 2>&1
  grep -E "CONFIRM_VARIANT|CONFIRM_SWEEP_RESULT" /tmp/r5_bench_confirm.log
fi
archive

echo "QUEUE_R5E DONE ($(date +%H:%M:%S))" | tee /tmp/r5_queue5.done
