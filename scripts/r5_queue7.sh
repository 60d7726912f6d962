#!/bin/bash
# Round-5 queue, part 7 (session 12 end-game).  Waits for queue6 to
# exit (I touch /tmp/stop_queue_r5f after the native TTA step so
# queue6 skips its movie/keras tail), then runs the remaining ledger
# in VERDICT value order with tight gates:
#   1. dataset-D matched-cadence (VERDICT #4) — with epoch_repeats=42
#      the 645k-image arm is ~380 s of train at the offline arm's
#      1,700 img/s + compile: ~20 min, not the conservative 50.
#   2. movie .bmp predict (VERDICT #6, ~10 min).
#   3. keras .h5 finetune (VERDICT #7, ~15 min).
# Hard deadline 03:55.  Touch /tmp/stop_queue_r5g to stop.
cd /root/repo
DEADLINE_EPOCH=$(date -d 'tomorrow 03:55' +%s)
[ "$(date +%H)" -lt 12 ] && DEADLINE_EPOCH=$(date -d 'today 03:55' +%s)
past_deadline() { [ "$(date +%s)" -gt "$DEADLINE_EPOCH" ]; }
fits() { [ "$(( $(date +%s) + $1 * 60 ))" -lt "$DEADLINE_EPOCH" ]; }

echo "QUEUE_R5G waiting for queue6 to exit ($(date +%H:%M:%S))"
while [ -f /tmp/r5_queue6.pid ] \
    && kill -0 "$(cat /tmp/r5_queue6.pid)" 2>/dev/null; do
  [ -f /tmp/stop_queue_r5g ] && echo "QUEUE_R5G STOPPED" && exit 0
  past_deadline && echo "QUEUE_R5G deadline while queue6 runs" && exit 0
  sleep 30
done
sleep 20

probe_ok() {
  rm -f /tmp/probe_r5g.log
  setsid bash -c 'echo $$ > /tmp/probe_r5g.pid; exec python -u -c "
import jax, jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum())
print(\"TPU PROBE OK\", float(f(jnp.ones((256, 256)))), flush=True)
" > /tmp/probe_r5g.log 2>&1' &
  for i in $(seq 1 48); do
    sleep 5
    grep -q "TPU PROBE OK" /tmp/probe_r5g.log 2>/dev/null && return 0
  done
  kill "$(cat /tmp/probe_r5g.pid)" 2>/dev/null
  sleep 90
  return 1
}
wait_for_relay() {
  until probe_ok; do
    [ -f /tmp/stop_queue_r5g ] && echo "QUEUE_R5G STOPPED" && exit 0
    past_deadline && echo "QUEUE_R5G deadline while device busy" && exit 0
    echo "  device still busy/down ($(date +%H:%M:%S))"
    sleep 60
  done
}
wait_for_relay

archive() {
  mkdir -p docs/run_logs
  for f in r5_datasetd r5_movie r5_kerash5 r5_nativefull2 r5_tta_native; do
    [ -f /tmp/$f.log ] && grep -v "^WARNING" /tmp/$f.log | tail -800 \
      > docs/run_logs/${f}.log
  done
}

step() {
  [ -f /tmp/stop_queue_r5g ] && echo "QUEUE_R5G STOPPED before: $1" && exit 0
  fits "$2" || { echo "QUEUE_R5G: no margin for: $1"; return 1; }
  wait_for_relay
  echo "QUEUE_R5G STEP: $1 ($(date +%H:%M:%S))"
  return 0
}

# ---- 1. dataset-D matched cadence (pregather=0, 3x1120 split) ----
if ! grep -q DATASET_D_RESULT /tmp/r5_datasetd.log 2>/dev/null \
    && step "dataset-D onthefly rep42" 20; then
  env SPNET_PREGATHER=0 SPNET_MAX_SCAN_STEPS=1120 \
    python -u scripts/dataset_d_run.py --arm onthefly --rep 42 \
    >> /tmp/r5_datasetd.log 2>&1
  grep -o 'DATASET_D_RESULT.*' /tmp/r5_datasetd.log | tail -1 | head -c 600
fi
archive

# ---- 2. movie .bmp predict ----
if ! grep -q MOVIE_RESULT /tmp/r5_movie.log 2>/dev/null \
    && step "movie .bmp predict e2e" 10; then
  python -u scripts/movie_predict.py >> /tmp/r5_movie.log 2>&1
  grep -o 'MOVIE_RESULT.*' /tmp/r5_movie.log | tail -1 | head -c 400
fi
archive

# ---- 3. keras .h5 finetune ----
if ! grep -q KERAS_H5_RESULT /tmp/r5_kerash5.log 2>/dev/null \
    && step "keras .h5 import + finetune" 14; then
  python -u scripts/keras_h5_finetune.py >> /tmp/r5_kerash5.log 2>&1
  grep -o 'KERAS_H5_RESULT.*' /tmp/r5_kerash5.log | tail -1 | head -c 400
fi
archive

echo "QUEUE_R5G DONE ($(date +%H:%M:%S))" | tee /tmp/r5_queue7.done
