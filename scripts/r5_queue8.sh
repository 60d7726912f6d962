#!/bin/bash
# Round-5 queue, part 8 (session 13 end-game).  Session 13 started
# ~01:56 with a ~3 h window (ends ~04:56), so queue6/queue7's 03:50 /
# 03:55 gates (sized for session 12's window) leave real TPU time on
# the table.  This queue waits for queue6 to exit, then runs whatever
# is still missing with gates extended to 04:25 (>=30 min margin for
# the driver's bench):
#   0. native-res resume (only if queue6's run died without its
#      DATASET_A_RESULT; resumes from logs/r5_native_ck, save_every=10)
#   1. flip-TTA on the native ckpt (queue6's own 03:50 gate will cut
#      this if the 90-ep run ends after ~03:34)
#   2. dataset-D matched-cadence rep42 (VERDICT #4)
#   3. movie .bmp predict (VERDICT #6)
#   4. keras .h5 finetune (VERDICT #7)
# queue7 is stopped (touch /tmp/stop_queue_r5g) before this launches.
# Touch /tmp/stop_queue_r5h to stop between steps.
cd /root/repo
DEADLINE_EPOCH=$(date -d 'tomorrow 04:25' +%s)
[ "$(date +%H)" -lt 12 ] && DEADLINE_EPOCH=$(date -d 'today 04:25' +%s)
past_deadline() { [ "$(date +%s)" -gt "$DEADLINE_EPOCH" ]; }
fits() { [ "$(( $(date +%s) + $1 * 60 ))" -lt "$DEADLINE_EPOCH" ]; }

echo "QUEUE_R5H waiting for queue6 to exit ($(date +%H:%M:%S))"
while [ -f /tmp/r5_queue6.pid ] \
    && kill -0 "$(cat /tmp/r5_queue6.pid)" 2>/dev/null; do
  [ -f /tmp/stop_queue_r5h ] && echo "QUEUE_R5H STOPPED" && exit 0
  past_deadline && echo "QUEUE_R5H deadline while queue6 runs" && exit 0
  sleep 30
done
sleep 20

probe_ok() {
  rm -f /tmp/probe_r5h.log
  setsid bash -c 'echo $$ > /tmp/probe_r5h.pid; exec python -u -c "
import jax, jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum())
print(\"TPU PROBE OK\", float(f(jnp.ones((256, 256)))), flush=True)
" > /tmp/probe_r5h.log 2>&1' &
  for i in $(seq 1 48); do
    sleep 5
    grep -q "TPU PROBE OK" /tmp/probe_r5h.log 2>/dev/null && return 0
  done
  kill "$(cat /tmp/probe_r5h.pid)" 2>/dev/null
  sleep 90
  return 1
}
wait_for_relay() {
  until probe_ok; do
    [ -f /tmp/stop_queue_r5h ] && echo "QUEUE_R5H STOPPED" && exit 0
    past_deadline && echo "QUEUE_R5H deadline while device busy" && exit 0
    echo "  device still busy/down ($(date +%H:%M:%S))"
    sleep 60
  done
}
wait_for_relay

archive() {
  mkdir -p docs/run_logs
  for f in r5_nativefull2 r5_tta_native r5_breakdown_native r5_datasetd r5_movie r5_kerash5; do
    [ -f /tmp/$f.log ] && grep -v "^WARNING" /tmp/$f.log | tail -800 \
      > docs/run_logs/${f}.log
  done
}

step() {
  [ -f /tmp/stop_queue_r5h ] && echo "QUEUE_R5H STOPPED before: $1" && exit 0
  fits "$2" || { echo "QUEUE_R5H: no margin for: $1"; return 1; }
  wait_for_relay
  echo "QUEUE_R5H STEP: $1 ($(date +%H:%M:%S))"
  return 0
}

# ---- 0. native-res resume (only if queue6 left it unfinished) ----
NATIVE_CMD=(env SPNET_BACKBONE_DTYPE=bfloat16 SPNET_MAX_SCAN_STEPS=512
  SPNET_CKPT=logs/r5_native_ck SPNET_LOGDIR=logs/r5_native
  python -u scripts/dataset_a_run.py 90 16 4e-5 40960 float32 0)
if ! grep -q DATASET_A_RESULT /tmp/r5_nativefull2.log 2>/dev/null; then
  for attempt in 1 2; do
    step "native-res RESUME (attempt $attempt)" 75 || break
    "${NATIVE_CMD[@]}" >> /tmp/r5_nativefull2.log 2>&1
    grep -q DATASET_A_RESULT /tmp/r5_nativefull2.log && break
    echo "  native resume attempt $attempt died ($(date +%H:%M:%S))"
    archive
    sleep 90
  done
fi
archive

# ---- 1. flip-TTA on the native ckpt ----
if grep -q DATASET_A_RESULT /tmp/r5_nativefull2.log 2>/dev/null \
    && ! grep -q EVAL_TTA_RESULT /tmp/r5_tta_native.log 2>/dev/null \
    && step "TTA eval of native-res ckpt" 22; then
  for attempt in 1 2; do
    python -u scripts/eval_tta.py logs/r5_native_ck synth \
      >> /tmp/r5_tta_native.log 2>&1
    grep -q EVAL_TTA_RESULT /tmp/r5_tta_native.log && break
    echo "  TTA attempt $attempt died ($(date +%H:%M:%S))"
    sleep 90; fits 20 || break; wait_for_relay
  done
  grep -o 'EVAL_TTA_RESULT.*' /tmp/r5_tta_native.log | tail -1 | head -c 500
fi
archive

# ---- 1b. residual decomposition on the native ckpt ----
# Proves (or refutes) the VALIDATION §2 attribution on hardware: the
# sub-3-px ring-spacing bucket (84.9 % at 331²) should close at native
# 512x384 where no downsample limits ring contrast.
if grep -q DATASET_A_RESULT /tmp/r5_nativefull2.log 2>/dev/null \
    && ! grep -q 'BREAKDOWN ' /tmp/r5_breakdown_native.log 2>/dev/null \
    && step "eval_breakdown on native ckpt" 14; then
  python -u scripts/eval_breakdown.py logs/r5_native_ck \
    >> /tmp/r5_breakdown_native.log 2>&1
  grep -o 'BREAKDOWN .*' /tmp/r5_breakdown_native.log | tail -1 | head -c 600
fi
archive

# ---- 2. dataset-D matched cadence (pregather=0, 3x1120 split) ----
if ! grep -q DATASET_D_RESULT /tmp/r5_datasetd.log 2>/dev/null \
    && step "dataset-D onthefly rep42" 22; then
  env SPNET_PREGATHER=0 SPNET_MAX_SCAN_STEPS=1120 \
    python -u scripts/dataset_d_run.py --arm onthefly --rep 42 \
    >> /tmp/r5_datasetd.log 2>&1
  grep -o 'DATASET_D_RESULT.*' /tmp/r5_datasetd.log | tail -1 | head -c 600
fi
archive

# ---- 3. movie .bmp predict ----
if ! grep -q MOVIE_RESULT /tmp/r5_movie.log 2>/dev/null \
    && step "movie .bmp predict e2e" 12; then
  python -u scripts/movie_predict.py >> /tmp/r5_movie.log 2>&1
  grep -o 'MOVIE_RESULT.*' /tmp/r5_movie.log | tail -1 | head -c 400
fi
archive

# ---- 4. keras .h5 finetune ----
if ! grep -q KERAS_H5_RESULT /tmp/r5_kerash5.log 2>/dev/null \
    && step "keras .h5 import + finetune" 16; then
  python -u scripts/keras_h5_finetune.py >> /tmp/r5_kerash5.log 2>&1
  grep -o 'KERAS_H5_RESULT.*' /tmp/r5_kerash5.log | tail -1 | head -c 400
fi
archive

echo "QUEUE_R5H DONE ($(date +%H:%M:%S))" | tee /tmp/r5_queue8.done
