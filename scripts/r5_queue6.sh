#!/bin/bash
# Round-5 queue, part 6 (session 12, post-wipe-#9 relaunch).
# Wipe #9 (boot 00:22) took queue4/queue5 in flight again: the native
# full-scale run (attempt 2 was training at 667 img/s), native TTA,
# dataset-D matched-cadence, keras-h5 finetune, movie predict.
# This session has ~3 h; the ledger is re-sized to fit:
#   1. native-res FULL-scale run at 90 EPOCHS (not 150 — 150 needs
#      ~215 min; 90 fits with margin at the proven 667 img/s +
#      ~20 min datagen).  Same mixed recipe as the 384 best row
#      (f32 stem/head + bf16 backbone), 5x512-step split programs.
#   2. flip-TTA on the native ckpt.
#   3/4. movie + keras-h5 pickups, margin permitting.
# Hard deadline 03:50 so the chip is free for the driver's bench.
# Touch /tmp/stop_queue_r5f to stop between steps.
cd /root/repo
DEADLINE_EPOCH=$(date -d 'tomorrow 03:50' +%s)
[ "$(date +%H)" -lt 12 ] && DEADLINE_EPOCH=$(date -d 'today 03:50' +%s)
past_deadline() { [ "$(date +%s)" -gt "$DEADLINE_EPOCH" ]; }
fits() { [ "$(( $(date +%s) + $1 * 60 ))" -lt "$DEADLINE_EPOCH" ]; }

probe_ok() {
  rm -f /tmp/probe_r5f.log
  setsid bash -c 'echo $$ > /tmp/probe_r5f.pid; exec python -u -c "
import jax, jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum())
print(\"TPU PROBE OK\", float(f(jnp.ones((256, 256)))), flush=True)
" > /tmp/probe_r5f.log 2>&1' &
  for i in $(seq 1 60); do
    sleep 5
    grep -q "TPU PROBE OK" /tmp/probe_r5f.log 2>/dev/null && return 0
  done
  kill "$(cat /tmp/probe_r5f.pid)" 2>/dev/null
  sleep 90
  return 1
}

wait_for_relay() {
  until probe_ok; do
    [ -f /tmp/stop_queue_r5f ] && echo "QUEUE_R5F STOPPED while waiting" && exit 0
    past_deadline && echo "QUEUE_R5F deadline while relay down" && exit 0
    echo "  relay still down ($(date +%H:%M:%S))"
    sleep 120
  done
}

archive() {
  mkdir -p docs/run_logs
  for f in r5_nativefull2 r5_tta_native r5_movie r5_kerash5; do
    [ -f /tmp/$f.log ] && grep -v "^WARNING" /tmp/$f.log | tail -800 \
      > docs/run_logs/${f}.log
  done
}

step() {
  [ -f /tmp/stop_queue_r5f ] && echo "QUEUE_R5F STOPPED before: $1" && exit 0
  fits "$2" || { echo "QUEUE_R5F: no margin for: $1"; return 1; }
  wait_for_relay
  echo "QUEUE_R5F STEP: $1 ($(date +%H:%M:%S))"
  return 0
}

run_training() {
  local marker="$1" log="$2" retries="$3" mins="$4"; shift 4
  for attempt in $(seq 1 "$retries"); do
    fits "$mins" || { echo "  no margin for attempt $attempt"; return 1; }
    "$@" >> "$log" 2>&1
    grep -q "$marker" "$log" && return 0
    echo "  attempt $attempt died ($(date +%H:%M:%S)); re-probing relay"
    archive
    sleep 90
    wait_for_relay
  done
  return 1
}

# ---- 1. FULL-scale native-res run, 90 ep (8.05 GB, 5x512 programs) ----
# attempt 1 gates on ~145 min (datagen 20 + compile 10 + train 92 +
# val/eval ~10 + slack); later attempts RESUME from logs/r5_native_ck
# (save_every=10) so they gate on 75 min only.
NATIVE_CMD=(env SPNET_BACKBONE_DTYPE=bfloat16 SPNET_MAX_SCAN_STEPS=512
  SPNET_CKPT=logs/r5_native_ck SPNET_LOGDIR=logs/r5_native
  python -u scripts/dataset_a_run.py 90 16 4e-5 40960 float32 0)
if step "native-res FULL 40960 (8.05 GB, split 5x512) 90ep mixed" 140; then
  for attempt in 1 2 3 4; do
    need=140; [ "$attempt" -gt 1 ] && need=75
    fits $need || { echo "  no margin for native attempt $attempt"; break; }
    "${NATIVE_CMD[@]}" >> /tmp/r5_nativefull2.log 2>&1
    grep -q DATASET_A_RESULT /tmp/r5_nativefull2.log && break
    echo "  native attempt $attempt died ($(date +%H:%M:%S)); will resume"
    archive
    sleep 90
    wait_for_relay
  done
  grep -o 'DATASET_A_RESULT.*' /tmp/r5_nativefull2.log | tail -1 | head -c 500
fi
archive

# ---- 2. flip-TTA on the native ckpt ----
if grep -q DATASET_A_RESULT /tmp/r5_nativefull2.log 2>/dev/null \
    && step "TTA eval of native-res ckpt" 16; then
  run_training EVAL_TTA_RESULT /tmp/r5_tta_native.log 2 14 \
    python -u scripts/eval_tta.py logs/r5_native_ck synth
  grep -o 'EVAL_TTA_RESULT.*' /tmp/r5_tta_native.log | tail -1 | head -c 500
fi
archive

# ---- 3. movie .bmp predict pickup ----
if step "movie .bmp predict e2e" 15; then
  run_training MOVIE_RESULT /tmp/r5_movie.log 2 12 \
    python -u scripts/movie_predict.py
  grep -o 'MOVIE_RESULT.*' /tmp/r5_movie.log | tail -1 | head -c 400
fi
archive

# ---- 4. keras real-.h5 import + finetune pickup ----
if step "keras .h5 import + finetune" 22; then
  run_training KERAS_H5_RESULT /tmp/r5_kerash5.log 2 20 \
    python -u scripts/keras_h5_finetune.py
  grep -o 'KERAS_H5_RESULT.*' /tmp/r5_kerash5.log | tail -1 | head -c 400
fi
archive

echo "QUEUE_R5F DONE ($(date +%H:%M:%S))" | tee /tmp/r5_queue6.done
