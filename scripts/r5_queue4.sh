#!/bin/bash
# Round-5 queue, part 4 (session 10, post-wipe-#8 relaunch).
# Wipe #8 took queue2/queue3's in-flight work; re-run the lost ledger:
#   1. MFU sweep (VERDICT #5) — first, so a winning variant can flip
#      bench defaults before the driver's end-of-round bench.
#   2. FULL-scale native-res run: 40,960 frames / 8.05 GB resident,
#      150 ep mixed, epoch = 5 x 512-step programs (probe-validated
#      shape), save_every=10 + auto-resume (VERDICT #2).
#   3. flip-TTA on the native ckpt (synth val).
#   4. dataset-D matched-cadence, pregather=0 + scan-split (VERDICT #4).
#   5. keras real-.h5 import + 5-ep finetune (VERDICT #7).
#   6. movie .bmp predict e2e on the native ckpt (VERDICT #6).
# Archive /tmp logs into docs/run_logs after EVERY step (wipe-proof).
# Touch /tmp/stop_queue_r5d to stop between steps.
cd /root/repo
DEADLINE_EPOCH=$(date -d 'tomorrow 02:05' +%s)
[ "$(date +%H)" -lt 12 ] && DEADLINE_EPOCH=$(date -d 'today 02:05' +%s)
past_deadline() { [ "$(date +%s)" -gt "$DEADLINE_EPOCH" ]; }
fits() { [ "$(( $(date +%s) + $1 * 60 ))" -lt "$DEADLINE_EPOCH" ]; }

probe_ok() {
  rm -f /tmp/probe_r5d.log
  setsid bash -c 'echo $$ > /tmp/probe_r5d.pid; exec python -u -c "
import jax, jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum())
print(\"TPU PROBE OK\", float(f(jnp.ones((256, 256)))), flush=True)
" > /tmp/probe_r5d.log 2>&1' &
  for i in $(seq 1 60); do
    sleep 5
    grep -q "TPU PROBE OK" /tmp/probe_r5d.log 2>/dev/null && return 0
  done
  kill "$(cat /tmp/probe_r5d.pid)" 2>/dev/null
  sleep 90
  return 1
}

wait_for_relay() {
  until probe_ok; do
    [ -f /tmp/stop_queue_r5d ] && echo "QUEUE_R5D STOPPED while waiting" && exit 0
    past_deadline && echo "QUEUE_R5D deadline while relay down" && exit 0
    echo "  relay still down ($(date +%H:%M:%S))"
    sleep 120
  done
}

archive() {
  mkdir -p docs/run_logs
  for f in r5_mfu r5_nativefull r5_tta_native r5_datasetd r5_kerash5 \
           r5_movie r5_bench; do
    [ -f /tmp/$f.log ] && grep -v "^WARNING" /tmp/$f.log | tail -800 \
      > docs/run_logs/${f}.log
  done
}

step() {
  [ -f /tmp/stop_queue_r5d ] && echo "QUEUE_R5D STOPPED before: $1" && exit 0
  fits "$2" || { echo "QUEUE_R5D: no margin for: $1"; return 1; }
  wait_for_relay
  echo "QUEUE_R5D STEP: $1 ($(date +%H:%M:%S))"
  return 0
}

run_training() {
  local marker="$1" log="$2" retries="$3" mins="$4"; shift 4
  for attempt in $(seq 1 "$retries"); do
    fits "$mins" || { echo "  no margin for attempt $attempt"; return 1; }
    "$@" >> "$log" 2>&1
    grep -q "$marker" "$log" && return 0
    echo "  attempt $attempt died ($(date +%H:%M:%S)); re-probing relay"
    sleep 90
    wait_for_relay
  done
  return 1
}

# ---- 1. MFU sweep (~45 min) ----
if step "MFU sweep" 50; then
  run_training MFU_SWEEP_DONE /tmp/r5_mfu.log 1 45 \
    python -u scripts/r5_mfu_sweep.py
  grep -E "MFU_VARIANT|MFU_SWEEP_RESULT" /tmp/r5_mfu.log | tail -8
fi
archive

# ---- 2. FULL-scale native-res run (8.05 GB, 5x512-step programs) ----
# attempt 1 gates on the full ~215 min; later attempts RESUME from
# logs/r5_native_ck (save_every=10) so they gate on 80 min only.
NATIVE_CMD=(env SPNET_BACKBONE_DTYPE=bfloat16 SPNET_MAX_SCAN_STEPS=512
  SPNET_CKPT=logs/r5_native_ck SPNET_LOGDIR=logs/r5_native
  python -u scripts/dataset_a_run.py 150 16 4e-5 40960 float32 0)
if step "native-res FULL 40960 (8.05 GB, split 5x512) 150ep mixed" 215; then
  for attempt in 1 2 3 4; do
    need=215; [ "$attempt" -gt 1 ] && need=80
    fits $need || { echo "  no margin for native attempt $attempt"; break; }
    "${NATIVE_CMD[@]}" >> /tmp/r5_nativefull.log 2>&1
    grep -q DATASET_A_RESULT /tmp/r5_nativefull.log && break
    echo "  native attempt $attempt died ($(date +%H:%M:%S)); will resume"
    archive
    sleep 90
    wait_for_relay
  done
  grep -o 'DATASET_A_RESULT.*' /tmp/r5_nativefull.log | tail -1 | head -c 500
fi
archive

# ---- 3. flip-TTA on the native ckpt ----
if grep -q DATASET_A_RESULT /tmp/r5_nativefull.log 2>/dev/null \
    && step "TTA eval of native-res ckpt" 20; then
  run_training EVAL_TTA_RESULT /tmp/r5_tta_native.log 2 15 \
    python -u scripts/eval_tta.py logs/r5_native_ck synth
  grep -o 'EVAL_TTA_RESULT.*' /tmp/r5_tta_native.log | tail -1 | head -c 500
fi
archive

# ---- 4. dataset-D matched cadence, pregather=0 + scan-split (~45 min) ----
if step "dataset-D onthefly rep42 (pregather=0, 3x1120)" 55; then
  run_training DATASET_D_RESULT /tmp/r5_datasetd.log 2 50 \
    env SPNET_PREGATHER=0 SPNET_MAX_SCAN_STEPS=1120 \
      python -u scripts/dataset_d_run.py --arm onthefly --rep 42
  grep -o 'DATASET_D_RESULT.*' /tmp/r5_datasetd.log | tail -1 | head -c 600
fi
archive

# ---- 5. keras real-.h5 import + finetune proof (~20 min) ----
if step "keras .h5 import + 5ep finetune" 30; then
  run_training KERAS_H5_RESULT /tmp/r5_kerash5.log 2 25 \
    python -u scripts/keras_h5_finetune.py
  grep -o 'KERAS_H5_RESULT.*' /tmp/r5_kerash5.log | tail -1 | head -c 400
fi
archive

# ---- 6. movie .bmp predict end-to-end (~15 min) ----
if step "movie .bmp predict e2e" 25; then
  run_training MOVIE_RESULT /tmp/r5_movie.log 2 20 \
    python -u scripts/movie_predict.py
  grep -o 'MOVIE_RESULT.*' /tmp/r5_movie.log | tail -1 | head -c 400
fi
archive

echo "QUEUE_R5D DONE ($(date +%H:%M:%S))" | tee /tmp/r5_queue4.done
