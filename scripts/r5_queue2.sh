#!/bin/bash
# Round-5 TPU queue, part 2 (reordered): short proof steps first, then
# the long full-scale native run with resume-aware retries.
#   1. dataset-D matched-cadence rerun, scan-split (3 x 1,120).
#   2. keras real-.h5 import + 5-ep finetune (VERDICT #7).
#   3. movie .bmp predict e2e on the refgen checkpoint (VERDICT #6).
#   4. MFU sweep (VERDICT #5).
#   5. FULL-scale native-res run: 40,960 frames / 8.05 GB resident,
#      150 ep mixed, epoch = 5 x 512-step programs (the probe-validated
#      shape).  save_every=10 + auto-resume: retries resume from the
#      checkpoint, so attempt 2+ gates on a small margin.
#   6. flip-TTA on the native ckpt; bench confirm.
# Touch /tmp/stop_queue_r5b to stop between steps.
cd /root/repo
DEADLINE_EPOCH=$(date -d 'today 19:30' +%s)
past_deadline() { [ "$(date +%s)" -gt "$DEADLINE_EPOCH" ]; }
fits() { [ "$(( $(date +%s) + $1 * 60 ))" -lt "$DEADLINE_EPOCH" ]; }

probe_ok() {
  rm -f /tmp/probe_r5b.log
  setsid bash -c 'echo $$ > /tmp/probe_r5b.pid; exec python -u -c "
import jax, jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum())
print(\"TPU PROBE OK\", float(f(jnp.ones((256, 256)))), flush=True)
" > /tmp/probe_r5b.log 2>&1' &
  for i in $(seq 1 60); do
    sleep 5
    grep -q "TPU PROBE OK" /tmp/probe_r5b.log 2>/dev/null && return 0
  done
  kill "$(cat /tmp/probe_r5b.pid)" 2>/dev/null
  sleep 90
  return 1
}

wait_for_relay() {
  until probe_ok; do
    [ -f /tmp/stop_queue_r5b ] && echo "QUEUE_R5B STOPPED while waiting" && exit 0
    past_deadline && echo "QUEUE_R5B deadline while relay down" && exit 0
    echo "  relay still down ($(date +%H:%M:%S))"
    sleep 120
  done
}

step() {
  [ -f /tmp/stop_queue_r5b ] && echo "QUEUE_R5B STOPPED before: $1" && exit 0
  fits "$2" || { echo "QUEUE_R5B: no margin for: $1"; return 1; }
  wait_for_relay
  echo "QUEUE_R5B STEP: $1 ($(date +%H:%M:%S))"
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

# ---- wait for queue1 to finish/stop ----
echo "QUEUE_R5B waiting for queue1 ($(date +%H:%M:%S))"
while kill -0 "$(cat /tmp/r5_queue1.pid 2>/dev/null)" 2>/dev/null; do
  [ -f /tmp/stop_queue_r5b ] && echo "QUEUE_R5B STOPPED while waiting" && exit 0
  past_deadline && echo "QUEUE_R5B deadline waiting for queue1" && exit 0
  sleep 60
done
sleep 30

# ---- 1. dataset-D matched cadence, scan-split (~45 min) ----
if step "dataset-D onthefly rep42 (3x1120-step programs)" 55; then
  run_training DATASET_D_RESULT /tmp/r5_datasetd.log 2 50 \
    env SPNET_MAX_SCAN_STEPS=1120 \
      python -u scripts/dataset_d_run.py --arm onthefly --rep 42
  grep -o 'DATASET_D_RESULT.*' /tmp/r5_datasetd.log | tail -1 | head -c 600
fi

# ---- 2. keras real-.h5 import + finetune proof (~20 min) ----
if step "keras .h5 import + 5ep finetune" 30; then
  run_training KERAS_H5_RESULT /tmp/r5_kerash5.log 2 25 \
    python -u scripts/keras_h5_finetune.py
  grep -o 'KERAS_H5_RESULT.*' /tmp/r5_kerash5.log | tail -1 | head -c 400
fi

# ---- 3. movie .bmp predict end-to-end (~15 min) ----
if step "movie .bmp predict e2e" 25; then
  run_training MOVIE_RESULT /tmp/r5_movie.log 2 20 \
    python -u scripts/movie_predict.py
  grep -o 'MOVIE_RESULT.*' /tmp/r5_movie.log | tail -1 | head -c 400
fi

# ---- 4. MFU sweep (~40 min) ----
if step "MFU sweep" 45; then
  run_training MFU_SWEEP_DONE /tmp/r5_mfu.log 1 40 \
    python -u scripts/r5_mfu_sweep.py
  grep -E "MFU_VARIANT|MFU_SWEEP_RESULT" /tmp/r5_mfu.log | tail -8
fi

# ---- 5. FULL-scale native-res run (8.05 GB, 5x512-step programs) ----
# attempt 1 gates on the full ~210 min; later attempts RESUME from
# logs/r5_native_ck (save_every=10) so they gate on 75 min only.
NATIVE_CMD=(env SPNET_BACKBONE_DTYPE=bfloat16 SPNET_MAX_SCAN_STEPS=512
  SPNET_CKPT=logs/r5_native_ck SPNET_LOGDIR=logs/r5_native
  python -u scripts/dataset_a_run.py 150 16 4e-5 40960 float32 0)
if step "native-res FULL 40960 (8.05 GB, split 5x512) 150ep mixed" 210; then
  for attempt in 1 2 3 4; do
    need=210; [ "$attempt" -gt 1 ] && need=75
    fits $need || { echo "  no margin for native attempt $attempt"; break; }
    "${NATIVE_CMD[@]}" >> /tmp/r5_nativefull.log 2>&1
    grep -q DATASET_A_RESULT /tmp/r5_nativefull.log && break
    echo "  native attempt $attempt died ($(date +%H:%M:%S)); will resume"
    sleep 90
    wait_for_relay
  done
  grep -o 'DATASET_A_RESULT.*' /tmp/r5_nativefull.log | tail -1 | head -c 500
fi
if grep -q DATASET_A_RESULT /tmp/r5_nativefull.log 2>/dev/null \
    && step "TTA eval of native-res ckpt" 20; then
  run_training EVAL_TTA_RESULT /tmp/r5_tta_native.log 2 15 \
    python -u scripts/eval_tta.py logs/r5_native_ck synth
  grep -o 'EVAL_TTA_RESULT.*' /tmp/r5_tta_native.log | tail -1 | head -c 500
fi

# ---- 6. bench confirm ----
if step "bench.py confirm" 15; then
  run_training '"metric"' /tmp/r5_bench.log 2 12 python -u bench.py
  tail -1 /tmp/r5_bench.log
fi

echo "QUEUE_R5B DONE ($(date +%H:%M:%S))" | tee /tmp/r5_queue2.done
