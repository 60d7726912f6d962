#!/bin/bash
# Round-5 TPU queue, part 1 — the VERDICT.md run ledger, in value order:
#   1. dataset-D matched-cadence on-the-fly arm (--arm onthefly --rep 42)
#      against the recorded offline row  (VERDICT next #4).
#   2. probe_bigprog quadrant grid: the real native-res train-step epoch
#      program at 8.15 GB over scan lengths 4 / 512 / 2560 — pins the
#      full-scale 'big' crash to program-working-set vs scan-length
#      (VERDICT next #2, first half).
#   3. refgen-384 mixed 150-ep long run (gated on the host-side 384
#      datagen) + flip-TTA eval — the single-sweep ≥96.5 attempt on the
#      reference's OWN cv2 frames  (VERDICT next #3).
#   4. native-resolution (input_size=0) 150-ep mixed run at 30,720
#      frames (6.04 GB resident, the proven size) + TTA — the completed
#      native-res VALIDATION row  (VERDICT next #2, second half).
# Touch /tmp/stop_queue_r5 to stop between steps.  Deadline-gated: the
# round has ~12 h of wall from 08:15; no step STARTS that could not
# finish by DEADLINE (runs are never killed mid-flight).
cd /root/repo
DEADLINE_EPOCH=$(date -d 'today 19:30' +%s)
past_deadline() { [ "$(date +%s)" -gt "$DEADLINE_EPOCH" ]; }
# margin gate: don't start a step whose expected minutes overrun
fits() { [ "$(( $(date +%s) + $1 * 60 ))" -lt "$DEADLINE_EPOCH" ]; }

probe_ok() {
  rm -f /tmp/probe_r5.log
  setsid bash -c 'echo $$ > /tmp/probe_r5.pid; exec python -u -c "
import jax, jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum())
print(\"TPU PROBE OK\", float(f(jnp.ones((256, 256)))), flush=True)
" > /tmp/probe_r5.log 2>&1' &
  for i in $(seq 1 60); do
    sleep 5
    grep -q "TPU PROBE OK" /tmp/probe_r5.log 2>/dev/null && return 0
  done
  kill "$(cat /tmp/probe_r5.pid)" 2>/dev/null
  sleep 90
  return 1
}

wait_for_relay() {
  until probe_ok; do
    [ -f /tmp/stop_queue_r5 ] && echo "QUEUE_R5 STOPPED while waiting" && exit 0
    past_deadline && echo "QUEUE_R5 deadline while relay down" && exit 0
    echo "  relay still down ($(date +%H:%M:%S))"
    sleep 120
  done
}

step() {
  [ -f /tmp/stop_queue_r5 ] && echo "QUEUE_R5 STOPPED before: $1" && exit 0
  fits "$2" || { echo "QUEUE_R5: no margin for: $1"; return 1; }
  wait_for_relay
  echo "QUEUE_R5 STEP: $1 ($(date +%H:%M:%S))"
  return 0
}

# run_training MARKER LOG RETRIES CMD... — run CMD to completion,
# retrying (fresh relay probe first) if the marker never appears.
# Each retry RE-CHECKS the deadline margin (ADVICE r4: a near-deadline
# retry must not relaunch an unkillable long run).
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

# ---- 1. dataset-D matched-cadence on-the-fly arm (~40 min) ----
if step "dataset-D --arm onthefly --rep 42 (matched val cadence)" 50; then
  run_training DATASET_D_RESULT /tmp/r5_datasetd.log 2 45 \
    python -u scripts/dataset_d_run.py --arm onthefly --rep 42
  grep -o 'DATASET_D_RESULT.*' /tmp/r5_datasetd.log | tail -1 | head -c 600
fi

# ---- 2. probe_bigprog quadrant grid (~15 min per point) ----
for steps in 4 512 2560; do
  if step "probe_bigprog 8.15 GB steps=$steps" 25; then
    python -u scripts/probe_bigprog.py 8.15 $steps >> /tmp/r5_bigprog.log 2>&1
    if grep -q "BIGPROG_OK 8.15 $steps" /tmp/r5_bigprog.log; then
      echo "  BIGPROG_OK at steps=$steps"
      sleep 20
    else
      echo "QUEUE_R5: bigprog CRASH at steps=$steps (quadrant pinned)" \
        | tee -a /tmp/r5_bigprog.log
      sleep 120
      break
    fi
  else
    break
  fi
done

# ---- 3. refgen-384 mixed long run + TTA ----
echo "QUEUE_R5 waiting for refgen-384 datagen ($(date +%H:%M:%S))"
until grep -q "REFGEN_DONE" /tmp/refgen384.log 2>/dev/null; do
  if [ -f /tmp/refgen384.pid ] && ! kill -0 "$(cat /tmp/refgen384.pid)" 2>/dev/null; then
    echo "QUEUE_R5: datagen died; relaunching"
    setsid bash -c 'echo $$ > /tmp/refgen384.pid; exec nice -n 19 python -u scripts/refgen_dataset.py 45952 384 >> /tmp/refgen384.log 2>&1' &
  fi
  [ -f /tmp/stop_queue_r5 ] && echo "QUEUE_R5 STOPPED while waiting" && exit 0
  past_deadline && echo "QUEUE_R5 deadline waiting for datagen" && exit 0
  sleep 60
done

# 150 ep needs ~135 min train+stage+eval; reserve TTA's ~15 min inside
# the gate.  Fall back to 100 ep if the margin is short.
EPOCHS=""
if fits 150; then EPOCHS=150; elif fits 110; then EPOCHS=100; fi
if [ -n "$EPOCHS" ] && step "refgen-384 mixed ${EPOCHS}ep" 10; then
  run_training REFGEN_RESULT /tmp/r5_refgen384.log 2 135 \
    env SPNET_BACKBONE_DTYPE=bfloat16 SPNET_CKPT=logs/refgen384_ck \
      SPNET_LOGDIR=logs/refgen384_mixed \
      python -u scripts/refgen_run.py $EPOCHS 16 4e-5 float32 384
  grep -o 'REFGEN_RESULT.*' /tmp/r5_refgen384.log | tail -1 | head -c 500
fi
if grep -q "REFGEN_RESULT" /tmp/r5_refgen384.log 2>/dev/null \
    && step "flip-TTA on refgen-384 ckpt" 15; then
  run_training EVAL_TTA_RESULT /tmp/r5_refgen384_tta.log 2 12 \
    python -u scripts/eval_tta.py logs/refgen384_ck refgen
  grep -o 'EVAL_TTA_RESULT.*' /tmp/r5_refgen384_tta.log | tail -1 | head -c 500
fi

# ---- 4. native-resolution 30,720-frame 150-ep mixed run + TTA ----
# ~50 min on-TPU datagen (cached thereafter) + ~90 min train + eval.
if step "native-res (size=0) 150ep mixed @30720 (6.04 GB)" 165; then
  run_training DATASET_A_RESULT /tmp/r5_native30k.log 2 160 \
    env SPNET_BACKBONE_DTYPE=bfloat16 SPNET_CKPT=logs/r5_native30k_ckpt \
      SPNET_LOGDIR=logs/r5_native30k \
      python -u scripts/dataset_a_run.py 150 16 4e-5 30720 float32 0
  grep -o 'DATASET_A_RESULT.*' /tmp/r5_native30k.log | tail -1 | head -c 500
fi
if [ -d logs/r5_native30k_ckpt ] && step "TTA eval of native-res ckpt" 15; then
  run_training EVAL_TTA_RESULT /tmp/r5_tta_native.log 2 12 \
    python -u scripts/eval_tta.py logs/r5_native30k_ckpt synth
  grep -o 'EVAL_TTA_RESULT.*' /tmp/r5_tta_native.log | tail -1 | head -c 500
fi

echo "QUEUE_R5 part1 DONE ($(date +%H:%M:%S))" | tee /tmp/r5_queue1.done
