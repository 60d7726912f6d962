#!/bin/bash
# Round-4 TPU queue, part 16 (session 7) — runs after queue15 drains.
#   1. TTA re-eval of the 384 long-run checkpoint with the FIXED
#      object-level merge (the slot-level merge was unsound: asymmetric
#      grid partition under mirroring) + per-view diagnostics.
#      This is the beat-96.5 attempt: the broken merge already cut
#      ring-miscounts 248 -> 144; with direct detections preserved that
#      alone is worth ~+0.5 pt over 96.22.
#   2. dataset-D arms rerun (uint8 file datasets + budgeted residency
#      fixed the 24.5 GB f32 OOM).
#   3. bench.py confirm at the new unroll=2 default (expect ~3005).
#   4. gated on queue15's pinned big confirm passing: LONG 150-epoch
#      native-resolution (input_size=0) run with SPNET_PIN_X_LAYOUT=1,
#      checkpointed + auto-resume, then TTA eval of its checkpoint.
# Touch /tmp/stop_queue16 to stop between steps.
cd /root/repo
HARD_DEADLINE_EPOCH=$(date -d 'tomorrow 07:00' +%s)
[ "$(date +%H)" -lt 14 ] && HARD_DEADLINE_EPOCH=$(date -d 'today 07:00' +%s)

past_hard_deadline() { [ "$(date +%s)" -gt "$HARD_DEADLINE_EPOCH" ]; }

probe_ok() {
  rm -f /tmp/probe16.log
  setsid bash -c 'echo $$ > /tmp/probe16.pid; exec python -u -c "
import jax, jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum())
print(\"TPU PROBE OK\", float(f(jnp.ones((256, 256)))), flush=True)
" > /tmp/probe16.log 2>&1' &
  for i in $(seq 1 60); do
    sleep 5
    grep -q "TPU PROBE OK" /tmp/probe16.log 2>/dev/null && return 0
  done
  kill "$(cat /tmp/probe16.pid)" 2>/dev/null
  sleep 90
  return 1
}

wait_for_relay() {
  until probe_ok; do
    [ -f /tmp/stop_queue16 ] && echo "QUEUE16 STOPPED while waiting" && exit 0
    past_hard_deadline && echo "QUEUE16 deadline while relay down" && exit 0
    echo "  relay still down ($(date +%H:%M:%S))"
    sleep 120
  done
}

step() {
  [ -f /tmp/stop_queue16 ] && echo "QUEUE16 STOPPED before: $1" && exit 0
  past_hard_deadline && echo "QUEUE16 hard deadline passed; skipping: $1" \
    && return 1
  echo "QUEUE16 STEP: $1 ($(date +%H:%M:%S))"
}

run_training() {
  local marker="$1" log="$2" tries="$3"; shift 3
  for attempt in $(seq 1 "$tries"); do
    [ -f /tmp/stop_queue16 ] && echo "QUEUE16 STOPPED (training retry)" && return 1
    "$@" >> "$log" 2>&1
    grep -q "$marker" "$log" && return 0
    echo "  attempt $attempt died without $marker ($(date +%H:%M:%S)); re-probing relay"
    sleep 90
    wait_for_relay
  done
  echo "  GAVE UP after $tries attempts: $*"
  return 1
}

echo "QUEUE16 waiting for queue15 to finish ($(date +%H:%M:%S))"
until [ -f /tmp/r4_queue15.done ]; do
  [ -f /tmp/stop_queue16 ] && echo "QUEUE16 STOPPED while waiting" && exit 0
  past_hard_deadline && echo "QUEUE16 deadline passed while waiting" && exit 0
  if [ -f /tmp/queue15.pid ] && ! kill -0 "$(cat /tmp/queue15.pid)" 2>/dev/null; then
    echo "QUEUE16: queue15 process gone without done marker; proceeding"
    break
  fi
  sleep 120
done
wait_for_relay

# ---- 1. TTA re-eval with the object-level merge ----
if [ -d logs/r4_long_ckpt ] && step "TTA re-eval (object-level merge) of r4_long_ckpt"; then
  run_training EVAL_TTA_RESULT /tmp/r4_tta_fixed.log 3 \
    python -u scripts/eval_tta.py logs/r4_long_ckpt synth
  grep -E "view |plain:|tta:" /tmp/r4_tta_fixed.log | tail -8
fi

# ---- 2. dataset-D arms (uint8 + budgeted residency) ----
if step "dataset-D arms rerun (geo-augment vs offline inflation)"; then
  sleep 20
  wait_for_relay
  run_training DATASET_D_RESULT /tmp/r4_datasetd2.log 3 \
    python -u scripts/dataset_d_run.py 1280 12
fi

# ---- 3. bench confirm at the new defaults ----
if step "bench.py confirm (unroll=2 default)"; then
  sleep 20
  wait_for_relay
  python -u bench.py > /tmp/r4_bench16.log 2>&1
  tail -1 /tmp/r4_bench16.log
fi

# ---- 4. LONG native-resolution run, gated on the pinned confirm ----
if grep -q "PINNED BIG CONFIRM PASSED" /tmp/r4_queue15.log 2>/dev/null; then
  if step "LONG 150ep native-resolution run (input_size=0, mixed, pinned layout)"; then
    sleep 20
    wait_for_relay
    run_training DATASET_A_RESULT /tmp/r4_big_long.log 6 \
      env SPNET_PIN_X_LAYOUT=1 SPNET_BACKBONE_DTYPE=bfloat16 \
      SPNET_CKPT=logs/r4_big_ckpt SPNET_LOGDIR=logs/r4_big_long \
      python -u scripts/dataset_a_run.py 150 16 4e-5 40960 float32 0
    tail -3 /tmp/r4_big_long.log
  fi
  if [ -d logs/r4_big_ckpt ] && step "TTA eval of the big checkpoint"; then
    sleep 20
    wait_for_relay
    run_training EVAL_TTA_RESULT /tmp/r4_tta_big.log 3 \
      python -u scripts/eval_tta.py logs/r4_big_ckpt synth
  fi
else
  echo "QUEUE16: pinned big confirm did not pass; no big long run"
fi

echo "QUEUE16 DONE ($(date +%H:%M:%S))" | tee /tmp/r4_queue16.done
