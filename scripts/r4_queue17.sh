#!/bin/bash
# Round-4 TPU queue, part 17 (session 7) — runs after queue16 drains.
#   1. Backbone sweep re-earn: MobileNet + DarkNet19 25-ep rows (their
#      queue10 logs were lost to container wipe #4 — §2f needs archived
#      logs with mAP + img/s), plus a completed NASNetMobile row at the
#      gentler lr 4e-5 (the 1e-4 1-cycle diverged mid-schedule).
#   2. refgen-384 long run (gated on the host-side 384 datagen
#      finishing): the §2g TTA beat re-proven on frames drawn by the
#      reference's OWN cv2 pipeline — 150 ep, exact recipe, §2e mixed
#      split — then TTA eval on the refgen val split.
#   3. native-resolution (input_size=0) 150-ep run at 30,720 frames =
#      6.04 GB resident — the residency size proven fine at 384² —
#      to (a) get the no-resize-at-all endpoint and (b) discriminate
#      whether the 8.15 GB big-run crash is size- or shape-driven.
#      Then TTA eval.
# Touch /tmp/stop_queue17 to stop between steps.
cd /root/repo
HARD_DEADLINE_EPOCH=$(date -d 'tomorrow 06:30' +%s)
[ "$(date +%H)" -lt 14 ] && HARD_DEADLINE_EPOCH=$(date -d 'today 06:30' +%s)

past_hard_deadline() { [ "$(date +%s)" -gt "$HARD_DEADLINE_EPOCH" ]; }

probe_ok() {
  rm -f /tmp/probe17.log
  setsid bash -c 'echo $$ > /tmp/probe17.pid; exec python -u -c "
import jax, jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum())
print(\"TPU PROBE OK\", float(f(jnp.ones((256, 256)))), flush=True)
" > /tmp/probe17.log 2>&1' &
  for i in $(seq 1 60); do
    sleep 5
    grep -q "TPU PROBE OK" /tmp/probe17.log 2>/dev/null && return 0
  done
  kill "$(cat /tmp/probe17.pid)" 2>/dev/null
  sleep 90
  return 1
}

wait_for_relay() {
  until probe_ok; do
    [ -f /tmp/stop_queue17 ] && echo "QUEUE17 STOPPED while waiting" && exit 0
    past_hard_deadline && echo "QUEUE17 deadline while relay down" && exit 0
    echo "  relay still down ($(date +%H:%M:%S))"
    sleep 120
  done
}

step() {
  [ -f /tmp/stop_queue17 ] && echo "QUEUE17 STOPPED before: $1" && exit 0
  past_hard_deadline && echo "QUEUE17 hard deadline passed; skipping: $1" \
    && return 1
  echo "QUEUE17 STEP: $1 ($(date +%H:%M:%S))"
}

run_training() {
  local marker="$1" log="$2" tries="$3"; shift 3
  for attempt in $(seq 1 "$tries"); do
    [ -f /tmp/stop_queue17 ] && echo "QUEUE17 STOPPED (training retry)" && return 1
    "$@" >> "$log" 2>&1
    grep -q "$marker" "$log" && return 0
    echo "  attempt $attempt died without $marker ($(date +%H:%M:%S)); re-probing relay"
    sleep 90
    wait_for_relay
  done
  echo "  GAVE UP after $tries attempts: $*"
  return 1
}

echo "QUEUE17 waiting for queue16 to finish ($(date +%H:%M:%S))"
until [ -f /tmp/r4_queue16.done ]; do
  [ -f /tmp/stop_queue17 ] && echo "QUEUE17 STOPPED while waiting" && exit 0
  past_hard_deadline && echo "QUEUE17 deadline passed while waiting" && exit 0
  if [ -f /tmp/queue16.pid ] && ! kill -0 "$(cat /tmp/queue16.pid)" 2>/dev/null; then
    echo "QUEUE17: queue16 process gone without done marker; proceeding"
    break
  fi
  sleep 120
done
wait_for_relay

# ---- 1. backbone sweep re-earn ----
if step "backbone sweep re-earn (MobileNet, DarkNet19 @25ep)"; then
  for bb in MobileNet DarkNet19; do
    [ -f /tmp/stop_queue17 ] && echo "QUEUE17 STOPPED at sweep:$bb" && exit 0
    past_hard_deadline && echo "QUEUE17 hard deadline; stopping sweep" && break
    echo "QUEUE17 sweep $bb ($(date +%H:%M:%S))"
    run_training DATASET_A_RESULT /tmp/r4_sweep2_$bb.log 2 \
      env SPNET_LOGDIR=logs/r4_sweep_$bb \
      python -u scripts/dataset_a_run.py 25 32 1e-4 40960 bfloat16 331 $bb
  done
fi
if step "NASNetMobile completed row at lr 4e-5"; then
  sleep 20; wait_for_relay
  run_training DATASET_A_RESULT /tmp/r4_sweep2_NASNet_lr4e5.log 2 \
    env SPNET_LOGDIR=logs/r4_sweep_NASNet_lr4e5 \
    python -u scripts/dataset_a_run.py 25 32 4e-5 40960 bfloat16 331 NASNetMobile
fi

# ---- 2. refgen-384 long run + TTA (the §2g beat on the reference's own frames) ----
echo "QUEUE17 waiting for refgen-384 datagen ($(date +%H:%M:%S))"
until grep -q "REFGEN_DONE" /tmp/refgen384.log 2>/dev/null; do
  [ -f /tmp/stop_queue17 ] && echo "QUEUE17 STOPPED waiting for datagen" && exit 0
  past_hard_deadline && echo "QUEUE17 deadline waiting for datagen" && break
  if [ -f /tmp/refgen384.pid ] && ! kill -0 "$(cat /tmp/refgen384.pid)" 2>/dev/null; then
    echo "QUEUE17: datagen process died; checking shards anyway"
    break
  fi
  sleep 120
done
if ls logs/refgen_cache/refgen_s0_i384_*.npz >/dev/null 2>&1; then
  if step "refgen-384 LONG 150ep mixed run"; then
    sleep 20; wait_for_relay
    run_training REFGEN_RESULT /tmp/r4_refgen384.log 6 \
      env SPNET_BACKBONE_DTYPE=bfloat16 SPNET_CKPT=logs/r4_refgen384_ckpt \
      SPNET_LOGDIR=logs/r4_refgen384 \
      python -u scripts/refgen_run.py 150 16 4e-5 float32 384
    tail -3 /tmp/r4_refgen384.log
  fi
  if [ -d logs/r4_refgen384_ckpt ] && step "TTA eval of refgen-384 ckpt (refgen val)"; then
    sleep 20; wait_for_relay
    run_training EVAL_TTA_RESULT /tmp/r4_tta_refgen384.log 3 \
      python -u scripts/eval_tta.py logs/r4_refgen384_ckpt refgen
    grep -E "plain:|tta:" /tmp/r4_tta_refgen384.log | tail -2
  fi
else
  echo "QUEUE17: no refgen-384 shards; skipping the refgen long run"
fi

# ---- 3. native-resolution 30,720-frame run + TTA ----
if step "native-res (size=0) 150ep mixed run @ 30720 frames (6.04 GB)"; then
  sleep 20; wait_for_relay
  run_training DATASET_A_RESULT /tmp/r4_native30k.log 4 \
    env SPNET_BACKBONE_DTYPE=bfloat16 SPNET_NVAL=4992 \
    SPNET_CKPT=logs/r4_native30k_ckpt SPNET_LOGDIR=logs/r4_native30k \
    python -u scripts/dataset_a_run.py 150 16 4e-5 30720 float32 0
  tail -3 /tmp/r4_native30k.log
fi
if [ -d logs/r4_native30k_ckpt ] && step "TTA eval of the native-res ckpt"; then
  sleep 20; wait_for_relay
  run_training EVAL_TTA_RESULT /tmp/r4_tta_native.log 3 \
    python -u scripts/eval_tta.py logs/r4_native30k_ckpt synth
  grep -E "plain:|tta:" /tmp/r4_tta_native.log | tail -2
fi

echo "QUEUE17 DONE ($(date +%H:%M:%S))" | tee /tmp/r4_queue17.done
