#!/bin/bash
# Round-4 TPU queue, part 20 (session 8) — runs after the in-session
# dataset-D matched-cadence arm (launched directly, /tmp/datasetd3.pid)
# drains.  Steps:
#   1. refgen-384 long run: 150 ep, exact recipe, mixed split
#      (f32 stem+head / bf16 backbone), on 45,952 frames drawn by the
#      reference's OWN cv2 pipeline at input_size 384 — the §2g TTA
#      beat re-proven on the reference's own data.  Gated on the
#      host-side 384 datagen (REFGEN_DONE in /tmp/refgen384.log).
#      save_every=10 + auto-resume: a deadline-truncated run resumes
#      from logs/refgen384_ck next session.
#   2. flip-TTA eval of that checkpoint on the refgen val split.
#   3. Opportunistic: probe_bigprog quadrant grid (8.15 GB real
#      train-step epoch program at increasing scan length) — the
#      full-scale native-resolution crash bisect.
# Touch /tmp/stop_queue20 to stop between steps.  Deadline-gated: no
# new step starts that could overrun the morning bench window.
cd /root/repo
DEADLINE_EPOCH=$(date -d 'tomorrow 06:45' +%s)
[ "$(date +%H)" -lt 14 ] && DEADLINE_EPOCH=$(date -d 'today 06:45' +%s)
past_deadline() { [ "$(date +%s)" -gt "$DEADLINE_EPOCH" ]; }
# margin-aware gate: don't START a step whose expected minutes would
# blow past the deadline (never kill a TPU run mid-flight)
fits() { [ "$(( $(date +%s) + $1 * 60 ))" -lt "$DEADLINE_EPOCH" ]; }

probe_ok() {
  rm -f /tmp/probe20.log
  setsid bash -c 'echo $$ > /tmp/probe20.pid; exec python -u -c "
import jax, jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum())
print(\"TPU PROBE OK\", float(f(jnp.ones((256, 256)))), flush=True)
" > /tmp/probe20.log 2>&1' &
  for i in $(seq 1 60); do
    sleep 5
    grep -q "TPU PROBE OK" /tmp/probe20.log 2>/dev/null && return 0
  done
  kill "$(cat /tmp/probe20.pid)" 2>/dev/null
  sleep 90
  return 1
}

wait_for_relay() {
  until probe_ok; do
    [ -f /tmp/stop_queue20 ] && echo "QUEUE20 STOPPED while waiting" && exit 0
    past_deadline && echo "QUEUE20 deadline while relay down" && exit 0
    echo "  relay still down ($(date +%H:%M:%S))"
    sleep 120
  done
}

echo "QUEUE20 waiting for the dataset-D arm ($(date +%H:%M:%S))"
# gate on the PID first: /tmp/r4_datasetd3.log may be a stale file from
# an earlier launch that already contains DATASET_D_RESULT, which would
# release this gate while the fresh arm still holds the TPU.
while true; do
  if [ -f /tmp/datasetd3.pid ]; then
    kill -0 "$(cat /tmp/datasetd3.pid)" 2>/dev/null || break
  else
    grep -q "DATASET_D_RESULT\|Traceback" /tmp/r4_datasetd3.log 2>/dev/null && break
  fi
  [ -f /tmp/stop_queue20 ] && echo "QUEUE20 STOPPED while waiting" && exit 0
  past_deadline && echo "QUEUE20 deadline passed while waiting" && exit 0
  sleep 60
done
sleep 30

echo "QUEUE20 waiting for refgen-384 datagen ($(date +%H:%M:%S))"
until grep -q "REFGEN_DONE" /tmp/refgen384.log 2>/dev/null; do
  if [ -f /tmp/refgen384.pid ] && ! kill -0 "$(cat /tmp/refgen384.pid)" 2>/dev/null; then
    echo "QUEUE20: datagen died; relaunching"
    setsid bash -c 'echo $$ > /tmp/refgen384.pid; exec nice -n 19 python -u scripts/refgen_dataset.py 45952 384 >> /tmp/refgen384.log 2>&1' &
  fi
  [ -f /tmp/stop_queue20 ] && echo "QUEUE20 STOPPED while waiting" && exit 0
  past_deadline && echo "QUEUE20 deadline passed waiting for datagen" && exit 0
  sleep 60
done
wait_for_relay

# step 1: refgen-384 mixed long run.  150 ep needs ~115 min train +
# ~15 min stage/compile; if the margin is short, fall back to 100 ep
# (~80 min train) — the §2g TTA margin (+0.45 ring-acc over single
# sweep) still has beat headroom from a 100-ep checkpoint.
# reserve the TTA step's ~15 min inside the gate: a 150-ep run that
# would push TTA past the deadline is worth less than 100 ep + TTA
EPOCHS=""
if fits 155; then EPOCHS=150; elif fits 115; then EPOCHS=100; fi
if [ ! -f /tmp/stop_queue20 ] && [ -n "$EPOCHS" ]; then
  echo "QUEUE20 STEP: refgen-384 mixed ${EPOCHS}ep ($(date +%H:%M:%S))"
  for attempt in 1 2; do
    # re-check the margin before EVERY attempt (the run resumes from
    # save_every=10 checkpoints, so a retry needs far less than a full
    # run — but near the deadline even that can overrun the 06:45 gate
    # and block the driver's morning bench); recompute EPOCHS downward
    # if the 150-ep margin is gone.
    if ! fits 115; then echo "  no margin for attempt $attempt"; break; fi
    fits 155 || EPOCHS=100
    SPNET_BACKBONE_DTYPE=bfloat16 SPNET_CKPT=logs/refgen384_ck \
      SPNET_LOGDIR=logs/refgen384_mixed \
      python -u scripts/refgen_run.py $EPOCHS 16 4e-5 float32 384 \
      >> /tmp/r4_refgen384.log 2>&1
    grep -q "REFGEN_RESULT" /tmp/r4_refgen384.log && break
    echo "  attempt $attempt died ($(date +%H:%M:%S)); re-probing relay"
    sleep 90
    wait_for_relay
  done
  grep -o 'REFGEN_RESULT.*' /tmp/r4_refgen384.log | tail -1 | head -c 400
else
  echo "QUEUE20: skipping refgen-384 run (deadline margin or stop)"
fi

# step 2: TTA on the refgen checkpoint (~10 min)
if grep -q "REFGEN_RESULT" /tmp/r4_refgen384.log 2>/dev/null \
    && [ ! -f /tmp/stop_queue20 ] && fits 15; then
  wait_for_relay
  echo "QUEUE20 STEP: flip-TTA on refgen-384 ckpt ($(date +%H:%M:%S))"
  python -u scripts/eval_tta.py logs/refgen384_ck refgen \
    >> /tmp/r4_refgen384_tta.log 2>&1
  grep -o 'EVAL_TTA_RESULT.*' /tmp/r4_refgen384_tta.log | tail -1 | head -c 400
fi

# step 3: opportunistic bigprog quadrant grid
for steps in 4 512 2560; do
  [ -f /tmp/stop_queue20 ] && break
  fits 20 || { echo "QUEUE20: no margin for bigprog steps=$steps"; break; }
  wait_for_relay
  echo "QUEUE20 STEP: probe_bigprog 8.15 GB steps=$steps ($(date +%H:%M:%S))"
  python -u scripts/probe_bigprog.py 8.15 $steps >> /tmp/r4_bigprog.log 2>&1
  if ! grep -q "BIGPROG_OK 8.15 $steps" /tmp/r4_bigprog.log; then
    echo "QUEUE20: CRASH at steps=$steps (quadrant pinned)" | tee -a /tmp/r4_bigprog.log
    sleep 120
    break
  fi
  echo "  BIGPROG_OK at steps=$steps"
  sleep 20
done

echo "QUEUE20 DONE ($(date +%H:%M:%S))" | tee /tmp/r4_queue20.done
