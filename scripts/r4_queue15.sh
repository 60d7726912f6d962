#!/bin/bash
# Round-4 TPU queue, part 15: the big-run relayout experiment, after
# queue14 drains.  queue14's full-scale native-resolution confirm
# crashed the worker twice with the chunked put in place, so the
# surviving suspect is the input RELAYOUT copy at epoch-program binding
# (2 x 8.15 GB transient > 16 GB HBM).  This queue:
#   1. probe_biglayout 8.15 — compiled-vs-delivered layout + the
#      default-layout run (theory predicts a crash) + the pinned run
#      (theory predicts a pass)
#   2. if the pinned run passes: 2-epoch full-scale big confirm with
#      SPNET_PIN_X_LAYOUT=1 (datagen cache already hot from queue14)
# Deadlines in epoch seconds (this queue runs past midnight).
cd /root/repo
DEADLINE=$(date -d 'tomorrow 01:30' +%s)
[ "$(date +%H)" -lt 14 ] && DEADLINE=$(date -d 'today 01:30' +%s)

past_deadline() { [ "$(date +%s)" -gt "$DEADLINE" ]; }

probe_ok() {
  rm -f /tmp/probe15.log
  setsid bash -c 'echo $$ > /tmp/probe15.pid; exec python -u -c "
import jax, jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum())
print(\"TPU PROBE OK\", float(f(jnp.ones((256, 256)))), flush=True)
" > /tmp/probe15.log 2>&1' &
  for i in $(seq 1 60); do
    sleep 5
    grep -q "TPU PROBE OK" /tmp/probe15.log 2>/dev/null && return 0
  done
  kill "$(cat /tmp/probe15.pid)" 2>/dev/null
  sleep 90
  return 1
}

wait_for_relay() {
  until probe_ok; do
    [ -f /tmp/stop_queue15 ] && echo "QUEUE15 STOPPED while waiting" && exit 0
    past_deadline && echo "QUEUE15 deadline while relay down" && exit 0
    echo "  relay still down ($(date +%H:%M:%S))"
    sleep 120
  done
}

echo "QUEUE15 waiting for queue14 to finish ($(date +%H:%M:%S))"
until [ -f /tmp/r4_queue14.done ]; do
  [ -f /tmp/stop_queue15 ] && echo "QUEUE15 STOPPED while waiting" && exit 0
  past_deadline && echo "QUEUE15 deadline passed while waiting" && exit 0
  if [ -f /tmp/queue14.pid ] && ! kill -0 "$(cat /tmp/queue14.pid)" 2>/dev/null; then
    echo "QUEUE15: queue14 process gone without done marker; proceeding"
    break
  fi
  sleep 120
done

# ---- 1. the relayout probe ----
past_deadline && echo "QUEUE15 deadline; skipping probe" && exit 0
wait_for_relay
echo "QUEUE15 STEP: probe_biglayout 8.15 GB ($(date +%H:%M:%S))"
python -u scripts/probe_biglayout.py 8.15 > /tmp/r4_biglayout.log 2>&1
if ! grep -q BIGLAYOUT_PINNED_OK /tmp/r4_biglayout.log; then
  if grep -q BIGLAYOUT_DEFAULT_OK /tmp/r4_biglayout.log; then
    # default survived but pinned crashed?! record and stop
    echo "QUEUE15: default OK but pinned missing — see log"
    exit 0
  fi
  # default-layout run crashed the worker (theory half-confirmed);
  # retry skipping straight to the pinned stage
  echo "QUEUE15: default-layout stage crashed; retrying pinned-only"
  sleep 90
  wait_for_relay
  SPNET_PROBE_SKIP_DEFAULT=1 python -u scripts/probe_biglayout.py 8.15 \
    >> /tmp/r4_biglayout.log 2>&1
fi
grep -E "LAYOUT_INFO|BIGLAYOUT" /tmp/r4_biglayout.log

# ---- 2. pinned full-scale 2-epoch big confirm ----
if grep -q BIGLAYOUT_PINNED_OK /tmp/r4_biglayout.log && ! past_deadline; then
  sleep 30
  wait_for_relay
  echo "QUEUE15 STEP: pinned 2-epoch big confirm ($(date +%H:%M:%S))"
  env SPNET_PIN_X_LAYOUT=1 SPNET_BACKBONE_DTYPE=bfloat16 SPNET_NVAL=512 \
    SPNET_LOGDIR=logs/r4_big_pinned_confirm \
    python -u scripts/dataset_a_run.py 2 16 4e-5 40960 float32 0 \
    > /tmp/r4_big_pinned.log 2>&1
  grep -q DATASET_A_RESULT /tmp/r4_big_pinned.log \
    && echo "QUEUE15: PINNED BIG CONFIRM PASSED" \
    || echo "QUEUE15: pinned big confirm died"
  tail -3 /tmp/r4_big_pinned.log
fi

echo "QUEUE15 DONE ($(date +%H:%M:%S))" | tee /tmp/r4_queue15.done
