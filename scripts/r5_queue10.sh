#!/bin/bash
# Round-5 queue, part 10 (session 15).  Session 14's queue9 landed the
# keras-h5 file-import proof but its window gates (train-end 05:52)
# were sized to the PREVIOUS session and skipped the native run; this
# session runs until ~07:05, so the ledger is re-gated to the real
# window, device free by ~06:55 for the driver's end-of-round bench:
#   1. full-scale native-res (input_size=0) run, EPOCHS computed from
#      the remaining window at launch (datagen ~22 min + compile ~7 min
#      + ~70 s/epoch at the proven 667 img/s) — the VERDICT #2
#      "never completed at scale" closer
#   2. movie .bmp predict over 512 frames on the fresh native ckpt
#      (VERDICT #6, b=256 at native res)
#   3. flip-TTA on the native checkpoint if >=12 min margin remains
# Touch /tmp/stop_queue_r5j to stop between steps.
cd /root/repo
DEADLINE_EPOCH=$(date -d 'today 06:55' +%s)
TRAIN_END_EPOCH=$(date -d 'today 06:33' +%s)
past_deadline() { [ "$(date +%s)" -gt "$DEADLINE_EPOCH" ]; }
fits() { [ "$(( $(date +%s) + $1 * 60 ))" -lt "$DEADLINE_EPOCH" ]; }

probe_ok() {
  rm -f /tmp/probe_r5j.log
  setsid bash -c 'echo $$ > /tmp/probe_r5j.pid; exec python -u -c "
import jax, jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum())
print(\"TPU PROBE OK\", float(f(jnp.ones((256, 256)))), flush=True)
" > /tmp/probe_r5j.log 2>&1' &
  for i in $(seq 1 48); do
    sleep 5
    grep -q "TPU PROBE OK" /tmp/probe_r5j.log 2>/dev/null && return 0
  done
  kill "$(cat /tmp/probe_r5j.pid)" 2>/dev/null
  sleep 90
  return 1
}
wait_for_relay() {
  until probe_ok; do
    [ -f /tmp/stop_queue_r5j ] && echo "QUEUE_R5J STOPPED" && exit 0
    past_deadline && echo "QUEUE_R5J deadline while device busy" && exit 0
    echo "  device still busy/down ($(date +%H:%M:%S))"
    sleep 60
  done
}

archive() {
  mkdir -p docs/run_logs
  for f in r5_nativefull3 r5_movie r5_tta_native; do
    [ -f /tmp/$f.log ] && grep -v "^WARNING" /tmp/$f.log | tail -400 \
      > docs/run_logs/${f}.log
  done
}

step() {
  [ -f /tmp/stop_queue_r5j ] && echo "QUEUE_R5J STOPPED before: $1" && exit 0
  fits "$2" || { echo "QUEUE_R5J: no margin for: $1"; return 1; }
  wait_for_relay
  echo "QUEUE_R5J STEP: $1 ($(date +%H:%M:%S))"
  return 0
}

echo "QUEUE_R5J start $(date +%H:%M:%S)"
wait_for_relay

# ---- 1. native-res full-scale run, epochs sized to the window -------
if step "native-res full-scale (window-sized epochs)" 45; then
  AVAIL=$(( TRAIN_END_EPOCH - $(date +%s) ))
  EPOCHS=$(( (AVAIL - 1750) / 70 ))
  [ "$EPOCHS" -gt 90 ] && EPOCHS=90
  if [ "$EPOCHS" -ge 15 ]; then
    echo "  native run: $EPOCHS epochs (avail ${AVAIL}s)"
    for attempt in 1 2; do
      setsid bash -c "echo \$\$ > /tmp/r5_native.pid;
        exec env SPNET_BACKBONE_DTYPE=bfloat16 SPNET_MAX_SCAN_STEPS=512 \
          SPNET_CKPT=logs/r5_native_ck SPNET_LOGDIR=logs/r5_native \
          python -u scripts/dataset_a_run.py $EPOCHS 16 4e-5 40960 \
          float32 0" >> /tmp/r5_nativefull3.log 2>&1
      archive
      grep -q DATASET_A_RESULT /tmp/r5_nativefull3.log && break
      echo "  native attempt $attempt died ($(date +%H:%M:%S))"
      # resume retry only if the window still covers compile + >=10 ep
      step "native-res resume (attempt $((attempt+1)))" 20 || break
    done
  else
    echo "  no window for a native run (avail ${AVAIL}s)"
  fi
fi

# ---- 2. movie .bmp predict on the native checkpoint (VERDICT #6) ----
if step "movie predict (512 bmp frames, b=256)" 9; then
  setsid bash -c 'echo $$ > /tmp/r5_movie.pid;
    exec python -u scripts/movie_predict.py 512 256' \
    > /tmp/r5_movie.log 2>&1
  grep -q MOVIE_RESULT /tmp/r5_movie.log \
    && echo "  movie OK" || echo "  movie FAILED (see log)"
  archive
fi

# ---- 3. flip-TTA on the native checkpoint (margin permitting) -------
if step "flip-TTA on native ckpt" 12; then
  setsid bash -c 'echo $$ > /tmp/r5_tta_native.pid;
    exec python -u scripts/eval_tta.py logs/r5_native_ck' \
    > /tmp/r5_tta_native.log 2>&1
  archive
fi

archive
echo "QUEUE_R5J DONE $(date +%H:%M:%S)"
