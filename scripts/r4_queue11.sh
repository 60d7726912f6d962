#!/bin/bash
# Round-4 TPU queue, part 11 (session 4).  Takes over from queue10
# (stopped after its DarkNet19 sweep step) and re-prioritizes the
# remaining round-4 work around the accuracy headline:
#   1. big-run crash bisect                (scripts/debug_big.sh)
#   2. full-scale 2-epoch confirm of the chosen fix (no ckpt pollution)
#   3. LONG accuracy run, 150 ep with ckpt+auto-resume:
#        big 512x384 if the bisect yields a usable fix, else 384 rerun
#      (mixed f32-stem/bf16-backbone — accuracy-equal per VALIDATION
#       §2e, lighter and faster)
#   4. TTA eval of the long-run checkpoint (the beat-96.5 attempt)
#   5. dataset-D arms (on-the-fly geo-augment vs offline 42x inflation)
#   6. backbone sweep remainder: InceptionResNetV2, NASNetMobile
#   7. scan-unroll A/B + XLA scheduling-flag sweep
#   8. HIGH (bf16x3) matmul-precision 331 100ep — only before HIGH gate
# Gates: no new LONG step after ${QUEUE11_HARD_DEADLINE:-16:30}; HIGH
# only before ${QUEUE11_HIGH_DEADLINE:-14:00}.  Touch /tmp/stop_queue11
# to stop between steps.
cd /root/repo
HIGH_DEADLINE="${QUEUE11_HIGH_DEADLINE:-14:00}"
HARD_DEADLINE="${QUEUE11_HARD_DEADLINE:-16:30}"

probe_ok() {
  rm -f /tmp/probe11.log
  setsid bash -c 'echo $$ > /tmp/probe11.pid; exec python -u -c "
import jax, jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum())
print(\"TPU PROBE OK\", float(f(jnp.ones((256, 256)))), flush=True)
" > /tmp/probe11.log 2>&1' &
  for i in $(seq 1 60); do
    sleep 5
    grep -q "TPU PROBE OK" /tmp/probe11.log 2>/dev/null && return 0
  done
  kill "$(cat /tmp/probe11.pid)" 2>/dev/null
  sleep 90
  return 1
}

wait_for_relay() {
  until probe_ok; do
    [ -f /tmp/stop_queue11 ] && echo "QUEUE11 STOPPED while waiting" && exit 0
    echo "  relay still down ($(date +%H:%M:%S))"
    sleep 120
  done
}

past_hard_deadline() {
  [[ "$(date +%H:%M)" > "$HARD_DEADLINE" ]]
}

step() {
  [ -f /tmp/stop_queue11 ] && echo "QUEUE11 STOPPED before: $1" && exit 0
  past_hard_deadline && echo "QUEUE11 hard deadline passed; skipping: $1" \
    && return 1
  echo "QUEUE11 STEP: $1 ($(date +%H:%M:%S))"
}

run_training() {
  local marker="$1" log="$2"; shift 2
  for attempt in 1 2 3 4; do
    [ -f /tmp/stop_queue11 ] && echo "QUEUE11 STOPPED (training retry)" && return 1
    "$@" >> "$log" 2>&1
    grep -q "$marker" "$log" && return 0
    echo "  attempt $attempt died without $marker ($(date +%H:%M:%S)); re-probing relay"
    sleep 90
    wait_for_relay
  done
  echo "  GAVE UP after 4 attempts: $*"
  return 1
}

# wait for queue10 to release the device
Q10PID="$(cat /tmp/queue10.pid 2>/dev/null)"
while [ -n "$Q10PID" ] && kill -0 "$Q10PID" 2>/dev/null; do
  echo "QUEUE11 waiting for queue10 (pid $Q10PID) to exit ($(date +%H:%M:%S))"
  sleep 60
done

echo "QUEUE11 waiting for relay ($(date +%H:%M:%S))"
wait_for_relay
echo "QUEUE11 relay is up ($(date +%H:%M:%S))"

# ---- 1. bisect ----
if step "big-run crash bisect"; then
  bash scripts/debug_big.sh >> /tmp/r4_bigdebug_main.log 2>&1
fi
VERDICT="$(cat /tmp/r4_bigdebug.verdict 2>/dev/null || echo NONE)"
echo "QUEUE11 bisect verdict: $VERDICT"

# choose the long-run configuration
LONG_SIZE=384
LONG_ENVS=(SPNET_BACKBONE_DTYPE=bfloat16)
case "$VERDICT" in
  PASS)          LONG_SIZE=0; LONG_ENVS=(SPNET_BACKBONE_DTYPE=bfloat16) ;;
  MEM)           LONG_SIZE=0; LONG_ENVS=(SPNET_BACKBONE_DTYPE=bfloat16) ;;
  REMAT)         LONG_SIZE=0; LONG_ENVS=(SPNET_REMAT=0 SPNET_BACKBONE_DTYPE=bfloat16) ;;
  DTYPE_MIXED_OK) LONG_SIZE=0; LONG_ENVS=(SPNET_BACKBONE_DTYPE=bfloat16) ;;
  *)             LONG_SIZE=384 ;;  # AUGMENT/DTYPE/SHAPE512/ENV/... -> 384
esac
echo "QUEUE11 long run: input_size=$LONG_SIZE envs=${LONG_ENVS[*]}"

# ---- 2. full-scale 2-epoch confirm (separate logdir, NO ckpt dir so the
#         2-epoch 1-cycle schedule never contaminates the long run) ----
LONG_OK=0
if step "full-scale 2-epoch confirm (size=$LONG_SIZE)"; then
  if run_training DATASET_A_RESULT /tmp/r4_long_confirm.log \
      env "${LONG_ENVS[@]}" SPNET_NVAL=512 \
      SPNET_LOGDIR=logs/r4_long_confirm \
      python -u scripts/dataset_a_run.py 2 16 4e-5 40960 float32 $LONG_SIZE
  then LONG_OK=1
  elif [ "$LONG_SIZE" = "0" ]; then
    echo "QUEUE11 big confirm failed; falling back to 384"
    LONG_SIZE=384; LONG_ENVS=(SPNET_BACKBONE_DTYPE=bfloat16)
    if run_training DATASET_A_RESULT /tmp/r4_long_confirm.log \
        env "${LONG_ENVS[@]}" SPNET_NVAL=512 \
        SPNET_LOGDIR=logs/r4_long_confirm \
        python -u scripts/dataset_a_run.py 2 16 4e-5 40960 float32 384
    then LONG_OK=1; fi
  fi
fi

# ---- 3. the long accuracy run ----
if [ "$LONG_OK" = "1" ] && step "LONG 150ep accuracy run (size=$LONG_SIZE, mixed)"; then
  run_training DATASET_A_RESULT /tmp/r4_long.log \
    env "${LONG_ENVS[@]}" SPNET_CKPT=logs/r4_long_ckpt \
    SPNET_LOGDIR=logs/r4_long \
    python -u scripts/dataset_a_run.py 150 16 4e-5 40960 float32 $LONG_SIZE
fi

# ---- 4. TTA ensemble eval of the long-run checkpoint ----
if [ -d logs/r4_long_ckpt ] && step "TTA eval of the long-run checkpoint"; then
  python -u scripts/eval_tta.py logs/r4_long_ckpt synth \
    > /tmp/r4_tta_long.log 2>&1
  grep -q EVAL_TTA_RESULT /tmp/r4_tta_long.log \
    || { sleep 90; wait_for_relay; \
         python -u scripts/eval_tta.py logs/r4_long_ckpt synth \
           >> /tmp/r4_tta_long.log 2>&1; }
fi

# ---- 5. dataset-D arms ----
if step "dataset-D arms (geo-augment vs offline inflation)"; then
  if [ -f logs/dataset_d_data/inflate_done.json ]; then
    run_training DATASET_D_RESULT /tmp/r4_datasetd.log \
      python -u scripts/dataset_d_run.py 1280 12
  else
    echo "QUEUE11: inflation marker missing; skipping dataset-D"
  fi
fi

# ---- 6. backbone sweep remainder ----
if step "backbone sweep remainder (IRv2, NASNetMobile)"; then
  for bb in InceptionResNetV2 NASNetMobile; do
    [ -f /tmp/stop_queue11 ] && echo "QUEUE11 STOPPED at sweep:$bb" && exit 0
    past_hard_deadline && echo "QUEUE11 hard deadline; stopping sweep" && break
    echo "QUEUE11 sweep $bb ($(date +%H:%M:%S))"
    run_training DATASET_A_RESULT /tmp/r4_sweep_$bb.log \
      env SPNET_LOGDIR=logs/r4_sweep_$bb \
      python -u scripts/dataset_a_run.py 25 32 1e-4 40960 bfloat16 331 $bb
  done
fi

# ---- 7. cheap single-chip perf sweeps ----
if step "scan-unroll A/B on the production bench"; then
  for u in 1 2 4; do
    echo "--- unroll=$u ---" >> /tmp/r4_unroll_ab.log
    SPNET_SCAN_UNROLL=$u python -u bench.py 2>&1 | tail -1 \
      >> /tmp/r4_unroll_ab.log
  done
fi

if step "XLA scheduling-flag sweep"; then
  python -u scripts/xla_flags_sweep.py > /tmp/r4_xla_sweep.log 2>&1
fi

# ---- 8. HIGH-precision retry, gated ----
now=$(date +%H:%M)
if [[ "$now" < "$HIGH_DEADLINE" ]]; then
  if step "precision retry: 331 f32 + HIGH (bf16x3) 100ep"; then
    run_training DATASET_A_RESULT /tmp/r4_prec2.log \
      env SPNET_CKPT=logs/r4_prec_ckpt SPNET_LOGDIR=logs/r4_prec \
      SPNET_MATMUL_PRECISION=high \
      python -u scripts/dataset_a_run.py 100 16 4e-5 40960 float32 331
  fi
else
  echo "QUEUE11: past HIGH deadline ($now >= $HIGH_DEADLINE); skipping HIGH retry"
fi

echo "QUEUE11 DONE ($(date +%H:%M:%S))" | tee /tmp/r4_queue11.done
