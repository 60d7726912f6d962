#!/bin/bash
# Round-4 TPU queue, part 14 (session 6, after container wipe #5 took
# queue12 mid-flight and every cache/checkpoint — again).  The chunked
# device_put fix is already hardware-validated (VALIDATION §1, commit
# f92a9ea), so the probe step is dropped; otherwise the priorities are
# queue12's remainder:
#   1. full-scale 2-epoch big confirm  (input_size=0, mixed precision)
#   2. LONG accuracy run, 150 ep ckpt+auto-resume:
#        big 512x384 if confirm passes, else 384 rerun
#      (mixed f32-stem/bf16-backbone — accuracy-equal per VALIDATION §2e)
#   3. TTA eval of the long-run checkpoint (the beat-96.5 attempt)
#   4. dataset-D arms (gated on the CPU-side prep's inflate_done.json)
#   5. backbone sweep remainder: InceptionResNetV2, NASNetMobile,
#      Xception@25ep (the queue13 row — makes §2f apples-to-apples)
#   6. scan-unroll A/B + XLA scheduling-flag sweep
#   7. HIGH (bf16x3) matmul-precision 331 100ep — only before HIGH gate
# Gates: no new LONG step after ${QUEUE14_HARD_DEADLINE:-23:45}; HIGH
# only before ${QUEUE14_HIGH_DEADLINE:-22:00}.  (Deadlines must stay
# before midnight — the HH:MM string compare wraps.)  Touch
# /tmp/stop_queue14 to stop between steps.
cd /root/repo
HIGH_DEADLINE="${QUEUE14_HIGH_DEADLINE:-22:00}"
HARD_DEADLINE="${QUEUE14_HARD_DEADLINE:-23:45}"

probe_ok() {
  rm -f /tmp/probe14.log
  setsid bash -c 'echo $$ > /tmp/probe14.pid; exec python -u -c "
import jax, jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum())
print(\"TPU PROBE OK\", float(f(jnp.ones((256, 256)))), flush=True)
" > /tmp/probe14.log 2>&1' &
  for i in $(seq 1 60); do
    sleep 5
    grep -q "TPU PROBE OK" /tmp/probe14.log 2>/dev/null && return 0
  done
  kill "$(cat /tmp/probe14.pid)" 2>/dev/null
  sleep 90
  return 1
}

wait_for_relay() {
  until probe_ok; do
    [ -f /tmp/stop_queue14 ] && echo "QUEUE14 STOPPED while waiting" && exit 0
    echo "  relay still down ($(date +%H:%M:%S))"
    sleep 120
  done
}

past_hard_deadline() {
  [[ "$(date +%H:%M)" > "$HARD_DEADLINE" ]]
}

step() {
  [ -f /tmp/stop_queue14 ] && echo "QUEUE14 STOPPED before: $1" && exit 0
  past_hard_deadline && echo "QUEUE14 hard deadline passed; skipping: $1" \
    && return 1
  echo "QUEUE14 STEP: $1 ($(date +%H:%M:%S))"
}

run_training() {
  local marker="$1" log="$2" tries="$3"; shift 3
  for attempt in $(seq 1 "$tries"); do
    [ -f /tmp/stop_queue14 ] && echo "QUEUE14 STOPPED (training retry)" && return 1
    "$@" >> "$log" 2>&1
    grep -q "$marker" "$log" && return 0
    echo "  attempt $attempt died without $marker ($(date +%H:%M:%S)); re-probing relay"
    sleep 90
    wait_for_relay
  done
  echo "  GAVE UP after $tries attempts: $*"
  return 1
}

echo "QUEUE14 waiting for relay ($(date +%H:%M:%S))"
wait_for_relay
echo "QUEUE14 relay is up ($(date +%H:%M:%S))"

# ---- 1. full-scale 2-epoch big confirm (separate logdir, NO ckpt dir so
#         the 2-epoch 1-cycle schedule never contaminates the long run) ----
LONG_SIZE=0
LONG_OK=0
if step "full-scale 2-epoch confirm (size=$LONG_SIZE)"; then
  if run_training DATASET_A_RESULT /tmp/r4_long_confirm.log 2 \
      env SPNET_BACKBONE_DTYPE=bfloat16 SPNET_NVAL=512 \
      SPNET_LOGDIR=logs/r4_long_confirm \
      python -u scripts/dataset_a_run.py 2 16 4e-5 40960 float32 $LONG_SIZE
  then LONG_OK=1
  else
    echo "QUEUE14 big confirm failed; falling back to 384"
    LONG_SIZE=384
    if run_training DATASET_A_RESULT /tmp/r4_long_confirm.log 2 \
        env SPNET_BACKBONE_DTYPE=bfloat16 SPNET_NVAL=512 \
        SPNET_LOGDIR=logs/r4_long_confirm \
        python -u scripts/dataset_a_run.py 2 16 4e-5 40960 float32 384
    then LONG_OK=1; fi
  fi
fi
echo "QUEUE14 long run: input_size=$LONG_SIZE LONG_OK=$LONG_OK"

# ---- 2. the long accuracy run (retries resume from checkpoint) ----
if [ "$LONG_OK" = "1" ] && step "LONG 150ep accuracy run (size=$LONG_SIZE, mixed)"; then
  run_training DATASET_A_RESULT /tmp/r4_long.log 6 \
    env SPNET_BACKBONE_DTYPE=bfloat16 SPNET_CKPT=logs/r4_long_ckpt \
    SPNET_LOGDIR=logs/r4_long \
    python -u scripts/dataset_a_run.py 150 16 4e-5 40960 float32 $LONG_SIZE
fi

# ---- 3. TTA ensemble eval of the long-run checkpoint ----
if [ -d logs/r4_long_ckpt ] && step "TTA eval of the long-run checkpoint"; then
  python -u scripts/eval_tta.py logs/r4_long_ckpt synth \
    > /tmp/r4_tta_long.log 2>&1
  grep -q EVAL_TTA_RESULT /tmp/r4_tta_long.log \
    || { sleep 90; wait_for_relay; \
         python -u scripts/eval_tta.py logs/r4_long_ckpt synth \
           >> /tmp/r4_tta_long.log 2>&1; }
fi

# ---- 4. dataset-D arms ----
if step "dataset-D arms (geo-augment vs offline inflation)"; then
  for i in $(seq 1 30); do
    [ -f logs/dataset_d_data/inflate_done.json ] && break
    echo "QUEUE14 waiting for dataset-D CPU prep ($(date +%H:%M:%S))"
    sleep 60
  done
  if [ -f logs/dataset_d_data/inflate_done.json ]; then
    run_training DATASET_D_RESULT /tmp/r4_datasetd.log 2 \
      python -u scripts/dataset_d_run.py 1280 12
  else
    echo "QUEUE14: inflation marker missing; skipping dataset-D"
  fi
fi

# ---- 5. backbone sweep remainder ----
if step "backbone sweep remainder (IRv2, NASNetMobile, Xception@25ep)"; then
  for bb in InceptionResNetV2 NASNetMobile Xception; do
    [ -f /tmp/stop_queue14 ] && echo "QUEUE14 STOPPED at sweep:$bb" && exit 0
    past_hard_deadline && echo "QUEUE14 hard deadline; stopping sweep" && break
    echo "QUEUE14 sweep $bb ($(date +%H:%M:%S))"
    run_training DATASET_A_RESULT /tmp/r4_sweep_$bb.log 2 \
      env SPNET_LOGDIR=logs/r4_sweep_$bb \
      python -u scripts/dataset_a_run.py 25 32 1e-4 40960 bfloat16 331 $bb
  done
fi

# ---- 6. cheap single-chip perf sweeps ----
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

# ---- 7. HIGH-precision retry, gated ----
now=$(date +%H:%M)
if [[ "$now" < "$HIGH_DEADLINE" ]]; then
  if step "precision retry: 331 f32 + HIGH (bf16x3) 100ep"; then
    run_training DATASET_A_RESULT /tmp/r4_prec2.log 3 \
      env SPNET_CKPT=logs/r4_prec_ckpt SPNET_LOGDIR=logs/r4_prec \
      SPNET_MATMUL_PRECISION=high \
      python -u scripts/dataset_a_run.py 100 16 4e-5 40960 float32 331
  fi
else
  echo "QUEUE14: past HIGH deadline ($now >= $HIGH_DEADLINE); skipping HIGH retry"
fi

echo "QUEUE14 DONE ($(date +%H:%M:%S))" | tee /tmp/r4_queue14.done
