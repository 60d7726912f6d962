#!/bin/bash
# Round-4 TPU queue, part 12 (session 5, after container wipe #4 took
# queue11 and every cache/checkpoint).  Same priorities as queue11, with
# the bisect replaced by its conclusion: session 4 proved tiny-native
# passes with every knob and full-scale crashes before epoch 1 -> the
# 8.05 GB monolithic device_put is the wall, and the shipped fix is
# parallel/mesh.chunked_device_put (now wired into train/loop.py's
# resident path).  So:
#   1. probe_bigput 8.5 GB chunked     (validate the fix in isolation)
#   2. full-scale 2-epoch big confirm  (input_size=0, mixed precision)
#   3. LONG accuracy run, 150 ep ckpt+auto-resume:
#        big 512x384 if confirm passes, else 384 rerun
#      (mixed f32-stem/bf16-backbone — accuracy-equal per VALIDATION §2e)
#   4. TTA eval of the long-run checkpoint (the beat-96.5 attempt)
#   5. dataset-D arms (gated on the CPU-side prep's inflate_done.json)
#   6. backbone sweep remainder: InceptionResNetV2, NASNetMobile
#      (MobileNet 78.77 / DarkNet19 92.84 @25ep recorded from queue10)
#   7. scan-unroll A/B + XLA scheduling-flag sweep
#   8. HIGH (bf16x3) matmul-precision 331 100ep — only before HIGH gate
# Gates: no new LONG step after ${QUEUE12_HARD_DEADLINE:-21:15}; HIGH
# only before ${QUEUE12_HIGH_DEADLINE:-19:30}.  Touch /tmp/stop_queue12
# to stop between steps.
cd /root/repo
HIGH_DEADLINE="${QUEUE12_HIGH_DEADLINE:-19:30}"
HARD_DEADLINE="${QUEUE12_HARD_DEADLINE:-21:15}"

probe_ok() {
  rm -f /tmp/probe12.log
  setsid bash -c 'echo $$ > /tmp/probe12.pid; exec python -u -c "
import jax, jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum())
print(\"TPU PROBE OK\", float(f(jnp.ones((256, 256)))), flush=True)
" > /tmp/probe12.log 2>&1' &
  for i in $(seq 1 60); do
    sleep 5
    grep -q "TPU PROBE OK" /tmp/probe12.log 2>/dev/null && return 0
  done
  kill "$(cat /tmp/probe12.pid)" 2>/dev/null
  sleep 90
  return 1
}

wait_for_relay() {
  until probe_ok; do
    [ -f /tmp/stop_queue12 ] && echo "QUEUE12 STOPPED while waiting" && exit 0
    echo "  relay still down ($(date +%H:%M:%S))"
    sleep 120
  done
}

past_hard_deadline() {
  [[ "$(date +%H:%M)" > "$HARD_DEADLINE" ]]
}

step() {
  [ -f /tmp/stop_queue12 ] && echo "QUEUE12 STOPPED before: $1" && exit 0
  past_hard_deadline && echo "QUEUE12 hard deadline passed; skipping: $1" \
    && return 1
  echo "QUEUE12 STEP: $1 ($(date +%H:%M:%S))"
}

run_training() {
  local marker="$1" log="$2" tries="$3"; shift 3
  for attempt in $(seq 1 "$tries"); do
    [ -f /tmp/stop_queue12 ] && echo "QUEUE12 STOPPED (training retry)" && return 1
    "$@" >> "$log" 2>&1
    grep -q "$marker" "$log" && return 0
    echo "  attempt $attempt died without $marker ($(date +%H:%M:%S)); re-probing relay"
    sleep 90
    wait_for_relay
  done
  echo "  GAVE UP after $tries attempts: $*"
  return 1
}

echo "QUEUE12 waiting for relay ($(date +%H:%M:%S))"
wait_for_relay
echo "QUEUE12 relay is up ($(date +%H:%M:%S))"

# ---- 1. validate the chunked-put fix above the 7 GB wall ----
CHUNKED_OK=0
if step "probe_bigput 8.5 GB chunked"; then
  python -u scripts/probe_bigput.py 8.5 chunked > /tmp/r4_bigput.log 2>&1
  if grep -q "BIGPUT_OK" /tmp/r4_bigput.log; then
    CHUNKED_OK=1
  else
    echo "QUEUE12 chunked 8.5 GB put FAILED; re-probing relay"
    cat /tmp/r4_bigput.log
    sleep 90
    wait_for_relay
  fi
fi
echo "QUEUE12 chunked-put verdict: CHUNKED_OK=$CHUNKED_OK"

# choose the long-run configuration
LONG_SIZE=384
if [ "$CHUNKED_OK" = "1" ]; then LONG_SIZE=0; fi

# ---- 2. full-scale 2-epoch confirm (separate logdir, NO ckpt dir so the
#         2-epoch 1-cycle schedule never contaminates the long run) ----
LONG_OK=0
if step "full-scale 2-epoch confirm (size=$LONG_SIZE)"; then
  if run_training DATASET_A_RESULT /tmp/r4_long_confirm.log 2 \
      env SPNET_BACKBONE_DTYPE=bfloat16 SPNET_NVAL=512 \
      SPNET_LOGDIR=logs/r4_long_confirm \
      python -u scripts/dataset_a_run.py 2 16 4e-5 40960 float32 $LONG_SIZE
  then LONG_OK=1
  elif [ "$LONG_SIZE" = "0" ]; then
    echo "QUEUE12 big confirm failed; falling back to 384"
    LONG_SIZE=384
    if run_training DATASET_A_RESULT /tmp/r4_long_confirm.log 2 \
        env SPNET_BACKBONE_DTYPE=bfloat16 SPNET_NVAL=512 \
        SPNET_LOGDIR=logs/r4_long_confirm \
        python -u scripts/dataset_a_run.py 2 16 4e-5 40960 float32 384
    then LONG_OK=1; fi
  fi
fi
echo "QUEUE12 long run: input_size=$LONG_SIZE LONG_OK=$LONG_OK"

# ---- 3. the long accuracy run (retries resume from checkpoint) ----
if [ "$LONG_OK" = "1" ] && step "LONG 150ep accuracy run (size=$LONG_SIZE, mixed)"; then
  run_training DATASET_A_RESULT /tmp/r4_long.log 6 \
    env SPNET_BACKBONE_DTYPE=bfloat16 SPNET_CKPT=logs/r4_long_ckpt \
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
  for i in $(seq 1 30); do
    [ -f logs/dataset_d_data/inflate_done.json ] && break
    echo "QUEUE12 waiting for dataset-D CPU prep ($(date +%H:%M:%S))"
    sleep 60
  done
  if [ -f logs/dataset_d_data/inflate_done.json ]; then
    run_training DATASET_D_RESULT /tmp/r4_datasetd.log 2 \
      python -u scripts/dataset_d_run.py 1280 12
  else
    echo "QUEUE12: inflation marker missing; skipping dataset-D"
  fi
fi

# ---- 6. backbone sweep remainder ----
if step "backbone sweep remainder (IRv2, NASNetMobile)"; then
  for bb in InceptionResNetV2 NASNetMobile; do
    [ -f /tmp/stop_queue12 ] && echo "QUEUE12 STOPPED at sweep:$bb" && exit 0
    past_hard_deadline && echo "QUEUE12 hard deadline; stopping sweep" && break
    echo "QUEUE12 sweep $bb ($(date +%H:%M:%S))"
    run_training DATASET_A_RESULT /tmp/r4_sweep_$bb.log 2 \
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
    run_training DATASET_A_RESULT /tmp/r4_prec2.log 3 \
      env SPNET_CKPT=logs/r4_prec_ckpt SPNET_LOGDIR=logs/r4_prec \
      SPNET_MATMUL_PRECISION=high \
      python -u scripts/dataset_a_run.py 100 16 4e-5 40960 float32 331
  fi
else
  echo "QUEUE12: past HIGH deadline ($now >= $HIGH_DEADLINE); skipping HIGH retry"
fi

echo "QUEUE12 DONE ($(date +%H:%M:%S))" | tee /tmp/r4_queue12.done
