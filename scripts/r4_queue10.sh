#!/bin/bash
# Round-4 TPU queue, part 10: relaunch of queue9 after container wipe #3
# (boot 05:55 erased logs/ — all dataset caches and checkpoints — and
# the queued jobs; the repo itself survived in git).  Content = queue9
# re-ordered by value, with fresh time gates for this session:
#   1. native 512x384 'big' f32 150ep    (the headline — VERDICT next-#2)
#   2. TTA eval of the big checkpoint
#   3. backbone sweep 25ep x4            (VERDICT next-#10)
#   4. scan-unroll A/B on the bench
#   5. XLA scheduling-flag sweep         (last untried single-chip lever)
#   6. dataset-D training arms           (VERDICT next-#9; waits for the
#                                         concurrent CPU-side inflation)
#   7. HIGH (bf16x3) precision 331 100ep (gated: starts only before
#                                         QUEUE10_HIGH_DEADLINE, def 14:30)
# No NEW step starts after HARD_DEADLINE (def 16:00) so the TPU is free
# well before the driver's end-of-round bench.
# Touch /tmp/stop_queue10 to stop between steps.
cd /root/repo
HIGH_DEADLINE="${QUEUE10_HIGH_DEADLINE:-14:30}"
HARD_DEADLINE="${QUEUE10_HARD_DEADLINE:-16:00}"

probe_ok() {
  rm -f /tmp/probe10.log
  setsid bash -c 'echo $$ > /tmp/probe10.pid; exec python -u -c "
import time, jax, jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum())
v = float(f(jnp.ones((256, 256))))
print(\"TPU PROBE OK\", v, flush=True)
" > /tmp/probe10.log 2>&1' &
  for i in $(seq 1 60); do
    sleep 5
    grep -q "TPU PROBE OK" /tmp/probe10.log 2>/dev/null && return 0
  done
  kill "$(cat /tmp/probe10.pid)" 2>/dev/null
  sleep 90
  return 1
}

wait_for_relay() {
  until probe_ok; do
    [ -f /tmp/stop_queue10 ] && echo "QUEUE10 STOPPED while waiting" && exit 0
    echo "  relay still down ($(date +%H:%M:%S))"
    sleep 120
  done
}

past_hard_deadline() {
  [[ "$(date +%H:%M)" > "$HARD_DEADLINE" ]]
}

step() {
  [ -f /tmp/stop_queue10 ] && echo "QUEUE10 STOPPED before: $1" && exit 0
  past_hard_deadline && echo "QUEUE10 hard deadline passed; skipping: $1" \
    && return 1
  echo "QUEUE10 STEP: $1 ($(date +%H:%M:%S))"
}

run_training() {
  local marker="$1" log="$2"; shift 2
  for attempt in 1 2 3 4; do
    [ -f /tmp/stop_queue10 ] && echo "QUEUE10 STOPPED (training retry)" && return 1
    "$@" >> "$log" 2>&1
    grep -q "$marker" "$log" && return 0
    echo "  attempt $attempt died without $marker ($(date +%H:%M:%S)); re-probing relay"
    sleep 90
    wait_for_relay
  done
  echo "  GAVE UP after 4 attempts: $*"
  return 1
}

echo "QUEUE10 waiting for relay ($(date +%H:%M:%S))"
wait_for_relay
echo "QUEUE10 relay is up ($(date +%H:%M:%S))"

if step "native 512x384 'big' f32 150ep (default matmul precision)"; then
  run_training DATASET_A_RESULT /tmp/r4_big.log \
    env SPNET_CKPT=logs/r4_big_ckpt SPNET_LOGDIR=logs/r4_big \
    python -u scripts/dataset_a_run.py 150 16 4e-5 40960 float32 0
fi

if step "TTA eval of the big checkpoint"; then
  python -u scripts/eval_tta.py logs/r4_big_ckpt synth \
    > /tmp/r4_tta_big.log 2>&1
fi

if step "backbone sweep 25ep b=32"; then
  for bb in MobileNet DarkNet19 InceptionResNetV2 NASNetMobile; do
    [ -f /tmp/stop_queue10 ] && echo "QUEUE10 STOPPED at sweep:$bb" && exit 0
    past_hard_deadline && echo "QUEUE10 hard deadline; stopping sweep" && break
    echo "QUEUE10 sweep $bb ($(date +%H:%M:%S))"
    run_training DATASET_A_RESULT /tmp/r4_sweep_$bb.log \
      env SPNET_LOGDIR=logs/r4_sweep_$bb \
      python -u scripts/dataset_a_run.py 25 32 1e-4 40960 bfloat16 331 $bb
  done
fi

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

if step "dataset-D training arms (needs the CPU-side inflation marker)"; then
  for i in $(seq 1 120); do
    [ -f logs/dataset_d_data/inflate_done.json ] && break
    [ -f /tmp/stop_queue10 ] && echo "QUEUE10 STOPPED waiting for inflation" && exit 0
    echo "  waiting for CPU-side inflation ($(date +%H:%M:%S))"
    sleep 60
  done
  if [ -f logs/dataset_d_data/inflate_done.json ]; then
    run_training DATASET_D_RESULT /tmp/r4_datasetd.log \
      python -u scripts/dataset_d_run.py 1280 12
  else
    echo "QUEUE10: inflation never completed; skipping dataset-D"
  fi
fi

now=$(date +%H:%M)
if [[ "$now" < "$HIGH_DEADLINE" ]]; then
  if step "precision retry: 331 f32 + HIGH (bf16x3) 100ep"; then
    run_training DATASET_A_RESULT /tmp/r4_prec2.log \
      env SPNET_CKPT=logs/r4_prec_ckpt SPNET_LOGDIR=logs/r4_prec \
      SPNET_MATMUL_PRECISION=high \
      python -u scripts/dataset_a_run.py 100 16 4e-5 40960 float32 331
  fi
else
  echo "QUEUE10: past HIGH deadline ($now >= $HIGH_DEADLINE); skipping HIGH retry"
fi

echo "QUEUE10 DONE ($(date +%H:%M:%S))" | tee /tmp/r4_queue10.done
