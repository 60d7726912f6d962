#!/bin/bash
# Round-4 TPU queue, part 9: replaces the remainder of queue7 after the
# dataset-D offline-inflation step turned out to be 4.3 h of pure HOST
# work holding the TPU claim (12 s/file of tunnel dispatch latency).
# The inflation now runs concurrently on CPU (scripts/dataset_d_inflate.py);
# this queue re-orders the TPU work by value:
#   1. native 512x384 'big' f32 150ep    (the headline — VERDICT next-#2)
#   2. TTA eval of the big checkpoint
#   3. backbone sweep 25ep x4            (VERDICT next-#10)
#   4. scan-unroll A/B
#   5. dataset-D training arms           (VERDICT next-#9; reuses the
#                                         host-side inflation marker)
#   6. TTA eval of the mixed checkpoint
#   7. HIGH (bf16x3) precision 331 100ep (gated: starts only before
#                                         QUEUE9_HIGH_DEADLINE, def 11:00)
# Touch /tmp/stop_queue9 to stop between steps.
cd /root/repo
HIGH_DEADLINE="${QUEUE9_HIGH_DEADLINE:-11:00}"

probe_ok() {
  rm -f /tmp/probe9.log
  setsid bash -c 'echo $$ > /tmp/probe9.pid; exec python -u -c "
import time, jax, jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum())
v = float(f(jnp.ones((256, 256))))
print(\"TPU PROBE OK\", v, flush=True)
" > /tmp/probe9.log 2>&1' &
  for i in $(seq 1 60); do
    sleep 5
    grep -q "TPU PROBE OK" /tmp/probe9.log 2>/dev/null && return 0
  done
  kill "$(cat /tmp/probe9.pid)" 2>/dev/null
  sleep 90
  return 1
}

wait_for_relay() {
  until probe_ok; do
    [ -f /tmp/stop_queue9 ] && echo "QUEUE9 STOPPED while waiting" && exit 0
    echo "  relay still down ($(date +%H:%M:%S))"
    sleep 120
  done
}

step() {
  [ -f /tmp/stop_queue9 ] && echo "QUEUE9 STOPPED before: $1" && exit 0
  echo "QUEUE9 STEP: $1 ($(date +%H:%M:%S))"
}

run_training() {
  local marker="$1" log="$2"; shift 2
  for attempt in 1 2 3 4; do
    [ -f /tmp/stop_queue9 ] && echo "QUEUE9 STOPPED (training retry)" && return 1
    "$@" >> "$log" 2>&1
    grep -q "$marker" "$log" && return 0
    echo "  attempt $attempt died without $marker ($(date +%H:%M:%S)); re-probing relay"
    sleep 90
    wait_for_relay
  done
  echo "  GAVE UP after 4 attempts: $*"
  return 1
}

echo "QUEUE9 waiting for relay ($(date +%H:%M:%S))"
wait_for_relay
echo "QUEUE9 relay is up ($(date +%H:%M:%S))"

step "native 512x384 'big' f32 150ep (default matmul precision)"
run_training DATASET_A_RESULT /tmp/r4_big.log \
  env SPNET_CKPT=logs/r4_big_ckpt SPNET_LOGDIR=logs/r4_big \
  python -u scripts/dataset_a_run.py 150 16 4e-5 40960 float32 0

step "TTA eval of the big checkpoint"
python -u scripts/eval_tta.py logs/r4_big_ckpt synth > /tmp/r4_tta_big.log 2>&1

step "backbone sweep 25ep b=32"
for bb in MobileNet DarkNet19 InceptionResNetV2 NASNetMobile; do
  [ -f /tmp/stop_queue9 ] && echo "QUEUE9 STOPPED at sweep:$bb" && exit 0
  echo "QUEUE9 sweep $bb ($(date +%H:%M:%S))"
  SPNET_LOGDIR=logs/r4_sweep_$bb \
    python -u scripts/dataset_a_run.py 25 32 1e-4 40960 bfloat16 331 $bb \
    > /tmp/r4_sweep_$bb.log 2>&1
done

step "scan-unroll A/B on the production bench"
for u in 1 2 4; do
  [ -f /tmp/stop_queue9 ] && echo "QUEUE9 STOPPED at unroll:$u" && exit 0
  echo "--- unroll=$u ---" >> /tmp/r4_unroll_ab.log
  SPNET_SCAN_UNROLL=$u python -u bench.py 2>&1 | tail -1 \
    >> /tmp/r4_unroll_ab.log
done

step "dataset-D training arms (inflation marker from the CPU-side run)"
run_training DATASET_D_RESULT /tmp/r4_datasetd.log \
  python -u scripts/dataset_d_run.py 1280 12

step "TTA eval of the mixed checkpoint"
python -u scripts/eval_tta.py logs/r4_mixed_ckpt synth > /tmp/r4_tta_mixed.log 2>&1

now=$(date +%H:%M)
if [[ "$now" < "$HIGH_DEADLINE" ]]; then
  step "precision retry: 331 f32 + HIGH (bf16x3) 100ep"
  run_training DATASET_A_RESULT /tmp/r4_prec2.log \
    env SPNET_CKPT=logs/r4_prec_ckpt SPNET_LOGDIR=logs/r4_prec \
    SPNET_MATMUL_PRECISION=high \
    python -u scripts/dataset_a_run.py 100 16 4e-5 40960 float32 331
else
  echo "QUEUE9: past HIGH deadline ($now >= $HIGH_DEADLINE); skipping HIGH retry"
fi

echo "QUEUE9 DONE ($(date +%H:%M:%S))" | tee /tmp/r4_queue9.done
