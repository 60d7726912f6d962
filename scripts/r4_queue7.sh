#!/bin/bash
# Round-4 TPU queue, part 7: the container restart wiped /tmp, logs/
# (all checkpoints + synth caches) and killed queue6 before any step
# completed.  This queue re-runs the remainder from scratch, ordered to
# bank the cheap VERDICT items first and give the long 'big' run a
# protected retry budget:
#   1. mixed-precision recipe 100ep      (VERDICT next-#5)
#   2. dataset-D-shaped small-data       (VERDICT next-#9)
#   3. backbone sweep 25ep x4            (VERDICT next-#10)
#   4. native 512x384 'big' f32 150ep    (VERDICT next-#2, headline)
#   5. TTA evals (big + mixed ckpts)
#   6. scan-unroll A/B
#   7. HIGH (bf16x3) precision 331 100ep (optional, deadline-gated)
# Touch /tmp/stop_queue7 to stop between steps.
cd /root/repo
DEADLINE=$(( $(date +%s) + 8 * 3600 ))   # HIGH retry needs ~2.5h; skip if late

probe_ok() {
  rm -f /tmp/probe7.log
  setsid bash -c 'echo $$ > /tmp/probe7.pid; exec python -u -c "
import time, jax, jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum())
v = float(f(jnp.ones((256, 256))))
print(\"TPU PROBE OK\", v, flush=True)
" > /tmp/probe7.log 2>&1' &
  for i in $(seq 1 60); do       # up to 5 min
    sleep 5
    grep -q "TPU PROBE OK" /tmp/probe7.log 2>/dev/null && return 0
  done
  kill "$(cat /tmp/probe7.pid)" 2>/dev/null
  sleep 90   # let the device claim release
  return 1
}

wait_for_relay() {
  until probe_ok; do
    [ -f /tmp/stop_queue7 ] && echo "QUEUE7 STOPPED while waiting" && exit 0
    echo "  relay still down ($(date +%H:%M:%S))"
    sleep 120
  done
}

step() {
  [ -f /tmp/stop_queue7 ] && echo "QUEUE7 STOPPED before: $1" && exit 0
  echo "QUEUE7 STEP: $1 ($(date +%H:%M:%S))"
}

# run_training <result_marker> <logfile> <cmd...>: relaunch (auto-resume
# from the run's checkpoint dir) until the result line appears, up to 4
# attempts, re-probing the relay between attempts.
run_training() {
  local marker="$1" log="$2"; shift 2
  for attempt in 1 2 3 4; do
    [ -f /tmp/stop_queue7 ] && echo "QUEUE7 STOPPED (training retry)" && return 1
    "$@" >> "$log" 2>&1
    grep -q "$marker" "$log" && return 0
    echo "  attempt $attempt died without $marker ($(date +%H:%M:%S)); re-probing relay"
    sleep 90
    wait_for_relay
  done
  echo "  GAVE UP after 4 attempts: $*"
  return 1
}

echo "QUEUE7 waiting for relay ($(date +%H:%M:%S))"
wait_for_relay
echo "QUEUE7 relay is up ($(date +%H:%M:%S))"

step "mixed-precision recipe 100ep (f32 stem+head, bf16 backbone)"
run_training DATASET_A_RESULT /tmp/r4_mixed.log \
  env SPNET_CKPT=logs/r4_mixed_ckpt SPNET_LOGDIR=logs/r4_mixed \
  SPNET_BACKBONE_DTYPE=bfloat16 \
  python -u scripts/dataset_a_run.py 100 16 4e-5 40960 float32 331

step "dataset-D-shaped small-data"
run_training DATASET_D_RESULT /tmp/r4_datasetd.log \
  python -u scripts/dataset_d_run.py 1280 12

step "backbone sweep 25ep b=32"
for bb in MobileNet DarkNet19 InceptionResNetV2 NASNetMobile; do
  [ -f /tmp/stop_queue7 ] && echo "QUEUE7 STOPPED at sweep:$bb" && exit 0
  echo "QUEUE7 sweep $bb ($(date +%H:%M:%S))"
  SPNET_LOGDIR=logs/r4_sweep_$bb \
    python -u scripts/dataset_a_run.py 25 32 1e-4 40960 bfloat16 331 $bb \
    > /tmp/r4_sweep_$bb.log 2>&1
done

step "native 512x384 'big' f32 150ep (default matmul precision)"
run_training DATASET_A_RESULT /tmp/r4_big.log \
  env SPNET_CKPT=logs/r4_big_ckpt SPNET_LOGDIR=logs/r4_big \
  python -u scripts/dataset_a_run.py 150 16 4e-5 40960 float32 0

step "TTA eval of the big checkpoint"
python -u scripts/eval_tta.py logs/r4_big_ckpt synth > /tmp/r4_tta_big.log 2>&1

step "TTA eval of the mixed checkpoint"
python -u scripts/eval_tta.py logs/r4_mixed_ckpt synth > /tmp/r4_tta_mixed.log 2>&1

step "scan-unroll A/B on the production bench"
for u in 1 2 4; do
  [ -f /tmp/stop_queue7 ] && echo "QUEUE7 STOPPED at unroll:$u" && exit 0
  echo "--- unroll=$u ---" >> /tmp/r4_unroll_ab.log
  SPNET_SCAN_UNROLL=$u python -u bench.py 2>&1 | tail -1 \
    >> /tmp/r4_unroll_ab.log
done

if [ "$(date +%s)" -lt "$DEADLINE" ]; then
  step "precision retry: 331 f32 + HIGH (bf16x3) 100ep"
  run_training DATASET_A_RESULT /tmp/r4_prec2.log \
    env SPNET_CKPT=logs/r4_prec_ckpt SPNET_LOGDIR=logs/r4_prec \
    SPNET_MATMUL_PRECISION=high \
    python -u scripts/dataset_a_run.py 100 16 4e-5 40960 float32 331
else
  echo "QUEUE7 deadline passed; skipping HIGH-precision retry"
fi

echo "QUEUE7 DONE ($(date +%H:%M:%S))" | tee /tmp/r4_queue7.done
