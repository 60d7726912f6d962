#!/bin/bash
# Round-4 TPU queue, part 6 (v2): consolidated remainder after the
# 20:50 relay outage killed the mixed resume and hung the dataset-D
# step.  Waits for the relay (probe loop), then runs every remaining
# step, cheapest-highest-value first.  Long training runs get a retry
# wrapper: checkpoints + auto-resume mean a mid-run relay crash costs
# <=10 epochs, so the right response is to relaunch, not to move on.
# Touch /tmp/stop_queue6 to stop between steps.
cd /root/repo

probe_ok() {
  rm -f /tmp/probe6.log
  setsid bash -c 'echo $$ > /tmp/probe6.pid; exec python -u -c "
import time, jax, jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum())
v = float(f(jnp.ones((256, 256))))
print(\"TPU PROBE OK\", v, flush=True)
" > /tmp/probe6.log 2>&1' &
  for i in $(seq 1 60); do       # up to 5 min
    sleep 5
    grep -q "TPU PROBE OK" /tmp/probe6.log 2>/dev/null && return 0
  done
  kill "$(cat /tmp/probe6.pid)" 2>/dev/null
  sleep 90   # let the device claim release
  return 1
}

wait_for_relay() {
  until probe_ok; do
    [ -f /tmp/stop_queue6 ] && echo "QUEUE6 STOPPED while waiting" && exit 0
    echo "  relay still down ($(date +%H:%M:%S))"
    sleep 120
  done
}

step() {
  [ -f /tmp/stop_queue6 ] && echo "QUEUE6 STOPPED before: $1" && exit 0
  echo "QUEUE6 STEP: $1 ($(date +%H:%M:%S))"
}

# run_training <result_marker> <logfile> <cmd...>: relaunch (auto-resume
# from the run's checkpoint dir) until the result line appears, up to 4
# attempts, re-probing the relay between attempts.
run_training() {
  local marker="$1" log="$2"; shift 2
  for attempt in 1 2 3 4; do
    [ -f /tmp/stop_queue6 ] && echo "QUEUE6 STOPPED (training retry)" && return 1
    "$@" >> "$log" 2>&1
    grep -q "$marker" "$log" && return 0
    echo "  attempt $attempt died without $marker ($(date +%H:%M:%S)); re-probing relay"
    sleep 90
    wait_for_relay
  done
  echo "  GAVE UP after 4 attempts: $*"
  return 1
}

echo "QUEUE6 waiting for relay ($(date +%H:%M:%S))"
wait_for_relay
echo "QUEUE6 relay is back ($(date +%H:%M:%S))"

step "TTA evals of round-4 checkpoints (cheap; 384 TTA may cross 96.5)"
python -u scripts/eval_tta.py logs/r4_384_ckpt synth > /tmp/r4_tta_384.log 2>&1
python -u scripts/eval_tta.py logs/r4_331f32_ckpt synth > /tmp/r4_tta_331.log 2>&1
python -u scripts/eval_tta.py logs/r4_refgen_ckpt refgen > /tmp/r4_tta_refgen.log 2>&1

step "mixed-precision recipe RESUME from ep60 (f32 stem+head, bf16 backbone)"
run_training DATASET_A_RESULT /tmp/r4_mixed.log \
  env SPNET_CKPT=logs/r4_mixed_ckpt SPNET_LOGDIR=logs/r4_mixed \
  SPNET_BACKBONE_DTYPE=bfloat16 \
  python -u scripts/dataset_a_run.py 100 16 4e-5 40960 float32 331

step "dataset-D-shaped small-data"
run_training DATASET_D_RESULT /tmp/r4_datasetd.log \
  python -u scripts/dataset_d_run.py 1280 12

step "scan-unroll A/B on the production bench"
for u in 1 2 4; do
  [ -f /tmp/stop_queue6 ] && echo "QUEUE6 STOPPED at unroll:$u" && exit 0
  echo "--- unroll=$u ---" >> /tmp/r4_unroll_ab.log
  SPNET_SCAN_UNROLL=$u python -u bench.py 2>&1 | tail -1 \
    >> /tmp/r4_unroll_ab.log
done

step "precision retry: 331 f32 + HIGH (bf16x3) 100ep"
run_training DATASET_A_RESULT /tmp/r4_prec2.log \
  env SPNET_CKPT=logs/r4_prec_ckpt SPNET_LOGDIR=logs/r4_prec \
  SPNET_MATMUL_PRECISION=high \
  python -u scripts/dataset_a_run.py 100 16 4e-5 40960 float32 331

step "backbone sweep 25ep b=32"
for bb in MobileNet DarkNet19 InceptionResNetV2 NASNetMobile; do
  [ -f /tmp/stop_queue6 ] && echo "QUEUE6 STOPPED at sweep:$bb" && exit 0
  SPNET_LOGDIR=logs/r4_sweep_$bb \
    python -u scripts/dataset_a_run.py 25 32 1e-4 40960 bfloat16 331 $bb \
    > /tmp/r4_sweep_$bb.log 2>&1
done

step "ring-width breakdown of the 384 checkpoint"
python -u scripts/eval_breakdown.py logs/r4_384_ckpt > /tmp/r4_breakdown_384.log 2>&1

step "native 512x384 'big' f32 150ep"
PREC=$(python - <<'EOF'
import json
try:
    line = [l for l in open("/tmp/r4_prec2.log")
            if l.startswith("DATASET_A_RESULT")][-1]
    acc = json.loads(line.split(None, 1)[1])["last10_ring_acc"]
    # default-precision full-f32 331 plateau: 95.45 (last-10, r4)
    print("high" if acc is not None and acc >= 95.70 else "")
except Exception:
    print("")
EOF
)
echo "  big-run precision: '$PREC'"
run_training DATASET_A_RESULT /tmp/r4_big.log \
  env SPNET_CKPT=logs/r4_big_ckpt SPNET_LOGDIR=logs/r4_big \
  SPNET_MATMUL_PRECISION="$PREC" \
  python -u scripts/dataset_a_run.py 150 16 4e-5 40960 float32 0

step "TTA eval of the big checkpoint"
python -u scripts/eval_tta.py logs/r4_big_ckpt synth > /tmp/r4_tta_big.log 2>&1

echo "QUEUE6 DONE ($(date +%H:%M:%S))" > /tmp/r4_queue6.done
