#!/bin/bash
# Round-4 big-run crash bisect.
#
# The native-resolution run (input_size=0, 512x384) crashed the TPU
# worker 4/4 times inside the FIRST epoch program (queue10, /tmp/r4_big.log:
# "TPU worker process crashed or restarted ... kernel fault" at the
# ep_loss retrieval).  The 384x384 run of the SAME no-pregather epoch-scan
# path completed 150 epochs, so the triggers unique to big are:
#   remat (forced on only at input_size=0), the 512-wide non-square
#   shapes (stem_fused's known fault is also at a 512 dim), the in-step
#   augmentation at native res, or total memory pressure (9.03 GB data).
#
# Strategy: reproduce at tiny scale (2 epochs, 2048 frames, 512 val) and
# bisect knobs; every stage is ONE python process run to completion
# (never `timeout` a TPU run — NOTES.md), relay re-probed after a crash.
# Verdict written to /tmp/r4_bigdebug.verdict:
#   REMAT | AUGMENT | DTYPE | MEM | TINY_PASS_FULL_CRASH | ENV | PASS
cd /root/repo
V=/tmp/r4_bigdebug.verdict
rm -f "$V"
LOGD=/tmp/r4_bigdebug
mkdir -p "$LOGD"

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
    echo "  relay still down ($(date +%H:%M:%S))"
    sleep 120
  done
}

run_stage() {
  # run_stage NAME "ENV1=a ENV2=b" "ARGS"
  local name="$1" envs="$2" args="$3"
  local log="$LOGD/$name.log"
  echo "BIGDEBUG stage $name: env[$envs] args[$args] ($(date +%H:%M:%S))"
  env $envs SPNET_NVAL=512 SPNET_LOGDIR="logs/bigdebug_$name" \
    python -u scripts/dataset_a_run.py $args > "$log" 2>&1
  if grep -q "DATASET_A_RESULT" "$log"; then
    echo "  -> $name PASSED ($(date +%H:%M:%S))"
    return 0
  fi
  local note="died before epoch 1"
  grep -q "epoch 1/" "$log" && note="train epoch ran; died later"
  echo "  -> $name CRASHED ($note, $(date +%H:%M:%S)); re-probing relay"
  sleep 90
  wait_for_relay
  return 1
}

echo "BIGDEBUG begin ($(date +%H:%M:%S))"
wait_for_relay

# B1: exact big config at tiny scale (2 ep, 2048 train, 512 val)
if run_stage B1_tiny_exact "" "2 16 4e-5 2048 float32 0"; then
  # tiny passes -> scale-dependent.  Confirm full-scale config still
  # crashes with 2 epochs, then test the mixed-precision memory fix.
  if run_stage B6_full_2ep "SPNET_CKPT=logs/r4_big_ckpt" \
      "2 16 4e-5 40960 float32 0"; then
    echo "PASS" > "$V"   # full scale passes now?! transient env fault
  else
    if run_stage B7_full_mixed "SPNET_BACKBONE_DTYPE=bfloat16" \
        "2 16 4e-5 40960 float32 0"; then
      echo "MEM" > "$V"  # mixed precision relieves it -> memory pressure
    else
      echo "TINY_PASS_FULL_CRASH" > "$V"
    fi
  fi
else
  # tiny crashes -> knob bisect at tiny scale
  if run_stage B2_tiny_nremat "SPNET_REMAT=0" "2 16 4e-5 2048 float32 0"; then
    echo "REMAT" > "$V"
  elif run_stage B3_tiny_noaug "SPNET_AUGMENT=0" "2 16 4e-5 2048 float32 0"; then
    echo "AUGMENT" > "$V"
  elif run_stage B4_tiny_bf16 "" "2 16 4e-5 2048 bfloat16 0"; then
    # full-bf16 runs; check the accuracy-proven mixed split too
    if run_stage B4b_tiny_mixed "SPNET_BACKBONE_DTYPE=bfloat16" \
        "2 16 4e-5 2048 float32 0"; then
      echo "DTYPE_MIXED_OK" > "$V"
    else
      echo "DTYPE" > "$V"
    fi
  elif run_stage B5_tiny_384 "" "2 16 4e-5 2048 float32 384"; then
    echo "SHAPE512" > "$V"  # 384 fine, all big variants crash -> W=512
  else
    echo "ENV" > "$V"       # even the known-good 384 config crashes
  fi
fi
echo "BIGDEBUG verdict: $(cat $V) ($(date +%H:%M:%S))"
