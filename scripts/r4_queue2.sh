#!/bin/bash
# Round-4 TPU run queue, part 2 (launched after r4_queue.sh stopped at
# /tmp/stop_queue).  Order: the true-f32-conv precision experiment
# first (shortest discriminating run for the residual ~1-pt gap that
# survived the refgen experiment — and its outcome decides whether the
# 384 resolution run should also use highest precision), then the 384
# run (the beat-96.5% lever; its first attempt hit the pre-fix
# pregather OOM), then mixed-precision, dataset-D, backbone sweep.
# One TPU process at a time; touch /tmp/stop_queue2 to stop between
# steps.
cd /root/repo

step() {
  [ -f /tmp/stop_queue2 ] && echo "QUEUE2 STOPPED before: $1" && exit 0
  echo "QUEUE2 STEP: $1 ($(date +%H:%M:%S))"
}

step "331 f32 + HIGHEST matmul precision 100ep (true-f32 convs)"
SPNET_CKPT=logs/r4_prec_ckpt SPNET_LOGDIR=logs/r4_prec \
  SPNET_MATMUL_PRECISION=highest \
  python -u scripts/dataset_a_run.py 100 16 4e-5 40960 float32 331 \
  > /tmp/r4_prec.log 2>&1

step "384 full-f32 150ep (no-pregather path)"
# SPNET_384_PRECISION is set (to 'highest') by the session driver once
# the precision experiment's verdict is in; empty = default precision.
SPNET_CKPT=logs/r4_384_ckpt SPNET_LOGDIR=logs/r4_384 SPNET_REMAT=1 \
  SPNET_MATMUL_PRECISION="$(cat /tmp/spnet_384_precision 2>/dev/null)" \
  python -u scripts/dataset_a_run.py 150 16 4e-5 40960 float32 384 \
  > /tmp/r4_384c.log 2>&1

step "mixed-precision recipe (f32 stem+head, bf16 backbone) 100ep"
SPNET_CKPT=logs/r4_mixed_ckpt SPNET_LOGDIR=logs/r4_mixed \
  SPNET_BACKBONE_DTYPE=bfloat16 \
  python -u scripts/dataset_a_run.py 100 16 4e-5 40960 float32 331 \
  > /tmp/r4_mixed.log 2>&1

step "dataset-D-shaped small-data"
python -u scripts/dataset_d_run.py 1280 12 > /tmp/r4_datasetd.log 2>&1

step "backbone sweep 25ep b=32"
for bb in MobileNet DarkNet19 InceptionResNetV2 NASNetMobile; do
  [ -f /tmp/stop_queue2 ] && echo "QUEUE2 STOPPED at sweep:$bb" && exit 0
  SPNET_LOGDIR=logs/r4_sweep_$bb \
    python -u scripts/dataset_a_run.py 25 32 1e-4 40960 bfloat16 331 $bb \
    > /tmp/r4_sweep_$bb.log 2>&1
done

echo "QUEUE2 DONE ($(date +%H:%M:%S))" > /tmp/r4_queue2.done

step "TTA evals of round-4 checkpoints"
python -u scripts/eval_tta.py logs/r4_384_ckpt synth > /tmp/r4_tta_384.log 2>&1
python -u scripts/eval_tta.py logs/r4_331f32_ckpt synth > /tmp/r4_tta_331.log 2>&1
python -u scripts/eval_tta.py logs/r4_refgen_ckpt refgen > /tmp/r4_tta_refgen.log 2>&1

step "precision retry: 331 f32 + HIGH (bf16x3) 100ep"
SPNET_CKPT=logs/r4_prec_ckpt SPNET_LOGDIR=logs/r4_prec \
  SPNET_MATMUL_PRECISION=high \
  python -u scripts/dataset_a_run.py 100 16 4e-5 40960 float32 331 \
  > /tmp/r4_prec2.log 2>&1

echo "QUEUE2 ALL DONE ($(date +%H:%M:%S))" >> /tmp/r4_queue2.done

step "ring-width breakdown of the 384 checkpoint"
python -u scripts/eval_breakdown.py logs/r4_384_ckpt > /tmp/r4_breakdown_384.log 2>&1
