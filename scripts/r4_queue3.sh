#!/bin/bash
# Round-4 TPU run queue, part 3: the native-resolution 'big' run —
# train on the raw 512x384 generator frames with NO resize at all
# (input_size=0), the end point of the resolution lever that took
# 331 -> 384 from 95.48% to 96.20% ring-acc (VALIDATION §2c).  Ring
# spacing at native scale is 1.33x the 384 run's; the eval-breakdown
# localizes every remaining miss below 3 px spacing, so this is the
# configuration expected to beat the reference's 96.5%.
#
# Waits for queue part 2 (one TPU process at a time), then picks the
# matmul precision: if the HIGH (bf16x3) 331 retry beat the default-
# precision 331 plateau by >= 0.25 pt, the big run inherits it.
# touch /tmp/stop_queue3 to abort before the run starts.
cd /root/repo

Q2PID=$(cat /tmp/r4_queue2.pid 2>/dev/null)
while [ -n "$Q2PID" ] && kill -0 "$Q2PID" 2>/dev/null; do
  sleep 60
done

[ -f /tmp/stop_queue3 ] && echo "QUEUE3 STOPPED" && exit 0

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
echo "QUEUE3 STEP: native 512x384 'big' f32 150ep (precision='$PREC') ($(date +%H:%M:%S))"
SPNET_CKPT=logs/r4_big_ckpt SPNET_LOGDIR=logs/r4_big \
  SPNET_MATMUL_PRECISION="$PREC" \
  python -u scripts/dataset_a_run.py 150 16 4e-5 40960 float32 0 \
  > /tmp/r4_big.log 2>&1

echo "QUEUE3 STEP: TTA eval of the big checkpoint ($(date +%H:%M:%S))"
python -u scripts/eval_tta.py logs/r4_big_ckpt synth > /tmp/r4_tta_big.log 2>&1

echo "QUEUE3 DONE ($(date +%H:%M:%S))" > /tmp/r4_queue3.done
