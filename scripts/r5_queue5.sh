#!/bin/bash
# Round-5 queue, part 5 (session 11): post-queue4 confirm benches.
# Waits for queue4 (pid file) to exit, then runs the 2-variant confirm
# sweep (new pregather=0 bench default + u3 stack).  Short and hard
# deadline-gated at 03:30 so the chip is free for the driver's
# end-of-round bench.  Touch /tmp/stop_queue_r5e to stop.
cd /root/repo
DEADLINE_EPOCH=$(date -d 'tomorrow 03:30' +%s)
[ "$(date +%H)" -lt 12 ] && DEADLINE_EPOCH=$(date -d 'today 03:30' +%s)
past_deadline() { [ "$(date +%s)" -gt "$DEADLINE_EPOCH" ]; }

echo "QUEUE_R5E waiting for queue4 to exit ($(date +%H:%M:%S))"
while [ -f /tmp/r5_queue4.pid ] \
    && kill -0 "$(cat /tmp/r5_queue4.pid)" 2>/dev/null; do
  [ -f /tmp/stop_queue_r5e ] && echo "QUEUE_R5E STOPPED" && exit 0
  past_deadline && echo "QUEUE_R5E deadline while queue4 runs" && exit 0
  sleep 60
done
sleep 30

# an orphaned queue4 training child could still hold the device; the
# probe hangs on the claim in that case, so loop it with a bound
probe_ok() {
  rm -f /tmp/probe_r5e.log
  setsid bash -c 'echo $$ > /tmp/probe_r5e.pid; exec python -u -c "
import jax, jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum())
print(\"TPU PROBE OK\", float(f(jnp.ones((256, 256)))), flush=True)
" > /tmp/probe_r5e.log 2>&1' &
  for i in $(seq 1 60); do
    sleep 5
    grep -q "TPU PROBE OK" /tmp/probe_r5e.log 2>/dev/null && return 0
  done
  kill "$(cat /tmp/probe_r5e.pid)" 2>/dev/null
  sleep 90
  return 1
}
until probe_ok; do
  [ -f /tmp/stop_queue_r5e ] && echo "QUEUE_R5E STOPPED" && exit 0
  past_deadline && echo "QUEUE_R5E deadline while device busy" && exit 0
  echo "  device still busy/down ($(date +%H:%M:%S))"
  sleep 120
done

# ~20 min for two bench subprocesses; only start with real margin
[ "$(( $(date +%s) + 25 * 60 ))" -lt "$DEADLINE_EPOCH" ] || {
  echo "QUEUE_R5E: no margin for confirm sweep"; exit 0; }
echo "QUEUE_R5E STEP: confirm sweep ($(date +%H:%M:%S))"
python -u scripts/r5_confirm_sweep.py > /tmp/r5_bench_confirm.log 2>&1
grep -E "CONFIRM_VARIANT|CONFIRM_SWEEP_RESULT" /tmp/r5_bench_confirm.log
mkdir -p docs/run_logs
grep -v "^WARNING" /tmp/r5_bench_confirm.log | tail -100 \
  > docs/run_logs/r5_bench_confirm.log
echo "QUEUE_R5E DONE ($(date +%H:%M:%S))" | tee /tmp/r5_queue5.done
