#!/bin/bash
# Round-4 TPU queue, part 19 (session 7, opportunistic) — runs after
# queue18 if the night's deadline allows.  The big-run crash quadrant
# probe (scripts/probe_bigprog.py): REAL train-step epoch program at
# 8.15 GB with increasing scan length.  Crash at 4 steps => program
# working-set at scale; pass at 4 but crash at 2560 => length/duration.
cd /root/repo
DEADLINE_EPOCH=$(date -d 'tomorrow 06:10' +%s)
[ "$(date +%H)" -lt 14 ] && DEADLINE_EPOCH=$(date -d 'today 06:10' +%s)
past_deadline() { [ "$(date +%s)" -gt "$DEADLINE_EPOCH" ]; }

probe_ok() {
  rm -f /tmp/probe19.log
  setsid bash -c 'echo $$ > /tmp/probe19.pid; exec python -u -c "
import jax, jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum())
print(\"TPU PROBE OK\", float(f(jnp.ones((256, 256)))), flush=True)
" > /tmp/probe19.log 2>&1' &
  for i in $(seq 1 60); do
    sleep 5
    grep -q "TPU PROBE OK" /tmp/probe19.log 2>/dev/null && return 0
  done
  kill "$(cat /tmp/probe19.pid)" 2>/dev/null
  sleep 90
  return 1
}

wait_for_relay() {
  until probe_ok; do
    past_deadline && echo "QUEUE19 deadline while relay down" && exit 0
    echo "  relay still down ($(date +%H:%M:%S))"
    sleep 120
  done
}

echo "QUEUE19 waiting for queue18 ($(date +%H:%M:%S))"
until [ -f /tmp/r4_queue18.done ]; do
  past_deadline && echo "QUEUE19 deadline passed while waiting" && exit 0
  if [ -f /tmp/queue18.pid ] && ! kill -0 "$(cat /tmp/queue18.pid)" 2>/dev/null; then
    echo "QUEUE19: queue18 gone without marker; proceeding"
    break
  fi
  sleep 120
done
wait_for_relay

for steps in 4 512 2560; do
  past_deadline && echo "QUEUE19 deadline; stopping at steps=$steps" && break
  echo "QUEUE19 STEP: probe_bigprog 8.15 GB steps=$steps ($(date +%H:%M:%S))"
  python -u scripts/probe_bigprog.py 8.15 $steps >> /tmp/r4_bigprog.log 2>&1
  if ! grep -q "BIGPROG_OK 8.15 $steps" /tmp/r4_bigprog.log; then
    echo "QUEUE19: CRASH at steps=$steps (quadrant pinned)" | tee -a /tmp/r4_bigprog.log
    sleep 120
    break
  fi
  echo "  BIGPROG_OK at steps=$steps"
  sleep 20
  wait_for_relay
done

echo "QUEUE19 DONE ($(date +%H:%M:%S))" | tee /tmp/r4_queue19.done
