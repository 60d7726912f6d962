#!/usr/bin/env python3
"""Pin the full-scale 'big'-run crash to an input relayout copy.

Round-4 evidence: a chunked 8.5 GB put + jitted checksum passes
(`probe_bigput.py`), but the real epoch program at 8.15 GB resident
crashes the worker at the first retrieval (queue14, both attempts) —
while 6.04 GB resident (the 384 run) trains fine.  The surviving
theory: the epoch program's compiled INPUT LAYOUT for the resident
dataset differs from the layout `device_put`/the chunked fill produced,
so the runtime inserts a whole-array relayout copy at program binding —
transient 2 x 8.15 GB > 16 GB HBM => kernel fault.  6.04 GB doubles to
12 GB and survives, which matches every data point.

This probe isolates exactly that: a minimal epoch-like program (lax.scan
whose body gathers a minibatch from the resident uint8 operand,
normalizes, and reduces through a dot) at full scale.

  Usage: python scripts/probe_biglayout.py [GB] [steps]

Stages:
  1. chunked put of a ~GB uint8 (n,384,512,1) array (default layout)
  2. compile the scan-gather program with AUTO layouts; print the
     compiled input format vs the delivered format  -> LAYOUT_INFO line
  3. run the as-compiled program (theory predicts a crash at >=8 GB;
     the process dies before BIGLAYOUT_DEFAULT_OK prints)
  4. re-jit with in_shardings pinned to the DELIVERED format (no copy
     possible) and run                               -> BIGLAYOUT_PINNED_OK

If 3 crashes, rerun with SPNET_PROBE_SKIP_DEFAULT=1 to jump straight to
stage 4 after the relay recovers.  A pass at stage 4 with a crash at
stage 3 proves the relayout theory and validates the fix (pin the epoch
program's dataset-operand layout to the delivered one); a pass at BOTH
kills the theory and moves suspicion into the real epoch program's other
operands/temporaries.
"""

import os
import sys
import time

import numpy as np


def main():
    gb = float(sys.argv[1]) if len(sys.argv) > 1 else 8.15
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    batch = 16
    frame = (384, 512, 1)
    item = int(np.prod(frame))
    n = int(gb * 1e9 / item)

    import jax
    import jax.numpy as jnp
    from jax.experimental.layout import Format

    from spnet_tpu.parallel.mesh import chunked_device_put

    # deterministic cheap content, one random block for an integrity pin
    a = np.zeros((n,) + frame, np.uint8)
    rng = np.random.default_rng(0)
    a[n // 2] = rng.integers(0, 255, (1,) + frame).astype(np.uint8)

    t0 = time.time()
    dev = chunked_device_put(a)
    del a
    print(f"staged {gb} GB in {time.time() - t0:.1f}s "
          f"format={dev.format}", flush=True)

    w = jnp.zeros((frame[-1] * frame[0], 8), jnp.float32)
    idx_mat = jnp.asarray(
        np.random.default_rng(1).integers(0, n, (steps, batch)),
        jnp.int32)

    def epoch(x_all, idx_mat, w):
        def body(acc, idx):
            xb = x_all[idx].astype(jnp.float32) / 127.5 - 1.0
            # (b, h, w*c) @ (w*c*?, 8): touch the pixels like a stem would
            v = xb.reshape(batch, frame[1], -1) @ w
            return acc + v.sum(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), idx_mat)
        return acc

    lowered = jax.jit(epoch).lower(dev, idx_mat, w)
    compiled = lowered.compile()
    try:
        want = compiled.input_formats[0][0]
    except Exception as e:  # API drift guard
        want = f"<input_formats unavailable: {e}>"
    print(f"LAYOUT_INFO delivered={dev.format} wanted={want}", flush=True)

    if os.environ.get("SPNET_PROBE_SKIP_DEFAULT") != "1":
        t1 = time.time()
        val = float(compiled(dev, idx_mat, w))
        print(f"BIGLAYOUT_DEFAULT_OK {gb} val={val} "
              f"wall={time.time() - t1:.1f}s", flush=True)

    pinned = jax.jit(
        epoch,
        in_shardings=(Format(dev.format.layout, dev.sharding), None, None),
    )
    t2 = time.time()
    val = float(pinned(dev, idx_mat, w))
    print(f"BIGLAYOUT_PINNED_OK {gb} val={val} "
          f"wall={time.time() - t2:.1f}s", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
