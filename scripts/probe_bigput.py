#!/usr/bin/env python3
"""Isolate the >7 GB device_put TPU-worker crash (round-4 bisect).

Evidence so far: the 6.04 GB 384-run put is fine; the 8.05 GB
native-resolution put crashes the worker before the first epoch program
ever runs (tiny native-resolution runs pass, so it is not the model,
remat, augmentation, dtype, or the 512-wide shapes).  This probe does a
pure put+checksum at one size — NO model — so a crash pins the transfer
itself, and a pass moves suspicion back to the epoch program with big
resident operands.

Usage: python scripts/probe_bigput.py GB [chunked]
  GB       leading-dim sized so the uint8 array is ~GB gigabytes
  chunked  use parallel.mesh.chunked_device_put (2 GiB slices) instead
           of one monolithic jax.device_put

Prints BIGPUT_OK <GB> <mode> <checksum> on success; a worker crash kills
the process before that line.  Drive one size per process from a shell
loop with relay re-probes in between (scripts/debug_big.sh pattern).
"""

import sys
import time

import numpy as np


def main():
    gb = float(sys.argv[1])
    mode = sys.argv[2] if len(sys.argv) > 2 else "plain"
    frame = (384, 512)
    item = frame[0] * frame[1]
    n = int(gb * 1e9 / item)
    # deterministic but cheap content; one random block for integrity
    a = np.zeros((n,) + frame, np.uint8)
    rng = np.random.default_rng(0)
    blk = rng.integers(0, 255, (1,) + frame).astype(np.uint8)
    a[n // 2] = blk

    import jax
    import jax.numpy as jnp

    t0 = time.time()
    if mode == "chunked":
        from spnet_tpu.parallel.mesh import chunked_device_put

        dev = chunked_device_put(a)
    else:
        dev = jax.device_put(a)
    s = jax.jit(lambda x: jnp.sum(x.astype(jnp.int64)))(dev)
    val = int(s)
    expect = int(blk.astype(np.int64).sum())
    ok = "OK" if val == expect else f"CHECKSUM_MISMATCH(exp {expect})"
    print(f"BIGPUT_{ok} {gb} {mode} sum={val} "
          f"wall={time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
