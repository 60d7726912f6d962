#!/usr/bin/env python3
"""Discriminate the full-scale native-resolution ('big') worker crash.

Round-4 state of the bisect (NOTES.md sessions 4-7):
  * chunked 8.5 GB put + jitted checksum      -> PASSES (probe_bigput)
  * 8-step scan-gather+dot over 8.15 GB, both
    default and pinned input layouts          -> PASSES (probe_biglayout)
  * REAL 2,560-step training epoch, 8.15 GB,
    pinned or not                             -> CRASHES at 1st retrieval
  * the same real epoch at 6.04/6.78 GB (384) -> PASSES (the long runs)

So neither residency nor layout alone kills it; the crash needs the
REAL train-step program AND full scale.  Two variables remain: the
program (Xception fwd+bwd+Adam vs a toy dot) and the scan LENGTH
(2,560 steps vs 8).  This probe runs the real model + the production
epoch train step over a configurable (GB, steps) grid so one run pins
the wall to a quadrant:

  real-step + short scan crash  => program working-set at scale
                                   (compile-time HBM accounting vs the
                                   resident operand; try remat/exact HLO
                                   diff next)
  real-step + short scan pass,
  long scan crash               => scan-length/duration dependent
                                   (relay/DMA queue depth; try unroll=1
                                   chunked idx dispatch)

Usage: python scripts/probe_bigprog.py [GB] [steps] [batch]
Prints BIGPROG_OK <GB> <steps> on success (crash = the worker dies
before the line).  Match: the failing runs in
docs/run_logs/ -> /tmp/r4_big_long.log (queue14/15/16).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    gb = float(sys.argv[1]) if len(sys.argv) > 1 else 8.15
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    frame = (384, 512, 1)
    item = int(np.prod(frame))
    n = int(gb * 1e9 / item)

    import jax
    import jax.numpy as jnp

    from spnet_tpu.config import GridSpec, LossWeights, ModelConfig
    from spnet_tpu.grid import normalize
    from spnet_tpu.models.spnet import build_model
    from spnet_tpu.parallel.mesh import chunked_device_put
    from spnet_tpu.train.schedule import onecycle_schedule
    from spnet_tpu.train.state import create_train_state
    from spnet_tpu.train.steps import make_train_step

    grid = GridSpec()
    cfg = ModelConfig(backbone="Xception", input_size=0,
                      compute_dtype="float32",
                      backbone_dtype="bfloat16", remat=True)
    model = build_model(cfg, num_outputs=grid.num_outputs)
    sched = onecycle_schedule(4e-5, total_steps=max(steps, 2))
    state = create_train_state(
        model, jax.random.key(0),
        jnp.zeros((batch,) + frame, jnp.float32), sched)
    print(f"model ready; staging {gb} GB ({n} frames)...", flush=True)

    x = np.zeros((n,) + frame, np.uint8)
    x[n // 2] = np.random.default_rng(0).integers(
        0, 255, (1,) + frame).astype(np.uint8)
    t0 = time.time()
    x_all = chunked_device_put(x)
    del x
    y_all = jax.device_put(jnp.asarray(normalize(
        np.tile(grid.defaults.reshape(-1), (n, 1)), grid
    ).astype(np.float32)))
    print(f"staged in {time.time() - t0:.1f}s", flush=True)

    idx_mat = jnp.asarray(np.random.default_rng(1).integers(
        0, n, (steps, batch)), jnp.int32)
    # the production big-run configuration: indexed epoch scan,
    # pregather=False (the in-scan gather path the 384/native runs use)
    epoch_step = make_train_step(model, LossWeights(), "same",
                                 l2_reg=1e-4, augment=True,
                                 indexed="epoch", pregather=False)
    t1 = time.time()
    state, losses = epoch_step(state, x_all, y_all, idx_mat,
                               jax.random.key(1))
    loss = float(losses[-1])
    print(f"BIGPROG_OK {gb} {steps} loss={loss:.5f} "
          f"wall={time.time() - t1:.1f}s", flush=True)


if __name__ == "__main__":
    main()
