#!/usr/bin/env python3
"""Capture a device trace of the production train step and print the
top ops by self time (offline xplane parsing via
tensorboard_plugin_profile) — identifies where the 331x331 Xception step
spends its time on the TPU.

Usage: python scripts/profile_step.py [batch]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128

    import jax
    import jax.numpy as jnp
    import numpy as np

    from spnet_tpu.config import GridSpec, LossWeights, ModelConfig
    from spnet_tpu.grid import normalize
    from spnet_tpu.models.spnet import build_model
    from spnet_tpu.train.schedule import onecycle_schedule
    from spnet_tpu.train.state import create_train_state
    from spnet_tpu.train.steps import make_train_step

    grid = GridSpec()
    mc = ModelConfig(
        backbone="Xception", input_size=331,
        stem_fused=os.environ.get("SPNET_BENCH_FUSED", "") == "1",
    )
    model = build_model(mc, num_outputs=grid.num_outputs)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256,
                                 (batch, 331, 331, 1), np.uint8))
    y = jnp.asarray(normalize(
        np.tile(grid.defaults.reshape(-1), (batch, 1)), grid
    ).astype(np.float32))
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((batch, 331, 331, 1)),
        onecycle_schedule(4e-5, 1000),
    )
    step = make_train_step(model, LossWeights(), "same", l2_reg=1e-4,
                           augment=True)
    # compile + warm
    state, m = step(state, x, y, jax.random.key(0))
    float(m["loss"])

    logdir = "/tmp/spnet_profile"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for i in range(5):
        state, m = step(state, x, y, jax.random.key(i + 1))
    float(m["loss"])
    jax.profiler.stop_trace()

    # ---- parse xplane ----
    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not files:
        print("no xplane files captured")
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(files, "framework_op_stats", {})
    import gzip
    import io

    # data is gzipped CSV for op stats in some versions; handle str too
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data).decode()
        except OSError:
            data = data.decode()
    print(data[:6000])


if __name__ == "__main__":
    main()
