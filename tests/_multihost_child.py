"""Child process for tests/test_multihost.py (underscore: not collected).

Runs ONE process of a 2-process jax.distributed CPU job: initializes the
runtime through spnet_tpu.parallel.multihost, builds the global mesh
over BOTH processes' virtual devices, feeds its own local data shard
through host_to_global, and trains a real 2-epoch tiny run through
train_network — the exact multi-host entry path the CLIs use.

Usage: python _multihost_child.py <process_id> <port> <workdir>
Prints MH_RESULT {json} on success; the parent asserts both processes
report identical losses (the SPMD program is global, so every process
must compute the same numbers).
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    pid, port, workdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]

    from spnet_tpu.parallel.multihost import (
        host_to_global,
        is_multiprocess,
        maybe_initialize,
        process_shard,
    )

    assert maybe_initialize(coordinator=f"localhost:{port}",
                            num_processes=2, process_id=pid)
    assert is_multiprocess()
    assert process_shard() == (pid, 2)
    assert len(jax.devices()) == 8, len(jax.devices())
    assert jax.local_device_count() == 4

    import numpy as np

    from spnet_tpu.config import (
        ExperimentConfig,
        GridSpec,
        ModelConfig,
        TrainConfig,
    )
    from spnet_tpu.data.dataset import Dataset
    from spnet_tpu.grid import batch_ellipses_to_grid, normalize
    from spnet_tpu.train.loop import train_network

    grid = GridSpec()

    def local_shard(n_local: int, seed: int) -> Dataset:
        """Per-process local data — DIFFERENT on each process (the
        whole point of sharded loading), deterministic in seed."""
        rng = np.random.default_rng(seed)
        x = rng.integers(0, 256, (n_local, 64, 64, 1), np.uint8)
        recs = []
        for _ in range(n_local):
            cx = float(rng.uniform(100, 400))
            cy = float(rng.uniform(80, 300))
            recs.append(np.array(
                [[cx, cy, 50, 30, 1.0, 0.0, 0, 3]], np.float32))
        y = normalize(batch_ellipses_to_grid(recs, grid),
                      grid).astype(np.float32)
        return Dataset(x=x, y=y,
                       file_list=[f"mh://{seed}/{i}"
                                  for i in range(n_local)],
                       grid=grid)

    # 32 global train frames (16 local), 16 global val (8 local)
    train_ds = local_shard(16, seed=100 + pid)
    val_ds = local_shard(8, seed=200 + pid)

    cfg = ExperimentConfig(
        grid=grid,
        model=ModelConfig(backbone="MobileNetTiny", input_size=64,
                          compute_dtype="float32"),
        train=TrainConfig(batch_size=8, epochs=2, lr_max=2e-3,
                          augment=False, save_every=10**9, seed=0),
    )
    state, model, history = train_network(
        cfg, train_ds, val_ds, log_dir=os.path.join(workdir, f"p{pid}"),
        ckpt_dir=None, render_overlays=False, verbose=0,
    )
    out = {
        "pid": pid,
        "losses": [h["train_loss"] for h in history],
        "val_total": history[-1]["val_comps"]["total"],
        "step": int(state.step),
    }
    print("MH_RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
