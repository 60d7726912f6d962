"""Single-chip benchmark: training throughput on the flagship config.

Headline metric: images/sec/chip for the full fused train step (forward +
loss + backward + optimizer + on-device augmentation) on the Xception
331x331 grayscale detector — the reference's Dataset A/C/D workload.
Baseline: the reference's best GPU number, ~126.6 img/s on an RTX 2080 Ti
(BASELINE.md; Titan X was 96.6 img/s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

BASELINE_IMG_PER_SEC = 126.6  # RTX 2080 Ti, BASELINE.md


def main(batch_size: int = 32, steps: int = 20, warmup: int = 3) -> dict:
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
    mc = ModelConfig(backbone="Xception", input_size=331)
    model = build_model(mc, num_outputs=grid.num_outputs)

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(0, 0.5, (batch_size, mc.input_size, mc.input_size, 1))
        .astype(np.float32)
    )
    y = jnp.asarray(
        normalize(np.tile(grid.defaults.reshape(-1), (batch_size, 1)),
                  grid).astype(np.float32)
    )

    sched = onecycle_schedule(4e-5, total_steps=10_000)
    state = create_train_state(
        model, jax.random.key(0),
        jnp.zeros((batch_size, mc.input_size, mc.input_size, 1)), sched,
    )
    step = make_train_step(model, LossWeights(), mc.loss_type,
                           l2_reg=mc.l2_reg, augment=True)

    for i in range(warmup):
        state, metrics = step(state, x, y, jax.random.key(i))
    jax.block_until_ready(metrics["loss"])

    t0 = time.time()
    for i in range(steps):
        state, metrics = step(state, x, y, jax.random.key(100 + i))
    jax.block_until_ready(metrics["loss"])
    elapsed = time.time() - t0

    img_per_sec = batch_size * steps / elapsed
    return {
        "metric": "train_images_per_sec_per_chip",
        "value": round(img_per_sec, 2),
        "unit": "img/s (Xception 331x331 b%d, fused train step)"
                % batch_size,
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 3),
    }


if __name__ == "__main__":
    print(json.dumps(main()))
