"""Single-chip benchmark: training throughput on the flagship config.

Headline metric: images/sec/chip for the production training path — the
whole-epoch lax.scan program (forward + fused loss + backward + optimizer
+ on-device augmentation per step, minibatches gathered from a
device-resident dataset) on the Xception 331x331 grayscale detector, the
reference's Dataset A/C/D workload.  Baseline: the reference's best GPU
number, ~126.6 img/s on an RTX 2080 Ti (BASELINE.md; Titan X: 96.6).

Timing is to VALUE RETRIEVAL of the final step's loss (the loss of step N
depends on the chained train state of steps 1..N, so retrieving it bounds
the whole sequence; plain block_until_ready can acknowledge early through
remote-device relays and report physically impossible rates).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

BASELINE_IMG_PER_SEC = 126.6  # RTX 2080 Ti, BASELINE.md


def main(batch_size: int = 128, steps_per_epoch: int = 160,
         n_data: int = 2048, warmup_steps: int = 32) -> dict:
    # SPNET_BENCH_BS overrides the batch size (same total images timed)
    total_imgs = batch_size * steps_per_epoch
    batch_size = int(os.environ.get("SPNET_BENCH_BS", batch_size))
    steps_per_epoch = max(1, total_imgs // batch_size)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spnet_tpu.config import GridSpec, LossWeights, ModelConfig
    from spnet_tpu.data.dataset import synthetic_dataset
    from spnet_tpu.models.spnet import build_model
    from spnet_tpu.train.schedule import onecycle_schedule
    from spnet_tpu.train.state import create_train_state
    from spnet_tpu.train.steps import make_train_step

    grid = GridSpec()
    # SPNET_BENCH_PLANAR / SPNET_BENCH_FUSED = 0/1 override the stem
    # variant for A/B runs on the real chip; default is the shipped
    # ModelConfig default.
    over = {}
    planar_env = os.environ.get("SPNET_BENCH_PLANAR", "")
    if planar_env:
        over["stem_planar"] = planar_env == "1"
    fused_env = os.environ.get("SPNET_BENCH_FUSED", "")
    if fused_env:
        over["stem_fused"] = fused_env == "1"
    # SPNET_BENCH_DTYPE / SPNET_BENCH_BACKBONE_DTYPE: measure the mixed
    # -precision recipe (e.g. f32 stem+head, bf16 backbone) at the
    # production batch size
    dtype_env = os.environ.get("SPNET_BENCH_DTYPE", "")
    if dtype_env:
        over["compute_dtype"] = dtype_env
    bb_dtype_env = os.environ.get("SPNET_BENCH_BACKBONE_DTYPE", "")
    if bb_dtype_env:
        over["backbone_dtype"] = bb_dtype_env
    mc = ModelConfig(backbone="Xception", input_size=331, **over)
    model = build_model(mc, num_outputs=grid.num_outputs)

    rng = np.random.default_rng(0)
    # device-resident dataset: REAL synthetic ESPI frames with real grid
    # targets (the reference's Dataset-A workload), stored uint8
    ds = synthetic_dataset(n_data, grid, seed=0,
                           input_size=mc.input_size,
                           batch_size=batch_size)
    # the dataset is truncated to a multiple of batch_size; sample
    # indices from the frames that actually exist (an SPNET_BENCH_BS
    # that doesn't divide n_data would otherwise clamp-gather past the
    # end, silently oversampling the final frame)
    n_data = ds.x.shape[0]
    if n_data == 0:
        raise ValueError("batch_size larger than the benchmark dataset")
    x_all = jax.device_put(jnp.asarray(ds.x))
    y_all = jax.device_put(jnp.asarray(ds.y))

    sched = onecycle_schedule(4e-5, total_steps=100_000)
    state = create_train_state(
        model, jax.random.key(0),
        jnp.zeros((batch_size, mc.input_size, mc.input_size, 1)), sched,
    )
    # SPNET_BENCH_CARRY=1 enables the carried compute-dtype params.
    # Round-4 A/B on real TPU: carry ON 2747.5 vs OFF 2859.7 img/s —
    # XLA already fuses the per-use f32->bf16 converts, so eliminating
    # them buys nothing and the extra scan-carry tree costs 4%.  The
    # per-use-cast path is the production default.
    carry = (mc.compute_dtype
             if os.environ.get("SPNET_BENCH_CARRY", "0") == "1" else None)
    # SPNET_BENCH_PREGATHER=1: pre-permuted epoch copy instead of
    # in-scan minibatch gathers (A/B knob).  Round-5 sweep on the idle
    # chip (scripts/r5_mfu_sweep.py, docs/run_logs/r5_mfu.log): in-scan
    # gathers 3043.6 vs pregather 2998.0 img/s — the per-step
    # dynamic-slice gathers were never the wall, and the permuted epoch
    # copy only adds an HBM round-trip, so gathers are the default.
    # SPNET_BENCH_AUGMENT=0: diagnostic — how much of the step the
    # on-device augmentation costs (production keeps it on)
    epoch_step = make_train_step(
        model, LossWeights(), mc.loss_type, l2_reg=mc.l2_reg,
        augment=os.environ.get("SPNET_BENCH_AUGMENT", "1") == "1",
        indexed="epoch",
        carry_compute_params=carry,
        pregather=os.environ.get("SPNET_BENCH_PREGATHER", "0") == "1",
    )

    def idx_mat(seed, steps):
        r = np.random.default_rng(seed)
        return jnp.asarray(
            r.integers(0, n_data, (steps, batch_size)).astype(np.int32)
        )

    # warmup / compile (same scan length as the timed epoch so the timed
    # call hits the cache)
    state, losses = epoch_step(state, x_all, y_all,
                               idx_mat(1, steps_per_epoch),
                               jax.random.key(1))
    float(losses[-1])

    t0 = time.time()
    state, losses = epoch_step(state, x_all, y_all,
                               idx_mat(2, steps_per_epoch),
                               jax.random.key(2))
    final_loss = float(losses[-1])
    elapsed = time.time() - t0
    assert np.isfinite(final_loss), final_loss

    img_per_sec = batch_size * steps_per_epoch / elapsed
    return {
        "metric": "train_images_per_sec_per_chip",
        "value": round(img_per_sec, 2),
        "unit": "img/s (Xception 331x331 b%d, whole-epoch scan incl "
                "on-device augmentation)" % batch_size,
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 3),
    }


if __name__ == "__main__":
    print(json.dumps(main()))
