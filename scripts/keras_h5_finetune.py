#!/usr/bin/env python3
"""Prove the Keras pretrained import works on a REAL weights FILE and
feeds a training run (VERDICT r4 #7).

The reference's MobileNet path loads imagenet weights through
keras.applications (`/root/reference/spnet/models.py:349-355`).  This
environment has no egress, so actual imagenet .h5 files are
unprocurable; what IS testable end-to-end — and was not, before this
script — is the FILE leg of the import: the round-4 parity tests all
passed in-memory keras Model objects to io/keras_import.py, never a
weights file.

Steps (one process: host TF for the file, then the TPU for training):
  1. build keras.applications.MobileNet(include_top=False) (seeded
     random init — the file format and layer set are identical to the
     imagenet release, which is what the loader must handle),
     save_weights -> .weights.h5
  2. load the FILE via io.keras_import.load_keras_backbone and pin
     flax-vs-keras forward parity through the whole backbone
  3. fine-tune 5 epochs from those weights via the production
     train_network path (ModelConfig.pretrained=<file>)

Prints KERAS_H5_RESULT json.  Match: models.py:349-355.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    t0 = time.time()
    path = "logs/keras_w/mobilenet_seeded.weights.h5"
    os.makedirs(os.path.dirname(path), exist_ok=True)

    # ---- 1. host-side: build + save the weights file -----------------
    import keras
    import tensorflow as tf

    tf.random.set_seed(7)
    keras.utils.set_random_seed(7)
    kmodel = keras.applications.MobileNet(
        include_top=False, weights=None, input_shape=(None, None, 3))
    kmodel.save_weights(path)
    size_mb = os.path.getsize(path) / 1e6
    print(f"saved {path} ({size_mb:.1f} MB)", flush=True)

    # ---- 2. import from the FILE + forward parity ---------------------
    from spnet_tpu.io.keras_import import load_keras_backbone

    bb_params, bb_stats = load_keras_backbone(path, "MobileNet")

    import jax
    import jax.numpy as jnp

    from spnet_tpu.models.mobilenet import MobileNet as FlaxMobileNet

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 96, 96, 3)).astype(np.float32)
    k_out = np.asarray(kmodel(x, training=False))
    fm = FlaxMobileNet(dtype=jnp.float32)
    f_out = np.asarray(jax.jit(
        lambda xx: fm.apply({"params": bb_params,
                             "batch_stats": bb_stats},
                            xx, train=False))(jnp.asarray(x)))
    rel = float(np.max(np.abs(f_out - k_out)) / (np.std(k_out) + 1e-9))
    print(f"file-import forward parity: max|Δ|/std = {rel:.2e}",
          flush=True)
    assert rel < 1e-3, rel

    # ---- 3. fine-tune 5 epochs from the file through the loop --------
    from spnet_tpu.config import (
        ExperimentConfig,
        GridSpec,
        ModelConfig,
        TrainConfig,
    )
    from spnet_tpu.data.dataset import synthetic_dataset
    from spnet_tpu.train.loop import train_network

    grid = GridSpec()
    cfg = ExperimentConfig(
        grid=grid,
        model=ModelConfig(backbone="MobileNet", input_size=331,
                          pretrained=path),
        train=TrainConfig(batch_size=32, epochs=5, lr_max=1e-4,
                          augment=True, blur_prob=0.0, seed=0,
                          save_every=10**9),
    )
    train_ds = synthetic_dataset(2048, grid, seed=5,
                                 input_size=331, batch_size=32)
    val_ds = synthetic_dataset(512, grid, seed=666,
                               input_size=331)
    state, model, history = train_network(
        cfg, train_ds, val_ds, log_dir="logs/keras_h5_ft",
        ckpt_dir=None, render_overlays=False, device_data=True,
        verbose=1,
    )
    out = {
        "weights_file": path,
        "file_mb": round(size_mb, 1),
        "forward_rel_err": rel,
        "losses": [h["train_loss"] for h in history],
        "loss_decreased": history[-1]["train_loss"]
        < history[0]["train_loss"],
        "wall_s": round(time.time() - t0, 1),
    }
    print("KERAS_H5_RESULT " + json.dumps(out, default=float), flush=True)


if __name__ == "__main__":
    main()
