#!/usr/bin/env python3
"""Learning-dynamics sanity run on real hardware: train the flagship
config on in-memory synthetic data and confirm the accuracy metrics climb
(the reference's own validation methodology — train on generated data
with known labels, README.md:49-62).

Usage: python scripts/sanity_train.py [n_frames] [epochs]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from spnet_tpu.config import (
    ExperimentConfig,
    GridSpec,
    ModelConfig,
    TrainConfig,
)
from spnet_tpu.data.dataset import synthetic_dataset
from spnet_tpu.train.loop import train_network


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    backbone = sys.argv[3] if len(sys.argv) > 3 else "Xception"
    lr_max = float(sys.argv[4]) if len(sys.argv) > 4 else 2e-4
    n_val = int(sys.argv[5]) if len(sys.argv) > 5 else 256

    cfg = ExperimentConfig(
        grid=GridSpec(),
        model=ModelConfig(backbone=backbone, input_size=331),
        train=TrainConfig(batch_size=32, epochs=epochs, lr_max=lr_max,
                          augment=True, save_every=1000, seed=0),
    )
    t0 = time.time()
    print(f"generating {n_frames} synthetic frames...")
    train_ds = synthetic_dataset(n_frames, cfg.grid, seed=0,
                                 input_size=cfg.model.input_size,
                                 batch_size=cfg.train.batch_size)
    val_ds = synthetic_dataset(n_val, cfg.grid, seed=777777,
                               input_size=cfg.model.input_size)
    print(f"  data ready in {time.time() - t0:.1f}s  "
          f"train {train_ds.x.shape}  val {val_ds.x.shape}")

    ckpt = os.environ.get("SPNET_CKPT", "") or None
    state, model, history = train_network(
        cfg, train_ds, val_ds, log_dir="logs/sanity",
        ckpt_dir=ckpt, render_overlays=False, verbose=1,
    )
    out = {
        "first": history[0], "last": history[-1],
        "wall_s": round(time.time() - t0, 1),
    }
    if os.environ.get("SPNET_MAP", "0") == "1":
        from spnet_tpu.eval.evaluate import evaluate_network

        res = evaluate_network(cfg, state, model, val_ds,
                               log_dir="logs/sanity_eval/",
                               num_draw=0, verbose=1)
        out["final_eval"] = res
    print(json.dumps(out, default=float))


if __name__ == "__main__":
    main()
