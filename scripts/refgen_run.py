#!/usr/bin/env python3
"""Train the exact Dataset-A recipe on REFERENCE-GENERATOR frames.

The round-4 decisive experiment (VERDICT.md missing #1): round 3's
residual ~1.1-pt ring-acc gap vs the reference's 96.5 % was *attributed*
to cross-generator ambiguity (our frames are an analytic
re-implementation; theirs are cv2 rasterizations) but never proven.
This trains + evaluates the exact recipe (b=16, lr_max 4e-5, f32,
glorot, eps 1e-7, blur-free) on frames produced by
scripts/refgen_dataset.py — a host-side clone of the reference's own
cv2 drawing pipeline (`/root/reference/gen_fake_espi.py:145-277`).

ring-acc ~96+ % here closes the parity question (the gap was the data);
ring-acc ~95.4 % (same as our generator) breaks the attribution and
points back at training.

Usage: python scripts/refgen_run.py [epochs] [batch] [lr_max] [dtype]
                                    [input_size]
Expects shards in logs/refgen_cache/ at the requested input_size (run
refgen_dataset.py first).  SPNET_BACKBONE_DTYPE selects the §2e mixed
split (f32 stem+head, bf16 backbone); SPNET_CKPT / SPNET_LOGDIR as in
dataset_a_run.py.
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from spnet_tpu.config import (
    ExperimentConfig,
    GridSpec,
    ModelConfig,
    TrainConfig,
)
from spnet_tpu.data.dataset import Dataset
from spnet_tpu.grid import batch_ellipses_to_grid, canonicalize_records, \
    normalize


def load_refgen(n_train: int, n_val: int, grid: GridSpec, size: int = 331,
                seed: int = 0):
    paths = sorted(glob.glob(
        f"logs/refgen_cache/refgen_s{seed}_i{size}_*.npz"))
    if not paths:
        raise FileNotFoundError("no refgen shards; run "
                                "scripts/refgen_dataset.py first")
    xs, rows_l, mask_l = [], [], []
    total = 0
    for p in paths:
        z = np.load(p)
        xs.append(z["x"])
        rows_l.append(z["rows"])
        mask_l.append(z["mask"])
        total += z["x"].shape[0]
        if total >= n_train + n_val:
            break
    x = np.concatenate(xs)[: n_train + n_val]
    rows = np.concatenate(rows_l)[: n_train + n_val]
    mask = np.concatenate(mask_l)[: n_train + n_val]
    if x.shape[0] < n_train + n_val:
        raise ValueError(f"only {x.shape[0]} refgen frames on disk, "
                         f"need {n_train + n_val}")

    recs = [canonicalize_records(r[m]) for r, m in zip(rows, mask)]
    # cells can overflow the reference's 2 predictor slots (its own
    # encoder would hard-assert there; 'drop' keeps the first two like
    # the reference's sort order) — report how often
    from spnet_tpu.grid import GridOverflowError, ellipses_to_grid

    n_over = 0
    for rec in recs:
        try:
            ellipses_to_grid(rec, grid, "raise")
        except GridOverflowError:
            n_over += 1
    print(f"  grid-slot overflow frames: {n_over}/{len(recs)} "
          f"({100.0 * n_over / len(recs):.2f}%)", flush=True)
    flat = batch_ellipses_to_grid(recs, grid, on_overflow="drop")
    y = normalize(flat, grid).astype(np.float32)

    def mk(sl, tag):
        return Dataset(
            x=x[sl], y=y[sl],
            file_list=[f"refgen://{tag}/{i}" for i in range(len(x[sl]))],
            grid=grid, rows=rows[sl], row_mask=mask[sl],
        )

    return mk(slice(0, n_train), "train"), \
        mk(slice(n_train, n_train + n_val), "val")


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    lr_max = float(sys.argv[3]) if len(sys.argv) > 3 else 4e-5
    dtype = sys.argv[4] if len(sys.argv) > 4 else "float32"
    input_size = int(sys.argv[5]) if len(sys.argv) > 5 else 331
    n_train, n_val = 40960, 4992

    cfg = ExperimentConfig(
        grid=GridSpec(),
        model=ModelConfig(backbone="Xception", input_size=input_size,
                          compute_dtype=dtype,
                          backbone_dtype=os.environ.get(
                              "SPNET_BACKBONE_DTYPE", ""),
                          remat=(os.environ.get("SPNET_REMAT") == "1"
                                 or (input_size == 0
                                     and os.environ.get("SPNET_REMAT")
                                     != "0"))),
        train=TrainConfig(batch_size=batch, epochs=epochs, lr_max=lr_max,
                          augment=True, blur_prob=0.0, save_every=10,
                          seed=0),
    )
    t0 = time.time()
    train_ds, val_ds = load_refgen(n_train, n_val, cfg.grid,
                                   size=input_size)
    print(f"refgen data ready in {time.time() - t0:.1f}s  "
          f"train {train_ds.x.shape} val {val_ds.x.shape}", flush=True)

    from spnet_tpu.train.loop import train_network

    ckpt = os.environ.get("SPNET_CKPT", "") or None
    logdir = os.environ.get("SPNET_LOGDIR", "") or "logs/refgen_run"
    state, model, history = train_network(
        cfg, train_ds, val_ds, log_dir=logdir, ckpt_dir=ckpt,
        render_overlays=False, device_data=True, verbose=1,
    )
    tail = history[-10:]
    out = {
        "last": history[-1] if history else None,
        "last10_ring_acc": (sum(h["ring_acc"] for h in tail) / len(tail)
                            if tail else None),
        "wall_s": round(time.time() - t0, 1),
    }

    from spnet_tpu.eval.evaluate import evaluate_network

    res = evaluate_network(cfg, state, model, val_ds,
                           log_dir=logdir.rstrip("/") + "_eval/",
                           num_draw=0, verbose=1)
    out["final_eval"] = res
    print("REFGEN_RESULT " + json.dumps(out, default=float), flush=True)


if __name__ == "__main__":
    main()
