"""Shared CLI plumbing: config assembly from flags, checkpoint loading."""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp

from spnet_tpu.config import (
    ExperimentConfig,
    GridSpec,
    ModelConfig,
    TrainConfig,
)
from spnet_tpu.io.checkpoint import load_checkpoint
from spnet_tpu.models.spnet import build_model


def parse_grid(s: str) -> tuple[int, int, int]:
    """'6x6x2' -> (6, 6, 2) (reference `train_spnet.py:118`)."""
    parts = [int(v) for v in s.split("x")]
    if len(parts) != 3:
        raise argparse.ArgumentTypeError("grid must look like 6x6x2")
    return tuple(parts)


def add_model_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--backbone", default="Xception",
                   choices=["Xception", "MobileNet", "MobileNetTiny",
                            "InceptionResNetV2", "NASNetMobile",
                            "DarkNet19"],
                   help="CNN backbone")
    p.add_argument("--loss_type", default="same",
                   choices=["same", "hybrid"],
                   help="'same' = MSE existence, 'hybrid' = BCE logits")
    p.add_argument("--input_size", type=int, default=331,
                   help="square input resolution; 0 = no resize, native "
                        "512x384 frames (the reference's 'big' mode)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="compute dtype")
    p.add_argument("--backbone_dtype", default="",
                   choices=["", "bfloat16", "float32"],
                   help="override the BACKBONE's compute dtype (mixed "
                        "precision: --dtype float32 --backbone_dtype "
                        "bfloat16 keeps the stem/head/BN in f32 while "
                        "the backbone rides the MXU in bf16); empty = "
                        "same as --dtype")
    p.add_argument("--pretrained", default="",
                   help="path to Keras pretrained backbone weights "
                        "(.h5/.keras; MobileNet, Xception, "
                        "InceptionResNetV2 or NASNetMobile); empty = "
                        "from scratch")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize backbone activations (trade "
                        "recompute for HBM; for big batches / 'big' mode)")


def config_from_args(args, grid_tuple=(6, 6, 2)) -> ExperimentConfig:
    nx, ny, preds = grid_tuple
    return ExperimentConfig(
        grid=GridSpec(nx=nx, ny=ny, preds_per_cell=preds),
        model=ModelConfig(
            backbone=getattr(args, "backbone", "Xception"),
            input_size=getattr(args, "input_size", 331),
            loss_type=getattr(args, "loss_type", "same"),
            compute_dtype=getattr(args, "dtype", "bfloat16"),
            backbone_dtype=getattr(args, "backbone_dtype", ""),
            pretrained=getattr(args, "pretrained", ""),
            remat=getattr(args, "remat", False),
        ),
        train=TrainConfig(
            batch_size=getattr(args, "batch_size", 16),
            epochs=getattr(args, "epochs", 100),
            lr_max=getattr(args, "lrmax", 4e-5),
            freeze_fac=getattr(args, "freeze_fac", 0.0),
            frozen_epochs=getattr(args, "frozen_epochs", 0),
            fraction=getattr(args, "fraction", 1.0),
            seed=getattr(args, "random_seed", 1),
            augment=not getattr(args, "noaugment", False),
            blur_prob=getattr(args, "blur_prob", 0.0),
            geo_augment=getattr(args, "geo_augment", False),
            epoch_repeats=getattr(args, "epoch_repeats", 1),
            use_tb=getattr(args, "use_tb", False),
        ),
    )


class InferenceState:
    """Lightweight params/batch_stats holder for evaluate/predict — no
    model re-initialization, no optimizer (the checkpoint already has
    everything needed)."""

    def __init__(self, params, batch_stats, step):
        self.params = params
        self.batch_stats = batch_stats
        self.step = step


def load_model_and_state(ckpt_dir: str):
    """Rebuild model + state from a checkpoint directory (the 'whole
    model load' path — config travels with the weights)."""
    payload, cfg = load_checkpoint(ckpt_dir)
    model = build_model(cfg.model, num_outputs=cfg.grid.num_outputs)
    # device_put ONCE: Orbax hands back host numpy arrays, and a jitted
    # predict called with numpy params re-transfers the whole ~80 MB
    # param tree EVERY call — through the device tunnel that throttled
    # batched eval to ~50 FPS (vs ~3000 for the in-train val sweep
    # whose params already lived in HBM).
    state = InferenceState(
        params=jax.device_put(payload["params"]),
        batch_stats=jax.device_put(payload["batch_stats"]),
        step=jnp.asarray(payload["step"]),
    )
    return cfg, model, state


def timestamped_log_dir(name: str = "") -> str:
    now = time.strftime("%c").replace("  ", "_").replace(" ", "_")
    base = "./logs/"
    return base + (name + "_" + now if name else now)
