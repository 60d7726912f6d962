"""`spnet-train` — train, then evaluate, then (optionally) predict.

Argparse surface mirrors the reference (`/root/reference/train_spnet.py:
96-112`): batch 16, epochs 100, grid 6x6x2, lr_max 4e-5, fraction,
freeze_fac/frozen_epochs, seed, --noaugment, --name; plus backbone /
loss-type / dtype selection.  After training it chains evaluation on
Test/ (fallback Val/) like `train_spnet.py:131-138`.
"""

from __future__ import annotations

import argparse
import os
import sys

from spnet_tpu.cli.common import (
    add_model_args,
    config_from_args,
    parse_grid,
    timestamped_log_dir,
)
from spnet_tpu.data.dataset import build_dataset
from spnet_tpu.eval.evaluate import evaluate_network
from spnet_tpu.train.loop import train_network


def main(argv=None):
    p = argparse.ArgumentParser(
        description="trains network on training dataset",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("-b", "--batch_size", type=int, default=16)
    p.add_argument("-d", "--datapath", default="./",
                   help="directory with Train/ and Val/ subdirs")
    p.add_argument("-e", "--epochs", type=int, default=100)
    p.add_argument("-f", "--fraction", type=float, default=1.0)
    p.add_argument("--freeze_fac", type=float, default=0.0)
    p.add_argument("--frozen_epochs", type=int, default=0)
    p.add_argument("-g", "--grid", type=parse_grid, default=(6, 6, 2),
                   help="predictor grid, e.g. 6x6x2")
    p.add_argument("-w", "--weights", default="ckpt",
                   help="checkpoint directory (auto-resume if present)")
    p.add_argument("-l", "--lrmax", type=float, default=4e-5)
    p.add_argument("-n", "--noaugment", action="store_true")
    p.add_argument("--blur_prob", type=float, default=0.0,
                   help="train-time Gaussian-blur probability (the "
                        "reference's train-time blur is a silent no-op, "
                        "so 0 matches its effective recipe)")
    p.add_argument("--geo_augment", action="store_true",
                   help="train-time geometric augmentation (random "
                        "flip/rotate/translate with on-device label "
                        "re-encode) — replaces offline augment-preproc "
                        "dataset inflation")
    p.add_argument("--epoch_repeats", type=int, default=1,
                   help="shuffled passes over the training set per epoch "
                        "program / per val sweep (>1 amortizes the "
                        "per-epoch val sweep for tiny datasets trained "
                        "many passes, e.g. with --geo_augment in place "
                        "of offline 42x inflation)")
    p.add_argument("--use_tb", action="store_true",
                   help="emit TensorBoard event files (scalars + overlay "
                        "image summaries) into <logdir>/tb")
    p.add_argument("--name", default="")
    p.add_argument("-r", "--random_seed", type=int, default=1)
    p.add_argument("--no-eval", action="store_true",
                   help="skip the post-training evaluation")
    p.add_argument("--predict_dir", default="",
                   help="after evaluation, run label-free prediction over "
                        "this directory (the reference chains predict "
                        "over Zooniverse data, train_spnet.py:141-143); "
                        "skipped when empty or missing")
    p.add_argument("--drop-overflow", action="store_true",
                   help="tolerate >preds_per_cell ellipses in a grid "
                        "cell (drop extras) instead of failing")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler device trace of the run "
                        "into <logdir>/profile")
    add_model_args(p)
    args = p.parse_args(argv)

    print("Command line ~= \n", " ".join(sys.argv))
    print("args = ", args)

    # multi-host entry: initialize the distributed runtime when this
    # process is part of a multi-host job (SPNET_COORDINATOR /
    # JAX_COORDINATOR_ADDRESS / SPNET_DIST=1; no-op otherwise), then
    # load only this host's disjoint file shard — the loop assembles
    # the global device-resident arrays from the per-host shards
    # (parallel/multihost.py).
    from spnet_tpu.parallel.multihost import maybe_initialize, process_shard

    maybe_initialize()
    shard_i, shard_n = process_shard()

    cfg = config_from_args(args, args.grid)
    log_dir = timestamped_log_dir(args.name)
    print("Logging to", log_dir)
    if shard_n > 1:
        print(f"multi-host: process {shard_i}/{shard_n}, "
              f"file shard {shard_i} of {shard_n}")

    ovf = "drop" if args.drop_overflow else "raise"
    train_ds = build_dataset(
        os.path.join(args.datapath, "Train"), cfg.grid,
        load_frac=args.fraction, batch_size=args.batch_size,
        input_size=cfg.model.input_size or None, seed=args.random_seed,
        on_overflow=ovf, shard_index=shard_i, num_shards=shard_n,
    )
    val_ds = build_dataset(
        os.path.join(args.datapath, "Val"), cfg.grid,
        batch_size=args.batch_size, shuffle=False,
        input_size=cfg.model.input_size or None, on_overflow=ovf,
        shard_index=shard_i, num_shards=shard_n,
    )

    if args.profile:
        from spnet_tpu.utils.profiling import trace

        with trace(os.path.join(log_dir, "profile")):
            state, model, history = train_network(
                cfg, train_ds, val_ds, log_dir=log_dir,
                ckpt_dir=args.weights,
            )
    else:
        state, model, history = train_network(
            cfg, train_ds, val_ds, log_dir=log_dir, ckpt_dir=args.weights,
        )

    if not args.no_eval:
        print("\n----------------------------\nStarting model evaluation...")
        testpath = os.path.join(args.datapath, "Test")
        if not os.path.isdir(testpath):
            testpath = os.path.join(args.datapath, "Val")
        test_ds = build_dataset(
            testpath, cfg.grid, batch_size=args.batch_size, shuffle=False,
            input_size=cfg.model.input_size or None,
        )
        evaluate_network(cfg, state, model, test_ds,
                         log_dir="logs/Evaluation/")

    # chain label-free prediction over real data (reference
    # `train_spnet.py:141-143` predicts over the Zooniverse set)
    if args.predict_dir:
        if os.path.isdir(args.predict_dir):
            print("\n----------------------------\n"
                  "Starting prediction...")
            from spnet_tpu.eval.predict import predict_network

            predict_network(cfg, state, model, args.predict_dir,
                            log_dir=os.path.join(log_dir, "predict") +
                            os.sep, batch_size=args.batch_size)
        else:
            print(f"(predict skipped: {args.predict_dir} not found)")

    # final artifacts into the log dir (reference `train_spnet.py:145-152`
    # saves final weights + whole model and copies them alongside the logs;
    # here the checkpoint carries weights AND config)
    from spnet_tpu.io.checkpoint import save_checkpoint

    final_dir = os.path.join(log_dir, "final_weights")
    save_checkpoint(final_dir, state, cfg)
    print(f"Final weights + config saved to {final_dir}")
    print("SPNet-TPU execution completed.")


if __name__ == "__main__":
    main()
