"""`spnet-evaluate` — score a trained model on a labeled dataset.

Argparse surface mirrors `/root/reference/evaluate_spnet.py:97-111`.
"""

from __future__ import annotations

import argparse

from spnet_tpu.cli.common import load_model_and_state
from spnet_tpu.data.dataset import build_dataset
from spnet_tpu.eval.evaluate import evaluate_network


def main(argv=None):
    p = argparse.ArgumentParser(
        description="tests network on test dataset",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("-w", "--weights", default="ckpt",
                   help="checkpoint directory")
    p.add_argument("-d", "--datapath", default="Test/")
    p.add_argument("-f", "--fraction", type=float, default=1.0)
    p.add_argument("-l", "--logdir", default="logs/Testing/")
    p.add_argument("-b", "--batch_size", type=int, default=16)
    p.add_argument("--no-map", action="store_true",
                   help="skip the (rasterized-IoU) mAP computation")
    p.add_argument("--tta", default="",
                   help="flip test-time-augmentation ensemble: comma-"
                        "separated views from {h,v,hv} (e.g. 'h,v,hv'); "
                        "empty = single direct sweep like the reference")
    args = p.parse_args(argv)

    cfg, model, state = load_model_and_state(args.weights)
    ds = build_dataset(
        args.datapath, cfg.grid, load_frac=args.fraction,
        batch_size=args.batch_size, shuffle=False,
        input_size=cfg.model.input_size or None,
    )
    evaluate_network(cfg, state, model, ds, log_dir=args.logdir,
                     compute_map=not args.no_map, tta=args.tta)

    # post-evaluation weights artifact (reference saves
    # `eval_end_weights.hdf5` after evaluating, evaluate_spnet.py:118-120)
    import os

    from spnet_tpu.io.checkpoint import save_checkpoint

    out_dir = os.path.join(args.logdir, "eval_end_weights")
    save_checkpoint(out_dir, state, cfg)
    print(f"eval-end weights + config saved to {out_dir}")


if __name__ == "__main__":
    main()
