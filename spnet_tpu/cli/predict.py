"""`spnet-predict` — label-free inference over a directory of frames.

Argparse surface mirrors `/root/reference/predict_spnet.py:100-115`.
"""

from __future__ import annotations

import argparse

from spnet_tpu.cli.common import load_model_and_state
from spnet_tpu.eval.predict import predict_network


def main(argv=None):
    p = argparse.ArgumentParser(
        description="predicts ellipses + ring counts on unlabeled images",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("-w", "--weights", default="ckpt",
                   help="checkpoint directory")
    p.add_argument("-d", "--datapath", required=True,
                   help="directory of *.png / *.bmp frames")
    p.add_argument("-f", "--fraction", type=float, default=1.0)
    p.add_argument("-l", "--logdir", default="logs/Predicting/")
    p.add_argument("-b", "--batch_size", type=int, default=16)
    args = p.parse_args(argv)

    cfg, model, state = load_model_and_state(args.weights)
    predict_network(
        cfg, state, model, args.datapath, log_dir=args.logdir,
        fraction=args.fraction, batch_size=args.batch_size,
    )


if __name__ == "__main__":
    main()
