"""`spnet_tpu export` — checkpoint -> self-contained StableHLO serving
artifact (io/export.py).  Beyond the reference's Python-process serving
(`/root/reference/predict_spnet.py:40-52`)."""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(
        description="export a trained checkpoint as a portable "
                    "StableHLO inference artifact",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("-w", "--weights", default="ckpt",
                   help="checkpoint directory")
    p.add_argument("-o", "--out", default="export",
                   help="output artifact directory")
    p.add_argument("-b", "--batch_size", type=int, default=0,
                   help="0 = symbolic batch dimension")
    p.add_argument("--platforms", default="",
                   help="comma list (e.g. tpu,cpu); empty = current")
    args = p.parse_args(argv)

    from spnet_tpu.io.export import export_predictor

    out = export_predictor(
        args.weights, args.out,
        batch_size=args.batch_size or None,
        platforms=tuple(s for s in args.platforms.split(",") if s)
        or None,
    )
    print(f"exported serving artifact to {out}")


if __name__ == "__main__":
    main()
