#!/usr/bin/env python3
"""Diagnose the ring-accuracy gap: evaluate one checkpoint on (a) the
blurred val set it trained with, (b) the same scenes rendered WITHOUT
blur (the reference's effective behavior — its generator blur is a
no-op, gen_fake_espi.py:257).  A large (b) - (a) gap confirms blur as
the difficulty delta vs the reference's Dataset A.

Usage: python scripts/eval_blur_split.py <ckpt_dir> [n_val]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ckpt = sys.argv[1]
    n_val = int(sys.argv[2]) if len(sys.argv) > 2 else 4992

    from spnet_tpu.cli.common import load_model_and_state
    from spnet_tpu.data.dataset import synthetic_dataset
    from spnet_tpu.eval.evaluate import evaluate_network

    cfg, model, state = load_model_and_state(ckpt)

    for label, blur in (("blurred(30%)", True), ("blur-free", False)):
        print(f"rendering val ({label})...", flush=True)
        ds = synthetic_dataset(n_val, cfg.grid, seed=777777,
                               input_size=cfg.model.input_size, blur=blur)
        res = evaluate_network(cfg, state, model, ds,
                               log_dir="/tmp/blur_split_eval",
                               num_draw=0, compute_map=False, verbose=1)
        print("BLUR_SPLIT " + json.dumps({"val": label, **{
            k: res[k] for k in ("ring_acc", "class_acc",
                                "mean_pix_err")}}, default=float),
            flush=True)


if __name__ == "__main__":
    main()
