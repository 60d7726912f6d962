#!/usr/bin/env python3
"""The reference's movie workflow end-to-end: predict over a directory
of .bmp frames at large batch, with overlays + hawley CSV + FPS
(VERDICT r4 #6).

The reference extracts .bmp frames from a steelpan movie with ffmpeg
and chains `predict_spnet.py` over them
(`/root/reference/predict_spnet.py:57-87`, README.md:92-99).  No movie
file ships offline, so the frames here are synthetic ESPI renders
written as real 512x384 .bmp files — the same decode path, file
contract, and batch predict the movie recipe uses.

Uses the newest trained checkpoint available (refgen384 > native >
dataset-A).  Prints MOVIE_RESULT json.
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def render_bmp_frames(outdir: str, n: int = 512, seed: int = 31) -> int:
    """Render n synthetic frames at NATIVE 512x384 and save as .bmp
    (the movie-frame format; PIL encodes mode-L bmp)."""
    from PIL import Image

    from spnet_tpu.config import GridSpec
    from spnet_tpu.data.dataset import synthetic_dataset

    os.makedirs(outdir, exist_ok=True)
    existing = sorted(glob.glob(os.path.join(outdir, "*.bmp")))
    if len(existing) >= n:
        return 0
    ds = synthetic_dataset(n, GridSpec(), seed=seed, input_size=0,
                           uint8=True)
    t0 = time.time()
    for i in range(n):
        Image.fromarray(ds.x[i, :, :, 0], mode="L").save(
            os.path.join(outdir, f"frame_{i:06d}.bmp"))
    return time.time() - t0


def main():
    t0 = time.time()
    frames_dir = "logs/movie_frames"
    log_dir = "logs/movie_pred/"
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    # native-res (input_size=0) checkpoints predict at 512x384: b=512
    # would put ~6 GB of first-conv activations in HBM, so allow the
    # caller to size the batch to the checkpoint resolution
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    for ckpt in ("logs/refgen384_ck", "logs/r5_native_ck",
                 "logs/dataset_a_ckpt"):
        if os.path.exists(os.path.join(ckpt, "state")):
            break
    else:
        raise SystemExit("no trained checkpoint found")

    t_render = render_bmp_frames(frames_dir, n)
    print(f"frames ready in {t_render:.1f}s", flush=True)

    from spnet_tpu.cli.common import load_model_and_state
    from spnet_tpu.eval.predict import predict_network

    cfg, model, state = load_model_and_state(ckpt)
    print(f"checkpoint {ckpt}: {cfg.model.backbone} "
          f"input_size={cfg.model.input_size}", flush=True)
    t1 = time.time()
    preds, files = predict_network(
        cfg, state, model, frames_dir, log_dir=log_dir,
        batch_size=batch, num_draw=8, verbose=1,
    )
    wall = time.time() - t1

    csvs = sorted(glob.glob(os.path.join(log_dir, "*.csv")))
    overlays = sorted(glob.glob(os.path.join(log_dir, "*.png")))
    assert preds.shape[0] == len(files) == n, (preds.shape, len(files))
    assert csvs, "no prediction CSV written"
    assert overlays, "no overlay renders written"
    out = {
        "ckpt": ckpt,
        "frames": n,
        "bmp": True,
        "fps_incl_load": round(n / wall, 1),
        "csv": csvs[0],
        "overlays": len(overlays),
        "wall_s": round(time.time() - t0, 1),
    }
    print("MOVIE_RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
