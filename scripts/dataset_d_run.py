#!/usr/bin/env python3
"""Dataset-D-shaped small-data experiment: on-the-fly geometric
augmentation vs the reference's offline 42x inflation.

The reference's Dataset-D workflow trains on a tiny labeled set
inflated 42x on disk by `augment_preproc.py`
(`/root/reference/augment_preproc.py:103`, `log_DatasetD_*.txt`) —
42 flip/rotate/translate variants of every frame, written out as PNGs
and reloaded.  spnet_tpu's TPU-first replacement is `--geo_augment`:
the same warp family applied in-step on device WITH on-device label
re-encode (train/steps.py, ops/augment.py, ops/grid_encode.py), so the
dataset on disk stays 1x.

This script runs BOTH on the same 1,280-frame synthetic set at an
equal images-SEEN budget and reports accuracy + wall-clock (including
the offline path's inflation time — that cost is the point):

  offline:    1,280 frames -> 42x inflation on disk (53,760+orig)
              -> E epochs of the inflated set
  on-the-fly: 1,280 frames, geo_augment, 42*(E+... ) epochs matched to
              the same total images

Usage: python scripts/dataset_d_run.py [n_train] [epochs_offline]
Writes DATASET_D_RESULT json line.
"""

import json
import os
import shutil
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


def run_one(cfg, train_ds, val_ds, tag):
    from spnet_tpu.eval.evaluate import evaluate_network
    from spnet_tpu.train.loop import train_network

    t0 = time.time()
    # device_data=None: let the HBM budget pick resident vs chunked —
    # forcing True here OOMed the 42x-inflated arm when frames were
    # still float32 (24.5 GB of arguments on a 16 GB chip)
    state, model, history = train_network(
        cfg, train_ds, val_ds, log_dir=f"logs/dataset_d_{tag}",
        ckpt_dir=None, render_overlays=False, device_data=None,
        verbose=1,
    )
    wall = time.time() - t0
    res = evaluate_network(cfg, state, model, val_ds,
                           log_dir=f"logs/dataset_d_{tag}_eval/",
                           num_draw=0, verbose=1)
    return {"tag": tag, "train_wall_s": round(wall, 1),
            "ring_acc": res["ring_acc"], "class_acc": res["class_acc"],
            "mAP": res.get("mAP"), "pix_err": res["mean_pix_err"],
            "epochs": cfg.train.epochs,
            "imgs_seen": cfg.train.epochs * train_ds.x.shape[0]}


def main():
    # --arm onthefly [--rep N] reruns just the geo-augment arm (e.g. to
    # re-measure its wall-clock at matched val cadence) against the
    # already-recorded offline row; --rep pins epoch_repeats so the
    # images-seen budget matches that recorded run without rebuilding
    # the 42x-inflated directory.
    argv = list(sys.argv[1:])
    arm, rep_pin = "both", None
    if "--arm" in argv:
        i = argv.index("--arm")
        if i + 1 >= len(argv):
            raise SystemExit("--arm needs a value: both|offline|onthefly")
        arm = argv[i + 1]
        if arm not in ("both", "offline", "onthefly"):
            raise SystemExit(f"unknown --arm {arm!r}: "
                             "both|offline|onthefly")
        del argv[i:i + 2]
    if "--rep" in argv:
        i = argv.index("--rep")
        if i + 1 >= len(argv):
            raise SystemExit("--rep needs an integer value")
        rep_pin = int(argv[i + 1])
        del argv[i:i + 2]
    n_train = int(argv[0]) if len(argv) > 0 else 1280
    ep_off = int(argv[1]) if len(argv) > 1 else 12
    n_augs = 42
    n_val = 640
    batch = 16
    lr = 4e-5

    workdir = "logs/dataset_d_data"
    grid = GridSpec()

    from spnet_tpu.cli import augment_preproc, gen_fake_espi
    from spnet_tpu.data.dataset import build_dataset

    t_gen0 = time.time()
    if not os.path.exists(f"{workdir}/Train"):
        os.makedirs(f"{workdir}/Train", exist_ok=True)
        os.makedirs(f"{workdir}/Val", exist_ok=True)
        gen_fake_espi.main(["-n", str(n_train), "-d", workdir, "--seed",
                            "0"])  # writes Train/
        gen_fake_espi.main(["-n", str(n_val), "-d", workdir + "/valtmp",
                            "--seed", "99"])
        for f in os.listdir(f"{workdir}/valtmp/Train"):
            shutil.move(f"{workdir}/valtmp/Train/{f}", f"{workdir}/Val/{f}")
    t_gen = time.time() - t_gen0

    # ---------- offline 42x inflation (the reference's workflow) ------
    # The inflation is pure host+CPU work, so it can run concurrently
    # with TPU jobs via scripts/dataset_d_inflate.py, which writes a
    # completion marker carrying its measured wall-clock.  A TrainAug
    # dir WITHOUT the marker is a partial run — redo it (re-running
    # augment_preproc on a partially inflated dir would inflate the
    # augmented files again).
    inflated = f"{workdir}/TrainAug"
    marker = f"{workdir}/inflate_done.json"
    r_off = None
    if arm == "onthefly":
        if rep_pin is None:
            raise SystemExit("--arm onthefly needs --rep N (match the "
                             "recorded offline run's images-seen)")
        t_inflate = None
    elif os.path.exists(marker):
        t_inflate = json.load(open(marker))["wall_s"]
        print(f"  (reusing completed inflation: {t_inflate:.0f}s)",
              flush=True)
    else:
        t_inf0 = time.time()
        if os.path.exists(inflated):
            shutil.rmtree(inflated)
        shutil.copytree(f"{workdir}/Train", inflated)
        augment_preproc.main(["-d", inflated + "/", "-n", str(n_augs)])
        t_inflate = time.time() - t_inf0
        json.dump({"wall_s": round(t_inflate, 1)}, open(marker, "w"))

    val_ds = build_dataset(f"{workdir}/Val", grid, batch_size=batch,
                           shuffle=False, input_size=331)
    if arm != "onthefly":
        off_ds = build_dataset(inflated, grid, batch_size=batch,
                               shuffle=True, seed=0, input_size=331,
                               on_overflow="drop")
        cfg_off = ExperimentConfig(
            grid=grid,
            model=ModelConfig(backbone="Xception", input_size=331),
            train=TrainConfig(batch_size=batch, epochs=ep_off, lr_max=lr,
                              augment=True, blur_prob=0.0, seed=0,
                              save_every=10**9),
        )
        r_off = run_one(cfg_off, off_ds, val_ds, "offline42x")
        r_off["inflate_wall_s"] = round(t_inflate, 1)
        print("OFFLINE " + json.dumps(r_off, default=float), flush=True)
        if arm == "offline":
            print("DATASET_D_RESULT " + json.dumps(
                {"gen_wall_s": round(t_gen, 1), "offline": r_off},
                default=float), flush=True)
            return

    # ---------- on-the-fly geo augmentation (TPU-first) ---------------
    fly_ds = build_dataset(f"{workdir}/Train", grid, batch_size=batch,
                           shuffle=True, seed=0, input_size=331)
    # equal images-seen AND equal val cadence: offline saw
    # ep_off * (n_augs+1) * n_train images with ep_off val sweeps, so
    # the on-the-fly arm runs ep_off epochs of (n_augs+1) fresh-warped
    # passes each (epoch_repeats) — one epoch program and one val sweep
    # per (n_augs+1) passes.  (The first measured variant ran one
    # 1,280-frame epoch + val sweep per pass: accuracy matched, but 504
    # val sweeps dominated wall-clock — an unfair protocol handicap.)
    rep_fly = (rep_pin if rep_pin is not None
               else off_ds.x.shape[0] // fly_ds.x.shape[0])
    cfg_fly = ExperimentConfig(
        grid=grid,
        model=ModelConfig(backbone="Xception", input_size=331),
        train=TrainConfig(batch_size=batch, epochs=ep_off, lr_max=lr,
                          augment=True, blur_prob=0.0, seed=0,
                          geo_augment=True, epoch_repeats=rep_fly,
                          save_every=10**9),
    )
    r_fly = run_one(cfg_fly, fly_ds, val_ds, "geo_fly")
    r_fly["imgs_seen"] = ep_off * rep_fly * fly_ds.x.shape[0]
    r_fly["epoch_repeats"] = rep_fly
    print("ONTHEFLY " + json.dumps(r_fly, default=float), flush=True)

    print("DATASET_D_RESULT " + json.dumps(
        {"gen_wall_s": round(t_gen, 1), "offline": r_off,
         "onthefly": r_fly}, default=float), flush=True)


if __name__ == "__main__":
    main()
