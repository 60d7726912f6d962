#!/usr/bin/env python3
"""CPU-side prep for the Dataset-D experiment: datagen + 42x inflation.

Runs the EXACT datagen phase of scripts/dataset_d_run.py (same seeds,
same paths) with jax forced to CPU, then the offline inflation
(scripts/dataset_d_inflate.py logic), so the whole host-side half of
the experiment runs concurrently with TPU jobs.  dataset_d_run.py then
finds Train/ + Val/ + inflate_done.json already present and goes
straight to the two training arms on the TPU.

Usage: python scripts/dataset_d_prep.py [n_train] [n_val] [n_augs]
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    n_train = int(sys.argv[1]) if len(sys.argv) > 1 else 1280
    n_val = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    n_augs = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    workdir = "logs/dataset_d_data"

    from spnet_tpu.cli import augment_preproc, gen_fake_espi

    t0 = time.time()
    if not os.path.exists(f"{workdir}/Train"):
        os.makedirs(f"{workdir}/Train", exist_ok=True)
        os.makedirs(f"{workdir}/Val", exist_ok=True)
        gen_fake_espi.main(["-n", str(n_train), "-d", workdir,
                            "--seed", "0"])
        gen_fake_espi.main(["-n", str(n_val), "-d", workdir + "/valtmp",
                            "--seed", "99"])
        for f in os.listdir(f"{workdir}/valtmp/Train"):
            shutil.move(f"{workdir}/valtmp/Train/{f}",
                        f"{workdir}/Val/{f}")
    print(f"DATAGEN_DONE {time.time() - t0:.1f}s", flush=True)

    inflated = f"{workdir}/TrainAug"
    marker = f"{workdir}/inflate_done.json"
    if os.path.exists(marker):
        print(f"already complete: {open(marker).read()}")
        return
    t1 = time.time()
    if os.path.exists(inflated):
        shutil.rmtree(inflated)  # partial previous attempt
    shutil.copytree(f"{workdir}/Train", inflated)
    augment_preproc.main(["-d", inflated + "/", "-n", str(n_augs)])
    wall = round(time.time() - t1, 1)
    json.dump({"wall_s": wall, "n_augs": n_augs}, open(marker, "w"))
    print(f"INFLATE_DONE {wall}s", flush=True)


if __name__ == "__main__":
    main()
