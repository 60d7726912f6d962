#!/usr/bin/env python3
"""Standalone host-side 42x inflation for the Dataset-D experiment.

Runs `spnet-augment` (the offline inflation tool, cli/augment_preproc)
on the Dataset-D Train split with jax FORCED TO CPU, so it can run
concurrently with TPU jobs: the warps are jitted jax programs, and on
the TPU tunnel each tiny dispatch pays ~0.2 s of relay latency (the
measured 12 s/file that motivated this split — 4.3 h for 1,280 files);
on local CPU the same program is milliseconds.

Writes logs/dataset_d_data/inflate_done.json with the measured
wall-clock on success; scripts/dataset_d_run.py reuses it (a TrainAug
dir without the marker is treated as partial and redone).

Usage: python scripts/dataset_d_inflate.py [n_augs]
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
    n_augs = int(sys.argv[1]) if len(sys.argv) > 1 else 42
    workdir = "logs/dataset_d_data"
    inflated = f"{workdir}/TrainAug"
    marker = f"{workdir}/inflate_done.json"
    if not os.path.exists(f"{workdir}/Train"):
        raise SystemExit(f"{workdir}/Train missing — run the datagen "
                         "phase of scripts/dataset_d_run.py first")
    if os.path.exists(marker):
        print(f"already complete: {open(marker).read()}")
        return

    from spnet_tpu.cli import augment_preproc

    t0 = time.time()
    if os.path.exists(inflated):
        shutil.rmtree(inflated)  # partial previous attempt
    shutil.copytree(f"{workdir}/Train", inflated)
    augment_preproc.main(["-d", inflated + "/", "-n", str(n_augs)])
    wall = round(time.time() - t0, 1)
    json.dump({"wall_s": wall, "n_augs": n_augs}, open(marker, "w"))
    print(f"INFLATE_DONE {wall}s", flush=True)


if __name__ == "__main__":
    main()
