#!/usr/bin/env python3
"""Collect round-5 run results from /tmp logs into VALIDATION-ready
markdown (survives nothing — run before the container dies, commit the
output).  Usage: python scripts/collect_r5_results.py"""

import glob
import json
import os
import re


def last_json(path, marker):
    if not os.path.exists(path):
        return None
    out = None
    for line in open(path, errors="replace"):
        if marker in line:
            try:
                out = json.loads(line.split(marker, 1)[1])
            except Exception:
                pass
    return out


def show(title, path, marker):
    r = last_json(path, marker)
    print(f"### {title}")
    print("*pending*" if r is None else
          json.dumps(r, indent=1, default=str)[:2000])
    print()
    return r


def main():
    show("refgen-384 mixed long run", "/tmp/r5_refgen384.log",
         "REFGEN_RESULT")
    show("refgen-384 flip-TTA", "/tmp/r5_refgen384_tta.log",
         "EVAL_TTA_RESULT")
    show("dataset-D matched cadence (onthefly rep42)",
         "/tmp/r5_datasetd.log", "DATASET_D_RESULT")
    show("keras .h5 import + finetune", "/tmp/r5_kerash5.log",
         "KERAS_H5_RESULT")
    show("movie .bmp predict", "/tmp/r5_movie.log", "MOVIE_RESULT")
    show("native-res FULL 40960", "/tmp/r5_nativefull.log",
         "DATASET_A_RESULT")
    show("native-res FULL 40960 (session-12 relaunch, 90 ep)",
         "/tmp/r5_nativefull2.log", "DATASET_A_RESULT")
    show("native-res flip-TTA", "/tmp/r5_tta_native.log",
         "EVAL_TTA_RESULT")
    show("native-res residual breakdown", "/tmp/r5_breakdown_native.log",
         "BREAKDOWN ")
    show("MFU sweep", "/tmp/r5_mfu.log", "MFU_SWEEP_RESULT")

    print("### bigprog quadrant")
    if os.path.exists("/tmp/r5_bigprog.log"):
        for line in open("/tmp/r5_bigprog.log", errors="replace"):
            if "BIGPROG_OK" in line or "CRASH" in line:
                print(line.rstrip()[:200])
    print()
    print("### suite runs")
    for p in sorted(glob.glob("/tmp/r5_suite_run*.log")):
        tail = open(p, errors="replace").read().strip().splitlines()
        print(os.path.basename(p), "->", tail[-1][:120] if tail else "?")
    if os.path.exists("/tmp/r5_tta10.log"):
        print("tta-determinism 10x:",
              sum("passed" in ln for ln in open("/tmp/r5_tta10.log")),
              "/ 10 green")


if __name__ == "__main__":
    main()
