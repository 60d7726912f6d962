#!/usr/bin/env python3
"""Sequential A/B of the production bench across stem variants / batch
sizes, in ONE process (one TPU claim).  Prints one JSON line per config
plus a summary; run on idle hardware only (CLAUDE.md rules).

Usage: python scripts/ab_bench.py [config ...]
  config = comma-separated k=v pairs of bench env knobs, e.g.
    "FUSED=1" "FUSED=1,BS=256" "PLANAR=1"
  no args = the round-3 default sweep.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench

KNOBS = {"FUSED": "SPNET_BENCH_FUSED", "PLANAR": "SPNET_BENCH_PLANAR",
         "BS": "SPNET_BENCH_BS"}
DEFAULT_SWEEP = ["", "FUSED=1", "FUSED=1,BS=256", "BS=256"]


def run_config(spec: str) -> dict:
    saved = {}
    for k, env in KNOBS.items():
        saved[env] = os.environ.pop(env, None)
    try:
        for kv in filter(None, spec.split(",")):
            k, v = kv.split("=")
            os.environ[KNOBS[k.strip()]] = v.strip()
        res = bench.main()
        res["config"] = spec or "default"
        print(json.dumps(res), flush=True)
        return res
    finally:
        for env, v in saved.items():
            if v is None:
                os.environ.pop(env, None)
            else:
                os.environ[env] = v


def main():
    sweep = sys.argv[1:] or DEFAULT_SWEEP
    results = [run_config(s) for s in sweep]
    best = max(results, key=lambda r: r["value"])
    print("BEST " + json.dumps(
        {"config": best["config"], "img_per_sec": best["value"]}
    ))


if __name__ == "__main__":
    main()
