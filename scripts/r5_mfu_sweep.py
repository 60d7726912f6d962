#!/usr/bin/env python3
"""Single-chip MFU sweep (VERDICT r4 #5): the remaining scheduler /
feed knobs, A/B'd back-to-back on the idle chip via bench.py variants.

Round-4 state: 44.2 ms step at b128 is distributed dispatch/DMA latency
across ~2,000 small ops (VALIDATION §1); carried-params and sepconv-
Pallas measured negative, unroll=2 won +4.9 %, XLA scheduling flags are
relay-blocked.  This sweep measures what is left on the table:

  * unroll 2 (production) vs 3 / 4  — wider cross-step windows
  * batch 192 (the untested point between 128-best and 256-worse)
  * in-scan gathers vs the pregathered epoch copy (feed-path A/B:
    the round-2 measurement predates unroll=2 and the current layout)

Each variant is one bench.py subprocess (sequential — ONE TPU process
at a time; each times to value retrieval).  Prints one line per
variant and MFU_SWEEP_DONE at the end.
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

VARIANTS = [
    ("u2_b128 (production)", {}),
    ("u3_b128", {"SPNET_SCAN_UNROLL": "3"}),
    ("u4_b128", {"SPNET_SCAN_UNROLL": "4"}),
    ("u2_b192", {"SPNET_BENCH_BS": "192"}),
    ("u2_b128_nopregather", {"SPNET_BENCH_PREGATHER": "0"}),
    ("u4_b192", {"SPNET_SCAN_UNROLL": "4", "SPNET_BENCH_BS": "192"}),
    # diagnostic: augmentation's share of the step (production keeps it)
    ("u2_b128_noaugment", {"SPNET_BENCH_AUGMENT": "0"}),
]


def main():
    results = {}
    for name, env_over in VARIANTS:
        env = dict(os.environ)
        env.update(env_over)
        try:
            out = subprocess.run(
                [sys.executable, "-u", "bench.py"], env=env,
                capture_output=True, text=True, timeout=900,
            )
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")]
            val = json.loads(line[-1])["value"] if line else None
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            val = f"error: {e}"
        results[name] = val
        print(f"MFU_VARIANT {name}: {val} img/s", flush=True)
    print("MFU_SWEEP_RESULT " + json.dumps(results), flush=True)
    print("MFU_SWEEP_DONE", flush=True)


if __name__ == "__main__":
    main()
