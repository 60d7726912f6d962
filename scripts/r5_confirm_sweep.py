#!/usr/bin/env python3
"""Post-queue4 confirm sweep (session 11).

Two short bench.py runs on the freed chip:
  * default config — confirms the flipped pregather=0 default (the
    round-5 sweep measured 3043.6 img/s for this exact variant; this is
    what the driver's end-of-round bench will run)
  * unroll=3 on top of the new default — the one combination the round-5
    sweep did not cover (u3 was +0.3 % over u2 with the OLD pregather
    default; if it stacks with the gather win by >1 % it earns the
    default)

Same mechanics as scripts/r5_mfu_sweep.py: sequential subprocesses, one
TPU process at a time, 900 s timeout each (proven safe tonight — the u4
timeout kill did not wedge the worker).  Prints CONFIRM_SWEEP_DONE.
"""

import json
import os
import subprocess
import sys

VARIANTS = [
    ("default (pregather=0, u2)", {}),
    ("u3_nopregather", {"SPNET_SCAN_UNROLL": "3"}),
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
        print(f"CONFIRM_VARIANT {name}: {val} img/s", flush=True)
    print("CONFIRM_SWEEP_RESULT " + json.dumps(results), flush=True)
    print("CONFIRM_SWEEP_DONE", flush=True)


if __name__ == "__main__":
    main()
