#!/usr/bin/env python3
"""Sweep XLA/libtpu flag sets over bench.py in fresh subprocesses.

The round-3/4 profile attributes the 44 ms train step to distributed
scheduling/DMA latency across ~2,000 small ops rather than a single
roofline wall (VALIDATION.md §1); every op-level lever (stem layout,
carried casts, Pallas sepconv) has been measured.  What has NOT been
tried is the compiler's own scheduling knobs.  Each candidate flag set
runs `bench.py` in a fresh python process (XLA_FLAGS must be set before
backend init — sitecustomize pre-imports jax, but backend init happens
at first device use, so subprocess env works).

TPU-claiming: run ONLY when nothing else is on the device.
Usage: python scripts/xla_flags_sweep.py [quick]
Prints one line per flag set + XLA_SWEEP_RESULT json at the end.
"""

import json
import os
import subprocess
import sys
import time

SETS = {
    "baseline": "",
    "latency_hiding": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "async_streams": "--xla_tpu_enable_async_collective_fusion=true "
                     "--xla_tpu_enable_latency_hiding_scheduler=true",
    "flash_lowering": "--xla_tpu_enable_flash_attention=false",
    # bigger scoped VMEM lets Mosaic/XLA form larger fusions (fewer,
    # bigger HBM<->VMEM DMAs — exactly the small-op latency profile);
    # unknown/oversized values just fail that one subprocess.
    "vmem_32m": "--xla_tpu_scoped_vmem_limit_kib=32768",
    "vmem_64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem_lhs": "--xla_tpu_scoped_vmem_limit_kib=65536 "
                "--xla_tpu_enable_latency_hiding_scheduler=true",
}


def main():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = {}
    for name, flags in SETS.items():
        env = dict(os.environ)
        base = env.get("XLA_FLAGS", "")
        env["XLA_FLAGS"] = (base + " " + flags).strip()
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-u", "bench.py"], cwd=here, env=env,
            capture_output=True, text=True, timeout=1800,
        )
        line = ""
        for ln in proc.stdout.splitlines()[::-1]:
            if ln.startswith("{"):
                line = ln
                break
        if not line:
            print(f"{name}: FAILED rc={proc.returncode} "
                  f"{proc.stderr[-300:]}", flush=True)
            results[name] = None
            continue
        r = json.loads(line)
        results[name] = r["value"]
        print(f"{name}: {r['value']:.1f} {r['unit']} "
              f"({time.time() - t0:.0f}s)", flush=True)
    print("XLA_SWEEP_RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
