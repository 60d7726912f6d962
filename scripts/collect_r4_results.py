#!/usr/bin/env python3
"""Scrape the round-4 queue logs into one markdown summary.

Reads the machine-readable result lines every runner prints
(DATASET_A_RESULT / EVAL_TTA_RESULT / DATASET_D_RESULT and the bench
JSON) from /tmp and prints a ledger ready to fold into VALIDATION.md.
Missing logs are listed as pending, so this can run at any point while
the queue drains.
"""

import glob
import json
import os

LOGS = {
    "mixed (f32 stem+head, bf16 backbone)": "/tmp/r4_mixed.log",
    "precision HIGH (bf16x3) 331 f32": "/tmp/r4_prec2.log",
    "big native 512x384 f32 150ep (queue10, crashed)": "/tmp/r4_big.log",
    "long 150ep accuracy run (queue11)": "/tmp/r4_long.log",
    "full-scale 2ep confirm (queue11)": "/tmp/r4_long_confirm.log",
}
TTA = {
    "big ckpt (synth val)": "/tmp/r4_tta_big.log",
    "mixed ckpt (synth val)": "/tmp/r4_tta_mixed.log",
    "long-run ckpt (synth val)": "/tmp/r4_tta_long.log",
}


def _flat(r):
    """DATASET_A_RESULT nests the eval metrics under final_eval and the
    last-epoch training stats under last; flatten for the tables."""
    if r is None:
        return None
    out = dict(r.get("final_eval") or {})
    out["last10_ring_acc"] = r.get("last10_ring_acc")
    out["img_per_sec"] = (r.get("last") or {}).get("img_per_sec", 0)
    return out


def last_json(path, marker):
    if not os.path.exists(path):
        return None
    lines = [ln for ln in open(path, errors="replace")
             if ln.startswith(marker)]
    if not lines:
        return None
    return json.loads(lines[-1].split(None, 1)[1])


def main():
    print("## Round-4 result ledger (auto-collected)\n")

    print("### Training runs")
    print("| run | ring-acc | last-10 | class-acc | mAP | pix err | img/s |")
    print("|---|---|---|---|---|---|---|")
    for name, path in LOGS.items():
        r = _flat(last_json(path, "DATASET_A_RESULT"))
        if r is None:
            print(f"| {name} | *pending* ||||||")
            continue
        print(f"| {name} | {r.get('ring_acc'):.2f} | "
              f"{r.get('last10_ring_acc'):.2f} | "
              f"{r.get('class_acc'):.2f} | {r.get('mAP'):.4f} | "
              f"{r.get('mean_pix_err'):.2f} | "
              f"{r.get('img_per_sec', 0):.0f} |")

    print("\n### Flip-TTA ensembles (direct + h + v + hv)")
    print("| checkpoint | plain ring-acc | TTA ring-acc | plain mAP | "
          "TTA mAP | TTA fps |")
    print("|---|---|---|---|---|---|")
    for name, path in TTA.items():
        r = last_json(path, "EVAL_TTA_RESULT")
        if r is None:
            print(f"| {name} | *pending* |||||")
            continue
        p, t = r["plain"], r["tta"]
        print(f"| {name} | {p['ring_acc']:.2f} | {t['ring_acc']:.2f} | "
              f"{p.get('mAP', 0):.4f} | {t.get('mAP', 0):.4f} | "
              f"{t['fps']:.0f} |")

    print("\n### Dataset-D-shaped small-data (offline 42x vs on-the-fly)")
    # single-arm reruns (--arm onthefly) carry "offline": null — print
    # only the arms actually present, across every log that may hold one
    rows = []
    for path in ("/tmp/r4_datasetd.log", "/tmp/r4_datasetd3.log",
                 "/tmp/r5_datasetd.log"):
        d = last_json(path, "DATASET_D_RESULT")
        if d is None:
            continue
        for tag, key in (("offline 42x", "offline"),
                         ("on-the-fly geo", "onthefly")):
            if d.get(key):
                rows.append((f"{tag} ({os.path.basename(path)})", d[key]))
    if not rows:
        print("*pending*")
    else:
        print("| path | ring-acc | class-acc | mAP | pix err | "
              "train wall (s) | inflate wall (s) |")
        print("|---|---|---|---|---|---|---|")
        for tag, r in rows:
            print(f"| {tag} | {r['ring_acc']:.2f} | {r['class_acc']:.2f} "
                  f"| {r.get('mAP', 0):.4f} | {r['pix_err']:.2f} | "
                  f"{r['train_wall_s']:.0f} | "
                  f"{r.get('inflate_wall_s', 0):.0f} |")

    print("\n### Backbone sweep (25 ep, b=32, bf16, 331)")
    print("| backbone | ring-acc | class-acc | mAP | pix err | img/s |")
    print("|---|---|---|---|---|---|")
    for path in sorted(glob.glob("/tmp/r4_sweep_*.log")):
        bb = os.path.basename(path)[len("r4_sweep_"):-len(".log")]
        r = _flat(last_json(path, "DATASET_A_RESULT"))
        if r is None:
            print(f"| {bb} | *pending* |||||")
            continue
        print(f"| {bb} | {r.get('ring_acc'):.2f} | "
              f"{r.get('class_acc'):.2f} | {r.get('mAP'):.4f} | "
              f"{r.get('mean_pix_err'):.2f} | "
              f"{r.get('img_per_sec', 0):.0f} |")

    print("\n### Chunked-put probe (queue12)")
    if os.path.exists("/tmp/r4_bigput.log"):
        hits = [ln.strip() for ln in open("/tmp/r4_bigput.log")
                if ln.startswith("BIGPUT_")]
        print(f"`{hits[-1]}`" if hits
              else "*probe ran but printed no BIGPUT_ line (crash?)*")
    else:
        print("*pending*")

    print("\n### Big-run crash bisect (queue11)")
    if os.path.exists("/tmp/r4_bigdebug.verdict"):
        print(f"verdict: `{open('/tmp/r4_bigdebug.verdict').read().strip()}`")
        main_log = "/tmp/r4_bigdebug_main.log"
        if os.path.exists(main_log):
            print("```")
            print("\n".join(ln for ln in open(main_log).read().splitlines()
                            if ln.startswith(("BIGDEBUG", "  ->"))))
            print("```")
    else:
        print("*pending*")

    print("\n### Scan-unroll bench A/B")
    if os.path.exists("/tmp/r4_unroll_ab.log"):
        print("```")
        print(open("/tmp/r4_unroll_ab.log").read().strip())
        print("```")
    else:
        print("*pending*")

    print("\n### XLA scheduling-flag sweep")
    s = last_json("/tmp/r4_xla_sweep.log", "XLA_SWEEP_RESULT")
    if s is None:
        print("*pending*")
    else:
        print("| flag set | img/s |")
        print("|---|---|")
        for name, v in s.items():
            val = v.get("value") if isinstance(v, dict) else v
            print(f"| {name} | {val} |")


if __name__ == "__main__":
    main()
