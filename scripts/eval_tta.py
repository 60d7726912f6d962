#!/usr/bin/env python3
"""TTA-ensemble evaluation of a trained checkpoint on its val set.

Runs evaluate_network twice — single-sweep (the reference's protocol)
and flip-TTA (direct + h + v + hv) — and prints both result blocks plus
one EVAL_TTA_RESULT json line for the ledger.  At ~4000 FPS/view the
4-view ensemble still clears the 4,992-frame val set in ~5 s.

Usage:
  python scripts/eval_tta.py CKPT_DIR [synth|refgen] [modes]
    synth  (default): val = cached synthetic 4,992 frames seed 777777
                      at the checkpoint's input_size
    refgen:           val = last 4,992 frames of the refgen shards
  modes default 'h,v,hv'.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    ckpt = sys.argv[1]
    source = sys.argv[2] if len(sys.argv) > 2 else "synth"
    modes = sys.argv[3] if len(sys.argv) > 3 else "h,v,hv"

    from spnet_tpu.cli.common import load_model_and_state
    from spnet_tpu.eval.evaluate import evaluate_network

    cfg, model, state = load_model_and_state(ckpt)
    size = cfg.model.input_size
    print(f"checkpoint {ckpt}: {cfg.model.backbone} input_size={size} "
          f"step={int(state.step)}")

    if source == "refgen":
        from scripts.refgen_run import load_refgen

        _, val_ds = load_refgen(40960, 4992, cfg.grid, size=size or 331)
    else:
        from spnet_tpu.data.dataset import Dataset

        path = f"logs/synth_cache/n4992_s777777_i{size}_v2.npz"
        z = np.load(path, allow_pickle=False)
        val_ds = Dataset(x=z["x"], y=z["y"],
                         file_list=[f"synthetic://777777/{i}"
                                    for i in range(z["x"].shape[0])],
                         grid=cfg.grid, rows=z["rows"], row_mask=z["mask"])
    print(f"val set: {val_ds.x.shape} from {source}")

    out = {"ckpt": ckpt, "source": source, "modes": modes}
    res_plain = evaluate_network(cfg, state, model, val_ds,
                                 log_dir="logs/tta_eval/plain/",
                                 num_draw=0, verbose=1)
    out["plain"] = res_plain
    res_tta = evaluate_network(cfg, state, model, val_ds,
                               log_dir="logs/tta_eval/tta/",
                               num_draw=0, tta=modes, verbose=1)
    out["tta"] = res_tta
    print(f"\nplain: ring_acc {res_plain['ring_acc']:.2f}%  "
          f"mAP {res_plain.get('mAP', 0):.4f}  fps {res_plain['fps']:.0f}")
    print(f"tta:   ring_acc {res_tta['ring_acc']:.2f}%  "
          f"mAP {res_tta.get('mAP', 0):.4f}  fps {res_tta['fps']:.0f}")
    print("EVAL_TTA_RESULT " + json.dumps(out, default=float), flush=True)


if __name__ == "__main__":
    main()
