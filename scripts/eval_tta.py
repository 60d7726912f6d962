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

    # ---- per-view diagnostics: how good is each flipped view ALONE?
    # (re-encoded into the truth cell convention, so slot-aligned
    # metrics are fair — see eval/tta.py reencode_view).  If a single
    # flipped view scores far below the direct view, the model is not
    # flip-equivariant and no merge can help; if each view is ~direct
    # quality, the ensemble should beat it.
    if os.environ.get("SPNET_TTA_PER_VIEW", "1") == "1":
        import jax

        from spnet_tpu.config import IND_NOOBJ, VARS_PER_PRED
        from spnet_tpu.eval.metrics import calc_errors
        from spnet_tpu.eval.tta import (
            flip_images, flipback_grid, reencode_view)
        from spnet_tpu.grid import denormalize
        from spnet_tpu.train.loop import predict_in_batches
        from spnet_tpu.train.steps import make_predict_step

        predict_fn = make_predict_step(model)
        x_dev = jax.device_put(np.asarray(val_ds.x))
        yt = denormalize(val_ds.y, cfg.grid)
        decode = None
        if cfg.model.loss_type != "same":
            decode = lambda z: 1.0 / (1.0 + np.exp(-z))  # noqa: E731
        out["per_view"] = {}
        for mode in [m for m in modes.split(",") if m]:
            y_v, _ = predict_in_batches(
                predict_fn, state.params, state.batch_stats,
                flip_images(x_dev, mode), 256, verbose=0)
            if decode is not None:
                y_v[:, IND_NOOBJ::VARS_PER_PRED] = decode(
                    y_v[:, IND_NOOBJ::VARS_PER_PRED])
            yp_v = reencode_view(
                flipback_grid(denormalize(y_v, cfg.grid), mode, cfg.grid),
                cfg.grid)
            st = calc_errors(yp_v, yt)
            out["per_view"][mode] = {
                "ring_acc": st.ring_acc, "class_acc": st.class_acc,
                "mean_pix_err": st.mean_pix_err,
                "fp": st.false_obj_pos, "fn": st.false_obj_neg}
            print(f"  view {mode!r}: ring_acc {st.ring_acc:.2f}%  "
                  f"class_acc {st.class_acc:.2f}%  pix_err "
                  f"{st.mean_pix_err:.2f}  FP {st.false_obj_pos}  "
                  f"FN {st.false_obj_neg}", flush=True)
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
