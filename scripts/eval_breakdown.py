#!/usr/bin/env python3
"""Ring-accuracy breakdown for a checkpoint: where do the misses live?

Buckets ring correctness (|pred - true| <= 0.5, reference
`diagnostics.py:45`) of every DETECTED object by true ring count and by
semiminor-axis size, plus the detection confusion — the decomposition
that separates 'ring regression is imprecise' from 'detection misses'.

Usage: python scripts/eval_breakdown.py <ckpt_dir> [n_val] [seed]
       python scripts/eval_breakdown.py <ckpt_dir> refgen
(the 'refgen' form evaluates on the reference-generator val split,
for decomposing the refgen-384 single-sweep residual)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    ckpt = sys.argv[1]
    refgen = len(sys.argv) > 2 and sys.argv[2] == "refgen"
    n_val = (int(sys.argv[2]) if len(sys.argv) > 2 and not refgen
             else 4992)
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 777777

    from spnet_tpu.cli.common import load_model_and_state
    from spnet_tpu.config import (
        IND_B,
        IND_NOOBJ,
        IND_RINGS,
        VARS_PER_PRED,
    )
    from spnet_tpu.data.dataset import synthetic_dataset
    from spnet_tpu.grid import denormalize
    from spnet_tpu.train.loop import predict_in_batches
    from spnet_tpu.train.steps import make_predict_step

    cfg, model, state = load_model_and_state(ckpt)
    if refgen:
        from scripts.refgen_run import load_refgen

        _, ds = load_refgen(40960, n_val, cfg.grid,
                            size=cfg.model.input_size or 331)
    else:
        ds = synthetic_dataset(n_val, cfg.grid, seed=seed,
                               input_size=cfg.model.input_size)
    predict_fn = make_predict_step(model)
    y_pred, fps = predict_in_batches(
        predict_fn, state.params, state.batch_stats, ds.x, 256,
    )
    yt = denormalize(ds.y, cfg.grid).reshape(n_val, -1, VARS_PER_PRED)
    yp = denormalize(y_pred, cfg.grid).reshape(n_val, -1, VARS_PER_PRED)

    t_obj = np.rint(yt[..., IND_NOOBJ]) == 0
    p_obj = np.rint(yp[..., IND_NOOBJ]) == 0
    tp = t_obj & p_obj
    ring_err = np.abs(yt[..., IND_RINGS] - yp[..., IND_RINGS])
    ok = ring_err <= 0.5

    out = {
        "n_true": int(t_obj.sum()),
        "tp_rate": round(float(tp.sum() / t_obj.sum()) * 100, 2),
        "fn": int((t_obj & ~p_obj).sum()),
        "fp": int((~t_obj & p_obj).sum()),
        "ring_acc_total": round(
            float((tp & ok).sum() / t_obj.sum()) * 100, 2),
        "ring_acc_given_tp": round(
            float((tp & ok).sum() / tp.sum()) * 100, 2),
        "mean_ring_err_tp": round(float(ring_err[tp].mean()), 4),
    }
    # by true ring count
    rings_t = np.rint(yt[..., IND_RINGS]).astype(int)
    by_rings = {}
    for r in range(1, 12):
        m = tp & (rings_t == r)
        if m.sum():
            by_rings[r] = round(float(ok[m].mean()) * 100, 1)
    out["ring_acc_by_true_rings"] = by_rings
    # by semiminor axis (proxy for ring line width b/(2*rings))
    b_t = yt[..., IND_B]
    by_b = {}
    for lo, hi in ((0, 25), (25, 40), (40, 60), (60, 90), (90, 1000)):
        m = tp & (b_t >= lo) & (b_t < hi)
        if m.sum():
            by_b[f"{lo}-{hi}"] = round(float(ok[m].mean()) * 100, 1)
    out["ring_acc_by_b"] = by_b
    # by ring line width (the resolvability metric): b / (2*rings) px
    lw = b_t / np.maximum(2 * rings_t, 1)
    by_lw = {}
    for lo, hi in ((0, 3), (3, 5), (5, 8), (8, 1000)):
        m = tp & (lw >= lo) & (lw < hi)
        if m.sum():
            by_lw[f"{lo}-{hi}px"] = round(float(ok[m].mean()) * 100, 1)
    out["ring_acc_by_line_width"] = by_lw
    print("BREAKDOWN " + json.dumps(out, default=float), flush=True)


if __name__ == "__main__":
    main()
