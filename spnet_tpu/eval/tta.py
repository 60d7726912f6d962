"""Test-time augmentation (flip ensembling) for evaluation/prediction.

A capability the reference does not have (its eval path is a single
`model.predict`, `evaluate_spnet.py:64-68`), enabled here by inference
throughput: at ~4000+ FPS per view, a 4-view flip ensemble still
evaluates the 5k-frame val set in ~5 s.

Mechanics.  The predictor grid (GridSpec, `grid.py`) is (nx, ny,
slots, 8) with x-major cells.  A mirrored input image produces a
mirrored prediction grid; `flipback_grid` maps it back into the direct
frame:

  * 'h' (left-right mirror): reverse the nx axis; cx := W - cx;
    ellipse mirror negates the angle, i.e. sin2θ := -sin2θ.
  * 'v' (top-bottom): reverse ny; cy := H - cy; sin2θ := -sin2θ.
  * 'hv' (180° rotation): both reversals and reflections; sin2θ (and
    cos2θ) unchanged (θ+180° ≡ θ for an ellipse).

The flipped-back views are merged into the DIRECT view's cell/slot
structure (which is the convention the truth grid uses): per cell, the
two flipped slots are paired with the two direct slots by minimal
total center distance (slot order within a cell is a learned, flip
-dependent convention), geometry/rings are averaged weighted by each
view's existence probability (1 - noobj, clipped), and the noobj slot
is plain-averaged across views (the existence ensemble).  Empty slots
carry defaults with noobj = 1, so their geometry weight is ~0.
"""

from __future__ import annotations

import numpy as np

from spnet_tpu.config import (
    IND_A,
    IND_ANGLE1,
    IND_ANGLE2,
    IND_B,
    IND_CX,
    IND_CY,
    IND_NOOBJ,
    IND_RINGS,
    VARS_PER_PRED,
)

TTA_MODES = ("h", "v", "hv")


def flip_images(x, mode: str):
    """Mirror a (B, H, W, C) image batch.  Works on numpy or jnp."""
    import jax.numpy as jnp

    isjnp = not isinstance(x, np.ndarray)
    flip = jnp.flip if isjnp else np.flip
    if mode == "h":
        return flip(x, axis=2)
    if mode == "v":
        return flip(x, axis=1)
    if mode == "hv":
        return flip(flip(x, axis=1), axis=2)
    raise ValueError(f"unknown TTA mode {mode!r} (use one of {TTA_MODES})")


def flipback_grid(yp_denorm: np.ndarray, mode: str, grid) -> np.ndarray:
    """Map a DENORMALIZED prediction tensor obtained from flipped inputs
    back into the direct frame.  yp_denorm: (B, num_outputs) or
    (B, nx, ny, slots, 8).  Returns (B, nx, ny, slots, 8)."""
    g = np.array(yp_denorm, dtype=np.float32).reshape(
        (-1,) + grid.pred_shape)
    if "h" in mode:
        g = g[:, ::-1]
        g[..., IND_CX] = grid.img_width - g[..., IND_CX]
        g[..., IND_ANGLE2] = -g[..., IND_ANGLE2]
    if "v" in mode:
        g = g[:, :, ::-1]
        g[..., IND_CY] = grid.img_height - g[..., IND_CY]
        g[..., IND_ANGLE2] = -g[..., IND_ANGLE2]
    return np.ascontiguousarray(g)


def _pair_slots(direct: np.ndarray, view: np.ndarray) -> np.ndarray:
    """Per-cell slot pairing of one flipped-back view against the direct
    view, by minimal total center distance.  direct/view:
    (B, nx, ny, S, 8) with S slots.  Returns the view with its slot axis
    permuted to align with direct's slots.  S == 2 uses the closed-form
    two-permutation test; S == 1 is identity; larger S falls back to
    greedy nearest-center assignment."""
    s = direct.shape[3]
    if s == 1:
        return view
    if s == 2:
        d_c = direct[..., [IND_CX, IND_CY]]
        v_c = view[..., [IND_CX, IND_CY]]
        # cost of identity pairing vs swapped pairing
        ident = (np.linalg.norm(d_c[..., 0, :] - v_c[..., 0, :], axis=-1)
                 + np.linalg.norm(d_c[..., 1, :] - v_c[..., 1, :], axis=-1))
        swap = (np.linalg.norm(d_c[..., 0, :] - v_c[..., 1, :], axis=-1)
                + np.linalg.norm(d_c[..., 1, :] - v_c[..., 0, :], axis=-1))
        use_swap = (swap < ident)[..., None, None]
        return np.where(use_swap, view[..., ::-1, :], view)
    # general S: greedy per-cell assignment (rarely used; S is 2 in
    # every reference configuration)
    out = view.copy()
    b, nx, ny = direct.shape[:3]
    for ib in range(b):
        for ix in range(nx):
            for iy in range(ny):
                d_c = direct[ib, ix, iy, :, :2]
                v_c = view[ib, ix, iy, :, :2]
                cost = np.linalg.norm(
                    d_c[:, None, :] - v_c[None, :, :], axis=-1)
                taken = np.zeros(s, bool)
                perm = np.zeros(s, np.int64)
                for k in np.argsort(cost.min(axis=1)):
                    j = np.argmin(np.where(taken, np.inf, cost[k]))
                    perm[k] = j
                    taken[j] = True
                out[ib, ix, iy] = view[ib, ix, iy, perm]
    return out


def merge_views(direct_denorm: np.ndarray, views_denorm: list[np.ndarray],
                grid) -> np.ndarray:
    """Merge flipped-back views into the direct prediction.  All inputs
    DENORMALIZED; direct: (B, num_outputs) or 5-D; views: 5-D tensors
    from `flipback_grid`.  Returns (B, num_outputs) denormalized."""
    d = np.array(direct_denorm, dtype=np.float32).reshape(
        (-1,) + grid.pred_shape)
    geom = [IND_CX, IND_CY, IND_A, IND_B, IND_ANGLE1, IND_ANGLE2,
            IND_RINGS]
    p_d = np.clip(1.0 - d[..., IND_NOOBJ], 0.0, 1.0)[..., None]
    wsum = p_d.copy()
    gsum = p_d * d[..., geom]
    nsum = d[..., IND_NOOBJ].copy()
    for v in views_denorm:
        v = _pair_slots(d, v)
        p_v = np.clip(1.0 - v[..., IND_NOOBJ], 0.0, 1.0)[..., None]
        wsum = wsum + p_v
        gsum = gsum + p_v * v[..., geom]
        nsum = nsum + v[..., IND_NOOBJ]
    out = d.copy()
    # geometry: existence-weighted mean; all-views-empty slots keep the
    # direct values (weights ~0 -> guard keeps d)
    safe = wsum > 1e-6
    out[..., geom] = np.where(
        safe, gsum / np.where(safe, wsum, 1.0), d[..., geom])
    out[..., IND_NOOBJ] = nsum / (1 + len(views_denorm))
    return out.reshape(len(out), grid.num_outputs)


def predict_tta(predict_fn, params, batch_stats, x_eval, infer_bs: int,
                grid, modes=TTA_MODES, decode_noobj=None,
                verbose: int = 0):
    """Run the direct sweep plus one sweep per flip mode and merge.

    Returns (y_pred_normalized (B, num_outputs) np.ndarray, fps) where
    fps counts frames / TOTAL predict time over all views (the honest
    ensemble throughput).  x_eval may live on device (preferred: the
    flips then run on device with no extra host traffic).

    decode_noobj: optional callable applied IN PLACE of the raw noobj
    columns of each view's normalized output before merging — pass a
    sigmoid when the model emits existence logits (loss_type != 'same',
    the reference's post-hoc decode at `evaluate_spnet.py:70-71`).
    """
    from spnet_tpu.grid import denormalize, normalize
    from spnet_tpu.train.loop import predict_in_batches

    def sweep(x):
        y, fps = predict_in_batches(
            predict_fn, params, batch_stats, x, infer_bs,
            verbose=verbose)
        if decode_noobj is not None:
            y[:, IND_NOOBJ::VARS_PER_PRED] = decode_noobj(
                y[:, IND_NOOBJ::VARS_PER_PRED])
        return y, fps

    y_d, fps_d = sweep(x_eval)
    n = y_d.shape[0]
    total_t = n / max(fps_d, 1e-9)
    views = []
    for mode in modes:
        y_v, fps_v = sweep(flip_images(x_eval, mode))
        total_t += n / max(fps_v, 1e-9)
        views.append(flipback_grid(denormalize(y_v, grid), mode, grid))
    merged = merge_views(denormalize(y_d, grid), views, grid)
    return np.asarray(normalize(merged, grid), dtype=np.float32), (
        n / total_t)
