"""On-device (jit-compatible) grid label encoding.

Device twin of the host codec in `spnet_tpu/grid.py` (which mirrors the
reference's `true_to_pred_grid`, `/root/reference/spnet/utils.py:191-244`).
The host path loops Python over records per image — fine for a one-time
dataset build, but it blocks label re-encoding inside the jitted train
step, which is what train-time GEOMETRIC augmentation (flip / rotate /
translate with ellipse remap) needs.  This module encodes from fixed-slot
ellipse arrays entirely with vectorized ops:

    rows  (N, 6) float32  [cx, cy, a, b, angle_deg, rings]  (padded)
    mask  (N,)   bool     slot validity
 -> flat normalized target (num_outputs,) float32

Semantics pinned to the host path (tests/test_grid_device.py):
  * canonicalization: a >= b swap (+90 deg), (cos 2t, sin 2t) encoding,
    rings <= 0 rows dropped, rows sorted by (cx, cy)
  * cell assignment: truncation + clip into the grid
  * slot fill order: sorted-record order within each cell
  * overflow: silently dropped (the jit-safe equivalent of
    on_overflow='drop'; the reference's assert cannot raise in-graph)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spnet_tpu.config import (
    GridSpec,
    IND_CX,
    IND_CY,
    VARS_PER_PRED,
)


def canonicalize_rows_device(rows, mask):
    """(N, 6) raw rows + validity mask -> (N, 8) canonical records +
    updated mask (rings <= 0 dropped).  Device twin of
    `grid.canonicalize_records` minus the sort (done in the encoder)."""
    cx, cy, a, b, angle, rings = (rows[:, k] for k in range(6))
    valid = mask & (rings > 0.0)

    swap = b > a
    a2 = jnp.where(swap, b, a)
    b2 = jnp.where(swap, a, b)
    angle = jnp.where(swap, angle + 90.0, angle)

    rad2 = 2.0 * jnp.deg2rad(angle)
    rec = jnp.stack(
        [cx, cy, a2, b2, jnp.cos(rad2), jnp.sin(rad2),
         jnp.zeros_like(cx), rings],
        axis=1,
    ).astype(jnp.float32)
    return rec, valid


def encode_rows_device(rows, mask, grid: GridSpec):
    """Encode ONE image's padded rows to the un-normalized flat grid
    (num_outputs,).  Pure jnp; vmap over the batch dim for batches."""
    rec, valid = canonicalize_rows_device(jnp.asarray(rows, jnp.float32),
                                          jnp.asarray(mask, bool))
    n = rec.shape[0]

    # sort by (cx, cy) with invalid rows pushed last (stable sort, same
    # tie order as the host lexsort)
    big = jnp.float32(1e9)
    key_cx = jnp.where(valid, rec[:, IND_CX], big)
    key_cy = jnp.where(valid, rec[:, IND_CY], big)
    order = jnp.lexsort((key_cy, key_cx))
    rec = rec[order]
    valid = valid[order]

    # cell index: truncation + clip (host: int() then min/max —
    # identical after clipping since trunc/floor differ only below 0)
    ix = jnp.clip(
        jnp.floor((rec[:, IND_CX] - grid.cx_min) / grid.xbinsize)
        .astype(jnp.int32), 0, grid.nx - 1,
    )
    iy = jnp.clip(
        jnp.floor((rec[:, IND_CY] - grid.cy_min) / grid.ybinsize)
        .astype(jnp.int32), 0, grid.ny - 1,
    )
    cell = ix * grid.ny + iy

    # slot within cell = how many earlier (sorted) valid records share
    # the cell.  N is tiny (<= MAX slots), so the O(N^2) mask sum is free.
    same = (cell[None, :] == cell[:, None]) & valid[None, :]
    lower = jnp.tril(jnp.ones((n, n), bool), k=-1)
    slot = jnp.sum(same & lower, axis=1)

    keep = valid & (slot < grid.preds_per_cell)
    flat_idx = jnp.where(keep, cell * grid.preds_per_cell + slot,
                         grid.nx * grid.ny * grid.preds_per_cell)

    g = jnp.asarray(grid.defaults, jnp.float32).reshape(
        -1, VARS_PER_PRED
    )
    g = g.at[flat_idx].set(rec, mode="drop")
    return g.reshape(-1)


def encode_batch_device(rows, mask, grid: GridSpec, normalized: bool = True):
    """Batched encode: rows (B, N, 6), mask (B, N) -> (B, num_outputs).

    normalized=True applies the GridSpec normalization (the training
    target convention)."""
    flat = jax.vmap(lambda r, m: encode_rows_device(r, m, grid))(
        jnp.asarray(rows, jnp.float32), jnp.asarray(mask, bool)
    )
    if normalized:
        flat = (flat - grid.means) / grid.ranges
    return flat
