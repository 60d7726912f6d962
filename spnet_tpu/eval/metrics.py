"""Evaluation metrics: detection/ring confusion stats, precision @ IoU, mAP.

Vectorized replacements for the reference's Python-loop metrics
(`/root/reference/spnet/diagnostics.py`).  Semantics preserved exactly —
including the quirks of `precision()` (`diagnostics.py:125-149`):

  * a grid slot with no true object is skipped entirely (reference's
    compute_iou returns -1 there), so false positives are structurally
    impossible in this metric;
  * a (pred present, true present) pair whose IoU fails the threshold is
    NOT counted in the denominator;
  * precision = tp / (tp + fp + fn) with fp always 0.

The reference's known eval print bug (`evaluate_spnet.py:82`, miscounts
divided instead of correct counts) is NOT replicated.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from spnet_tpu.config import (
    GridSpec,
    IND_NOOBJ,
    IND_RINGS,
    VARS_PER_PRED,
)
from spnet_tpu.ops.raster import pair_iou_jit

#: COCO-style IoU thresholds (reference `diagnostics.py:155`).
MAP_THRESHOLDS = tuple(np.arange(0.50, 0.951, 0.05).round(2))


@dataclasses.dataclass
class ErrorStats:
    """Field-for-field equivalent of the reference's `calc_errors` return
    (`diagnostics.py:13-59`)."""

    ring_miscounts: int
    ring_truecounts: int
    total_obj: int
    false_obj_pos: int
    false_obj_neg: int
    true_obj_pos: int
    true_obj_neg: int
    pix_err: np.ndarray  # (N,) center error of grid slot 0, per image
    ipem: int  # index of max pixel error

    @property
    def mistakes(self) -> int:
        # reference `callbacks.py:165`
        return self.ring_miscounts + self.false_obj_pos + self.false_obj_neg

    @property
    def class_acc(self) -> float:
        # "accuracy from lack of any mistakes" (reference `callbacks.py:166`)
        if self.total_obj == 0:
            return float("nan")
        return (self.total_obj - self.mistakes) / self.total_obj * 100.0

    @property
    def ring_acc(self) -> float:
        if self.total_obj == 0:
            return float("nan")
        return self.ring_truecounts / self.total_obj * 100.0

    @property
    def mean_pix_err(self) -> float:
        return float(np.mean(self.pix_err))


def calc_errors(Yp: np.ndarray, Yt: np.ndarray) -> ErrorStats:
    """Vectorized twin of reference `calc_errors` (`diagnostics.py:13-59`).

    Yp, Yt: denormalized (N, num_outputs) arrays.
    Note: like the reference, pix_err uses only the FIRST grid slot's
    (cx, cy) columns (`diagnostics.py:25`).
    """
    Yp = np.asarray(Yp, dtype=np.float64)
    Yt = np.asarray(Yt, dtype=np.float64)
    n, m = Yt.shape
    s = m // VARS_PER_PRED
    p3 = Yp.reshape(n, s, VARS_PER_PRED)
    t3 = Yt.reshape(n, s, VARS_PER_PRED)

    diff = Yp - Yt
    pix_err = np.sqrt(diff[:, 0] ** 2 + diff[:, 1] ** 2)
    ipem = int(np.argmax(pix_err))

    t_obj = np.rint(t3[..., IND_NOOBJ]) == 0
    p_obj = np.rint(p3[..., IND_NOOBJ]) == 0
    tp = t_obj & p_obj
    ring_off = np.abs(t3[..., IND_RINGS] - p3[..., IND_RINGS]) > 0.5

    return ErrorStats(
        ring_miscounts=int((tp & ring_off).sum()),
        ring_truecounts=int((tp & ~ring_off).sum()),
        total_obj=int(t_obj.sum()),
        false_obj_pos=int((~t_obj & p_obj).sum()),
        false_obj_neg=int((t_obj & ~p_obj).sum()),
        true_obj_pos=int(tp.sum()),
        true_obj_neg=int((~t_obj & ~p_obj).sum()),
        pix_err=pix_err,
        ipem=ipem,
    )


def slot_ious(
    Yp: np.ndarray,
    Yt: np.ndarray,
    grid: GridSpec | None = None,
    chunk: int = 4096,
) -> tuple[np.ndarray, np.ndarray]:
    """IoU for every (image, slot) pair where a TRUE object exists.

    Returns (ious, fn_mask):
      ious:    (K,) float32 IoUs for true-present slots, in row-major
               (image, slot) order;
      fn_mask: (K,) bool, True where the prediction was absent
               (rounded noobj >= 0.5 is NOT the criterion here — the
               reference rasterizer treats pred noobj >= 0.5 as absent
               without rounding, `diagnostics.py:75`).

    The heavy IoU math runs on device in chunks (vmapped row-interval
    counting, see ops/raster.py); host code only compacts the sparse
    true-present slots (<= ~7 of 72 per image).
    """
    h = grid.img_height if grid is not None else 384
    w = grid.img_width if grid is not None else 512
    Yp = np.asarray(Yp, dtype=np.float32)
    Yt = np.asarray(Yt, dtype=np.float32)
    n, m = Yt.shape
    s = m // VARS_PER_PRED
    p3 = Yp.reshape(n * s, VARS_PER_PRED)
    t3 = Yt.reshape(n * s, VARS_PER_PRED)

    present_t = t3[:, IND_NOOBJ] <= 0.99
    idx = np.nonzero(present_t)[0]
    if idx.size == 0:
        return np.zeros((0,), np.float32), np.zeros((0,), bool)

    ious = np.empty((idx.size,), dtype=np.float32)
    for st in range(0, idx.size, chunk):
        sl = idx[st : st + chunk]
        ious[st : st + chunk] = np.asarray(
            pair_iou_jit(p3[sl], t3[sl], h=h, w=w)
        )
    fn_mask = p3[idx, IND_NOOBJ] >= 0.5
    return ious, fn_mask


def precision_from_ious(
    ious: np.ndarray, fn_mask: np.ndarray, thresh: float
) -> tuple[float, int, int, int]:
    """precision, tp, fp, fn at one threshold (reference semantics, see
    module docstring)."""
    tp = int((ious > thresh).sum())
    fn = int(fn_mask.sum())
    fp = 0  # structurally unreachable in the reference metric
    denom = tp + fp + fn
    prec = tp / denom if denom > 0 else 0.0
    return prec, tp, fp, fn


def precision(
    Yp: np.ndarray, Yt: np.ndarray, thresh: float = 0.5,
    grid: GridSpec | None = None,
) -> tuple[float, int, int, int]:
    """One-threshold precision (reference `diagnostics.py:125-149`)."""
    ious, fn_mask = slot_ious(Yp, Yt, grid)
    return precision_from_ious(ious, fn_mask, thresh)


def calc_map(
    Yp: np.ndarray,
    Yt: np.ndarray,
    grid: GridSpec | None = None,
    verbose: bool = False,
) -> float:
    """Mean precision over IoU 0.50:0.05:0.95 (reference
    `diagnostics.py:152-161`).  IoUs are computed ONCE and reused across
    thresholds (the reference recomputes all rasterizations per threshold —
    10x the work for identical results)."""
    ious, fn_mask = slot_ious(Yp, Yt, grid)
    total = 0.0
    for t in MAP_THRESHOLDS:
        prec, tp, fp, fn = precision_from_ious(ious, fn_mask, float(t))
        if verbose:
            print(
                f"precision: thresh = {t}, tp, fp, fn = {tp} {fp} {fn} "
                f"-> {prec}"
            )
        total += prec
    return total / len(MAP_THRESHOLDS)
