"""Metric tests: golden IoU pin vs the reference value, cross-check against
an independent dense rasterization (and OpenCV where available), and
calc_errors parity against a direct loop implementation of the reference
semantics (`/root/reference/spnet/diagnostics.py`)."""

import numpy as np
import pytest

from spnet_tpu.config import GridSpec, IND_NOOBJ, IND_RINGS, VARS_PER_PRED
from spnet_tpu.eval.metrics import calc_errors, calc_map, precision
from spnet_tpu.grid import angle_deg_to_cs2
from spnet_tpu.ops.raster import (
    ellipse_mask_jit as ellipse_mask,
    pair_iou_jit as pair_iou,
)

REFERENCE_GOLDEN_IOU = 0.44227983107795693  # reference tests/test_diagnostics.py:15
# Our rasterizer's value for the same pair (half-pixel dilation instead of
# counting OpenCV's anti-aliased rim as opaque — see ops/raster.py docstring).
OUR_GOLDEN_IOU = 0.4380082258013877


def rec(cx, cy, a, b, angle_deg, noobj, rings):
    c, s = angle_deg_to_cs2(angle_deg)
    return np.array([cx, cy, a, b, c, s, noobj, rings], dtype=np.float32)


def test_golden_iou():
    r_t = rec(100, 140, 120, 60, 90, 0, 10.3)
    r_p = rec(120, 123, 120, 60, 149.97, 0, 7.8)
    iou = float(pair_iou(r_p[None], r_t[None])[0])
    assert iou == pytest.approx(OUR_GOLDEN_IOU, abs=1e-6)
    # documented delta vs the reference's AA-inflated golden
    assert abs(iou - REFERENCE_GOLDEN_IOU) < 0.005


def test_row_interval_matches_dense_mask():
    """Row-interval counting must EXACTLY reproduce dense pixel-center
    rasterization (same inside test)."""
    rng = np.random.default_rng(42)
    for _ in range(10):
        cx, cy = rng.uniform(60, 450), rng.uniform(60, 330)
        a, b = rng.uniform(20, 140), rng.uniform(10, 70)
        ang = rng.uniform(0, 180)
        a, b = max(a, b), min(a, b)
        r1 = rec(cx, cy, a, b, ang, 0, 1)
        cx2, cy2 = cx + rng.uniform(-40, 40), cy + rng.uniform(-40, 40)
        r2 = rec(cx2, cy2, a * 0.8, b * 1.1, ang + 30, 0, 1)

        # pair_iou negates the decoded angle (reference drawing convention)
        th1 = -np.arctan2(r1[5], r1[4]) / 2
        th2 = -np.arctan2(r2[5], r2[4]) / 2
        m1 = np.asarray(ellipse_mask(r1[0], r1[1], r1[2], r1[3], th1))
        m2 = np.asarray(ellipse_mask(r2[0], r2[1], r2[2], r2[3], th2))
        dense = np.logical_and(m1, m2).sum() / np.logical_or(m1, m2).sum()
        fast = float(pair_iou(r1[None], r2[None])[0])
        assert fast == pytest.approx(dense, abs=2e-6), (r1, r2)


def test_iou_vs_opencv():
    """Cross-check against OpenCV's non-AA fill on random ellipse pairs."""
    cv2 = pytest.importorskip("cv2")

    def draw(r):
        img = np.zeros((384, 512), np.uint8)
        ang = np.rad2deg(np.arctan2(r[5], r[4]) / 2)
        shift = 10
        cv2.ellipse(
            img,
            (int(round(r[0] * 2**shift)), int(round(r[1] * 2**shift))),
            (int(round(r[2] * 2**shift)), int(round(r[3] * 2**shift))),
            -ang, 0, 360, 255, -1, cv2.LINE_8, shift,
        )
        return img > 0

    rng = np.random.default_rng(7)
    for _ in range(8):
        r1 = rec(rng.uniform(100, 400), rng.uniform(100, 280),
                 rng.uniform(40, 120), rng.uniform(20, 60),
                 rng.uniform(1, 179), 0, 1)
        r2 = rec(r1[0] + rng.uniform(-30, 30), r1[1] + rng.uniform(-30, 30),
                 rng.uniform(40, 120), rng.uniform(20, 60),
                 rng.uniform(1, 179), 0, 1)
        m1, m2 = draw(r1), draw(r2)
        ref = np.logical_and(m1, m2).sum() / np.logical_or(m1, m2).sum()
        ours = float(pair_iou(r1[None], r2[None])[0])
        assert ours == pytest.approx(ref, abs=5e-3)


def test_iou_sentinels():
    present = rec(100, 100, 50, 30, 45, 0, 3)
    absent = rec(100, 100, 50, 30, 45, 1, 0)
    # true absent -> -1
    assert float(pair_iou(present[None], absent[None])[0]) == -1.0
    # pred absent, true present -> 0
    assert float(pair_iou(absent[None], present[None])[0]) == 0.0
    # identical -> 1
    assert float(pair_iou(present[None], present[None])[0]) == pytest.approx(1.0)


def _calc_errors_reference_loop(Yp, Yt):
    """Direct (slow) implementation of diagnostics.py:13-59 semantics."""
    s = Yt.shape[1] // VARS_PER_PRED
    ring_mis = ring_true = total = fpos = fneg = tpos = tneg = 0
    for j in range(Yt.shape[0]):
        for an in range(s):
            ind = IND_RINGS + an * VARS_PER_PRED
            i_no = IND_NOOBJ + an * VARS_PER_PRED
            if 0 == int(np.rint(Yt[j, i_no])):
                total += 1
                if 0 == int(np.rint(Yp[j, i_no])):
                    tpos += 1
                    if abs(Yt[j, ind] - Yp[j, ind]) > 0.5:
                        ring_mis += 1
                    else:
                        ring_true += 1
                else:
                    fneg += 1
            else:
                if 0 == int(np.rint(Yp[j, i_no])):
                    fpos += 1
                else:
                    tneg += 1
    return ring_mis, ring_true, total, fpos, fneg, tpos, tneg


def test_calc_errors_matches_reference_loop():
    rng = np.random.default_rng(3)
    g = GridSpec()
    n = 12
    Yt = np.zeros((n, g.num_outputs), np.float64)
    Yp = rng.normal(size=(n, g.num_outputs)) * 3
    t3 = Yt.reshape(n, -1, 8)
    t3[..., IND_NOOBJ] = rng.integers(0, 2, t3.shape[:2])
    t3[..., IND_RINGS] = rng.uniform(0, 11, t3.shape[:2])
    p3 = Yp.reshape(n, -1, 8)
    p3[..., IND_NOOBJ] = rng.uniform(-0.2, 1.2, p3.shape[:2])
    p3[..., IND_RINGS] = rng.uniform(0, 11, p3.shape[:2])

    st = calc_errors(Yp, Yt)
    ref = _calc_errors_reference_loop(Yp, Yt)
    got = (st.ring_miscounts, st.ring_truecounts, st.total_obj,
           st.false_obj_pos, st.false_obj_neg, st.true_obj_pos,
           st.true_obj_neg)
    assert got == ref
    # pix_err uses flat columns 0,1 only
    np.testing.assert_allclose(
        st.pix_err,
        np.sqrt((Yp[:, 0] - Yt[:, 0]) ** 2 + (Yp[:, 1] - Yt[:, 1]) ** 2),
    )


def test_precision_and_map_perfect_predictions():
    g = GridSpec()
    n = 4
    Yt = np.tile(g.defaults.reshape(-1), (n, 1)).astype(np.float64)
    t3 = Yt.reshape(n, -1, 8)
    # place one object per image
    for j in range(n):
        t3[j, j, :] = [100 + 30 * j, 140, 80, 40,
                       *angle_deg_to_cs2(30.0 * j + 10), 0, 5]
    Yp = Yt.copy()
    prec, tp, fp, fn = precision(Yp, Yt, thresh=0.5, grid=g)
    assert (prec, tp, fp, fn) == (1.0, n, 0, 0)
    assert calc_map(Yp, Yt, grid=g) == pytest.approx(1.0)

    # knock out one prediction -> fn at every threshold
    p3 = Yp.reshape(n, -1, 8)
    p3[0, 0, IND_NOOBJ] = 1.0
    assert calc_map(Yp, Yt, grid=g) == pytest.approx((n - 1) / n)


def test_golden_iou_aa_mode():
    """aa=True reproduces the reference's count-AA-rim-as-opaque masks:
    the golden pair must land within 1e-3 of the reference's pinned
    0.44227983107795693 (round-4 VERDICT's last eval-parity gap)."""
    r_t = rec(100, 140, 120, 60, 90, 0, 10.3)
    r_p = rec(120, 123, 120, 60, 149.97, 0, 7.8)
    iou = float(pair_iou(r_p[None], r_t[None], aa=True)[0])
    assert abs(iou - REFERENCE_GOLDEN_IOU) < 1e-3, iou


def test_iou_aa_vs_opencv_linea():
    """AA mode cross-checked against cv2.ellipse(LINE_AA)+countNonZero
    (the reference's exact mask semantics, diagnostics.py:64-121) on
    random typical pairs."""
    cv2 = pytest.importorskip("cv2")

    def draw(r):
        img = np.zeros((384, 512), np.uint8)
        ang = np.rad2deg(np.arctan2(r[5], r[4]) / 2)
        shift = 10
        cv2.ellipse(
            img,
            (int(round(r[0] * 2**shift)), int(round(r[1] * 2**shift))),
            (int(round(r[2] * 2**shift)), int(round(r[3] * 2**shift))),
            -ang, 0, 360, 255, -1, cv2.LINE_AA, shift,
        )
        return img > 0

    rng = np.random.default_rng(13)
    for _ in range(8):
        r1 = rec(rng.uniform(100, 400), rng.uniform(100, 280),
                 rng.uniform(40, 120), rng.uniform(20, 60),
                 rng.uniform(1, 179), 0, 1)
        r2 = rec(r1[0] + rng.uniform(-30, 30), r1[1] + rng.uniform(-30, 30),
                 rng.uniform(40, 120), rng.uniform(20, 60),
                 rng.uniform(1, 179), 0, 1)
        m1, m2 = draw(r1), draw(r2)
        ref = np.logical_and(m1, m2).sum() / np.logical_or(m1, m2).sum()
        ours = float(pair_iou(r1[None], r2[None], aa=True)[0])
        assert ours == pytest.approx(ref, abs=8e-3)
