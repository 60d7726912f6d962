"""Grid codec tests: geometry parity with the reference's
setup_means_and_ranges / true_to_pred_grid (`/root/reference/spnet/utils.py`),
plus encode/decode round-trips."""

import numpy as np
import pytest

from spnet_tpu.config import (
    GridSpec,
    IND_A,
    IND_ANGLE1,
    IND_B,
    IND_CX,
    IND_CY,
    IND_NOOBJ,
    IND_RINGS,
    VARS_PER_PRED,
)
from spnet_tpu.grid import (
    GridOverflowError,
    angle_deg_to_cs2,
    canonicalize_records,
    cs2_to_angle_deg,
    denormalize,
    ellipses_to_grid,
    grid_to_ellipses,
    normalize,
)


def test_gridspec_geometry_matches_reference():
    g = GridSpec()
    # reference: xbinsize = int((470-40)/6) = 71, ybinsize = int((350-40)/6) = 51
    assert g.xbinsize == 71
    assert g.ybinsize == 51
    assert g.pred_shape == (6, 6, 2, 8)
    assert g.num_outputs == 576


def test_gridspec_means_ranges_values():
    g = GridSpec()
    m = g.means.reshape(g.pred_shape)
    r = g.ranges.reshape(g.pred_shape)
    # cell (0,0) center: 0*71 + 40 + 35.5 = 75.5 ; 0*51 + 40 + 25.5 = 65.5
    assert m[0, 0, 0, IND_CX] == pytest.approx(75.5)
    assert m[0, 0, 0, IND_CY] == pytest.approx(65.5)
    assert m[0, 0, 0, IND_A] == pytest.approx(35.5)
    assert m[0, 0, 0, IND_B] == pytest.approx(25.5)
    assert m[0, 0, 0, IND_RINGS] == 5.0
    np.testing.assert_array_equal(
        r[0, 0, 0], [71, 51, 71, 51, 2, 2, 1, 10]
    )
    # cell (5,5) center: 5*71 + 40 + 35.5 = 430.5 ; 5*51 + 40 + 25.5 = 320.5
    assert m[5, 5, 1, IND_CX] == pytest.approx(430.5)
    assert m[5, 5, 1, IND_CY] == pytest.approx(320.5)


def test_defaults_empty_cell():
    g = GridSpec()
    d = g.defaults
    # default slot: angle encoded as cos2t=-1 (90 degrees), noobj=1, rings=0
    assert d[2, 3, 0, IND_ANGLE1] == -1.0
    assert d[2, 3, 0, IND_NOOBJ] == 1.0
    assert d[2, 3, 0, IND_RINGS] == 0.0
    assert d[2, 3, 1, IND_A] == pytest.approx(35.5)


def test_angle_codec_roundtrip():
    for ang in [1.0, 30.0, 90.0, 135.0, 179.0]:
        c, s = angle_deg_to_cs2(ang)
        back = float(cs2_to_angle_deg(c, s))
        assert back == pytest.approx(ang, abs=1e-4)
    # 180 wraps into (0, 180]
    c, s = angle_deg_to_cs2(180.0)
    assert float(cs2_to_angle_deg(c, s)) == pytest.approx(180.0, abs=1e-4)


def test_canonicalize_swaps_and_drops():
    raw = np.array(
        [
            [100, 100, 30, 60, 10, 3],   # b > a: swap, angle + 90
            [50, 50, 20, 10, 45, 0],     # rings = 0: dropped
            [200, 150, 40, 20, 170, 5],  # kept as-is
        ],
        dtype=np.float64,
    )
    recs = canonicalize_records(raw)
    assert recs.shape == (2, 8)
    # sorted by cx: first row is the swapped one (cx=100)
    r0 = recs[0]
    assert r0[IND_A] == 60 and r0[IND_B] == 30
    c, s = angle_deg_to_cs2(100.0)  # 10 + 90
    assert r0[4] == pytest.approx(c, abs=1e-6)
    assert r0[5] == pytest.approx(s, abs=1e-6)
    assert r0[IND_NOOBJ] == 0.0


def test_grid_assign_and_decode_roundtrip():
    g = GridSpec()
    raw = np.array(
        [
            [100, 100, 50, 30, 20, 4],
            [300, 200, 60, 25, 100, 7],
            [460, 340, 40, 20, 45, 2],
        ]
    )
    recs = canonicalize_records(raw)
    enc = ellipses_to_grid(recs, g)
    assert enc.shape == g.pred_shape
    dec = grid_to_ellipses(enc.reshape(-1), g)
    assert dec.shape == (3, 8)
    # decoded records match input set (sorted by cx already)
    np.testing.assert_allclose(
        np.sort(dec[:, IND_CX]), np.sort(recs[:, IND_CX]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.sort(dec[:, IND_RINGS]), [2, 4, 7], rtol=1e-6
    )


def test_grid_assign_out_of_region_clips():
    g = GridSpec()
    # centers outside active region [40,470]x[40,350] clip to edge cells
    recs = canonicalize_records(np.array([[5, 5, 20, 10, 30, 3]]))
    enc = ellipses_to_grid(recs, g)
    assert enc[0, 0, 0, IND_RINGS] == 3.0


def test_grid_overflow_raises():
    g = GridSpec()
    raw = np.array([[100, 100, 20, 10, 30, 1]] * 3)  # 3 into one cell, 2 slots
    # need distinct rows to survive canonicalization (no dedup there), same cell
    raw[:, 1] = [100, 110, 120]  # all in cell iy = int((cy-40)/51) = 1
    recs = canonicalize_records(raw)
    with pytest.raises(GridOverflowError):
        ellipses_to_grid(recs, g)


def test_normalize_roundtrip():
    g = GridSpec()
    rng = np.random.default_rng(0)
    y = rng.normal(size=(4, g.num_outputs)).astype(np.float32) * 100
    yn = normalize(y, g)
    back = denormalize(yn, g)
    np.testing.assert_allclose(back, y, rtol=1e-4, atol=1e-3)


def test_normalized_defaults_are_tame():
    """Empty-slot defaults normalize to small magnitudes — important for a
    stable loss at init."""
    g = GridSpec()
    yn = normalize(g.defaults.reshape(-1), g)
    assert np.max(np.abs(yn)) <= 1.0 + 1e-6
