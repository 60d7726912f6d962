"""On-device rasterized-ellipse geometry: masks, pixel areas, pairwise IoU.

Replaces the reference's OpenCV-based IoU path
(`/root/reference/spnet/diagnostics.py:64-121`), which rasterizes each
ellipse pair into 512x384 uint8 images on the host (the slow, CPU-bound
part of evaluation — SURVEY.md §3.2).

TPU-native design: instead of materializing masks, we count covered pixel
centers *per row* analytically.  For a rotated ellipse, the covered pixels
of row y form a contiguous integer interval obtained by solving a quadratic
in x; counting integers in interval intersections reproduces EXACTLY the
pixel sets of a center-sampled rasterization at 1/512th the work, and is a
pure vectorized map (vmap over pairs x rows) that XLA fuses onto the VPU.

Boundary convention: the reference counts OpenCV's anti-aliased rim pixels
as fully opaque (cv2.countNonZero over a LINE_AA fill), which dilates each
mask by >1px and inflates the golden IoU (0.44227983107795693) relative to
the true pixel IoU.  The default mode uses a half-pixel dilation
(pad=0.5), which matches OpenCV's *non-anti-aliased* fill to ~2e-4 IoU;
for the reference's golden ellipse pair we measure 0.438008 (delta
0.0043, documented + pinned in tests/test_metrics.py).

AA mode (`pair_iou(..., aa=True)`): models the reference's
count-AA-rim-as-opaque semantics as a 1.5 px boundary dilation —
calibrated against cv2.ellipse(LINE_AA, shift=10) + countNonZero: the
golden pair lands at 0.442308 (|delta| 3e-5 vs the reference golden,
closing the round-4 eval-parity gap) and random typical pairs track
cv2-AA within ~5e-3 (the constant-pad model is approximate: a true
+d offset of an ellipse is not an ellipse, and cv2's faintest AA rim
pixels reach varying distances; pinned in tests/test_metrics.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spnet_tpu.config import ORIG_IMG_HEIGHT, ORIG_IMG_WIDTH

#: Half-pixel boundary dilation (see module docstring).
BOUNDARY_PAD = 0.5
#: Dilation reproducing the reference's AA-rim-as-opaque masks.
BOUNDARY_PAD_AA = 1.5


def _row_intervals(cx, cy, a, b, theta, h: int, w: int,
                   pad: float = BOUNDARY_PAD):
    """Integer-pixel coverage interval per row for one rotated ellipse.

    Returns (lo, hi): int32 arrays of shape (h,) such that row y covers
    integer x in [lo[y], hi[y]] (empty iff lo > hi).  The inside test is
    ((dx*c + dy*s)/a)^2 + ((-dx*s + dy*c)/b)^2 <= 1 at pixel centers,
    with a/b pre-dilated by `pad` and clamped to >= 0.
    """
    a = jnp.maximum(a, 0.0) + pad
    b = jnp.maximum(b, 0.0) + pad
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    inv_a2 = 1.0 / (a * a)
    inv_b2 = 1.0 / (b * b)

    y = jax.lax.broadcasted_iota(jnp.float32, (h, 1), 0).squeeze(-1)
    dy = y - cy
    # quadratic A*dx^2 + B*dx + C <= 0
    A = c * c * inv_a2 + s * s * inv_b2
    B = 2.0 * c * s * dy * (inv_a2 - inv_b2)
    C = dy * dy * (s * s * inv_a2 + c * c * inv_b2) - 1.0
    disc = B * B - 4.0 * A * C
    valid = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    x0 = cx + (-B - sq) / (2.0 * A)
    x1 = cx + (-B + sq) / (2.0 * A)
    lo = jnp.maximum(jnp.ceil(x0), 0.0).astype(jnp.int32)
    hi = jnp.minimum(jnp.floor(x1), float(w - 1)).astype(jnp.int32)
    # empty rows: force lo > hi
    lo = jnp.where(valid, lo, 1)
    hi = jnp.where(valid, hi, 0)
    return lo, hi


def _params_to_geom(rec):
    """Canonical 8-var record -> (cx, cy, a, b, theta_rad, present).

    present iff noobj < 0.5 (reference `create_ellipse_image`,
    `diagnostics.py:75`).  theta from (cos 2t, sin 2t), NEGATED to match
    the reference's drawing convention (`utils.py:50`): each ellipse is
    mirrored about the horizontal line through its own center, which
    changes the relative geometry of a pair, so the sign must agree.
    """
    cx, cy, a, b, cos2t, sin2t, noobj = (rec[k] for k in range(7))
    theta = -jnp.arctan2(sin2t, cos2t) / 2.0
    present = noobj < 0.5
    return cx, cy, a, b, theta, present


def _pair_iou_one(rec_p, rec_t, h: int, w: int,
                  pad: float = BOUNDARY_PAD):
    """IoU of one (pred, true) record pair; reference semantics
    (`diagnostics.py:82-120`):
      * true absent (noobj > 0.99)        -> -1
      * both masks empty                  -> -1
      * else                              -> |A&B| / |A|B|
    An absent ellipse contributes an empty mask (so one-sided absence
    gives 0).  Degenerate axes (a or b <= 0) give an empty mask rather
    than the reference's cv2 exception.
    """
    cxp, cyp, ap, bp, thp, pres_p = _params_to_geom(rec_p)
    cxt, cyt, at, bt, tht, pres_t = _params_to_geom(rec_t)

    lo_p, hi_p = _row_intervals(cxp, cyp, ap, bp, thp, h, w, pad)
    lo_t, hi_t = _row_intervals(cxt, cyt, at, bt, tht, h, w, pad)
    # absent -> empty interval
    lo_p = jnp.where(pres_p, lo_p, 1)
    hi_p = jnp.where(pres_p, hi_p, 0)
    lo_t = jnp.where(pres_t, lo_t, 1)
    hi_t = jnp.where(pres_t, hi_t, 0)

    cnt_p = jnp.maximum(hi_p - lo_p + 1, 0)
    cnt_t = jnp.maximum(hi_t - lo_t + 1, 0)
    cnt_i = jnp.maximum(jnp.minimum(hi_p, hi_t) - jnp.maximum(lo_p, lo_t) + 1, 0)

    num_p = jnp.sum(cnt_p)
    num_t = jnp.sum(cnt_t)
    num_i = jnp.sum(cnt_i)
    num_u = num_p + num_t - num_i

    iou = jnp.where(num_u > 0, num_i.astype(jnp.float32) / num_u, -1.0)
    true_absent = rec_t[6] > 0.99
    return jnp.where(true_absent, -1.0, iou)


def pair_iou(
    recs_p,
    recs_t,
    h: int = ORIG_IMG_HEIGHT,
    w: int = ORIG_IMG_WIDTH,
    aa: bool = False,
):
    """Batched pairwise ellipse IoU.

    recs_p, recs_t: (K, 8) denormalized records
    [cx, cy, a, b, cos2t, sin2t, noobj, rings].
    aa=True reproduces the reference's AA-rim-as-opaque masks (module
    docstring; golden-pair parity |delta| 3e-5).
    Returns (K,) float32 IoUs (with the -1 sentinel semantics above).
    """
    recs_p = jnp.asarray(recs_p, dtype=jnp.float32)
    recs_t = jnp.asarray(recs_t, dtype=jnp.float32)
    pad = BOUNDARY_PAD_AA if aa else BOUNDARY_PAD
    fn = jax.vmap(lambda p, t: _pair_iou_one(p, t, h, w, pad))
    return fn(recs_p, recs_t)


pair_iou_jit = jax.jit(pair_iou, static_argnames=("h", "w", "aa"))


def ellipse_mask(
    cx,
    cy,
    a,
    b,
    theta,
    h: int = ORIG_IMG_HEIGHT,
    w: int = ORIG_IMG_WIDTH,
):
    """Full boolean mask (h, w) of one rotated ellipse — used by the
    synthetic generator and for tests (equivalent to the row-interval
    counting; kept O(h*w) because callers need the image)."""
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    a = jnp.maximum(a, 0.0) + BOUNDARY_PAD
    b = jnp.maximum(b, 0.0) + BOUNDARY_PAD
    c, s = jnp.cos(theta), jnp.sin(theta)
    dx, dy = xs - cx, ys - cy
    u = dx * c + dy * s
    v = -dx * s + dy * c
    return (u / a) ** 2 + (v / b) ** 2 <= 1.0


ellipse_mask_jit = jax.jit(ellipse_mask, static_argnames=("h", "w"))
