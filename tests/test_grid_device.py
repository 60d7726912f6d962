"""On-device grid encoding + train-time geometric augmentation.

Pins the jit-compatible label pipeline (ops/grid_encode +
ops/augment.geo_augment_batch) against the host codec that mirrors the
reference (`/root/reference/spnet/utils.py:191-244`,
`/root/reference/spnet/augmentation.py:82-239`).
"""

import jax
import jax.numpy as jnp
import numpy as np

from spnet_tpu.config import GridSpec
from spnet_tpu.grid import batch_ellipses_to_grid, canonicalize_records, \
    normalize
from spnet_tpu.ops.augment import apply_geo_batch, geo_augment_batch, \
    sample_geo_params
from spnet_tpu.ops.grid_encode import encode_batch_device


def _random_rows(rng, b, n=12, p_fill=0.6):
    rows = np.zeros((b, n, 6), np.float32)
    mask = np.zeros((b, n), bool)
    for i in range(b):
        k = rng.integers(0, 9)
        for j in range(k):
            rows[i, j] = [
                rng.uniform(-20, 540), rng.uniform(-20, 400),
                rng.uniform(15, 120), rng.uniform(10, 80),
                rng.uniform(0, 180),
                # include rings <= 0 rows (must be dropped, like the
                # reference's parse filter)
                rng.integers(-1, 11),
            ]
            mask[i, j] = True
    return rows, mask


def _host_encode(rows, mask, grid):
    recs = [canonicalize_records(rows[i][mask[i]])
            for i in range(rows.shape[0])]
    return normalize(
        batch_ellipses_to_grid(recs, grid, on_overflow="drop"), grid
    ).astype(np.float32)


def test_encode_device_matches_host():
    """Random padded rows (invalid slots, rings<=0, b>a swaps, centers
    outside the active region) must encode identically to the host
    canonicalize -> ellipses_to_grid(drop) -> normalize path."""
    grid = GridSpec()
    rng = np.random.default_rng(7)
    rows, mask = _random_rows(rng, 32)
    y_host = _host_encode(rows, mask, grid)
    y_dev = np.asarray(
        jax.jit(lambda r, m: encode_batch_device(r, m, grid))(rows, mask)
    )
    np.testing.assert_allclose(y_dev, y_host, atol=2e-5)


def test_encode_device_overflow_drops():
    """Three ellipses in one cell with 2 slots: the first two (in sorted
    (cx, cy) order) fill the slots, the third is silently dropped."""
    grid = GridSpec()
    rows = np.zeros((1, 12, 6), np.float32)
    mask = np.zeros((1, 12), bool)
    # all three in the same cell; deliberately out of sorted order
    rows[0, 0] = [100, 60, 30, 20, 10, 3]
    rows[0, 1] = [90, 55, 25, 15, 40, 2]
    rows[0, 2] = [95, 50, 28, 18, 70, 5]
    mask[0, :3] = True
    y_dev = np.asarray(encode_batch_device(rows, mask, grid))
    y_host = _host_encode(rows, mask, grid)
    np.testing.assert_allclose(y_dev, y_host, atol=2e-5)


def _identity_params(b):
    return {
        "mode": jnp.zeros(b, jnp.int32),
        "theta": jnp.zeros(b),
        "tx": jnp.zeros(b),
        "ty": jnp.zeros(b),
    }


def test_geo_identity_is_exact():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 331, 331, 1)).astype(np.float32))
    rows = np.asarray(rng.uniform(10, 300, (4, 5, 6)).astype(np.float32))
    rows[..., 4] = rng.uniform(0, 180, (4, 5))  # angle column in [0, 180)
    rows = jnp.asarray(rows)
    mask = jnp.ones((4, 5), bool)
    xo, ro = apply_geo_batch(x, rows, mask, _identity_params(4))
    assert float(jnp.abs(xo - x).max()) == 0.0
    assert float(jnp.abs(ro - rows).max()) == 0.0


def test_geo_translate_native_exact():
    """Pure integer translation at native resolution is an exact pixel
    shift, and labels move by exactly (tx, ty) (reference
    `translate_image`, augmentation.py:216-239)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 384, 512, 1)).astype(np.float32))
    rows = np.zeros((2, 3, 6), np.float32)
    rows[:, 0] = [250, 190, 80, 40, 30, 4]
    mask = np.zeros((2, 3), bool)
    mask[:, 0] = True
    params = _identity_params(2)
    params["tx"] = jnp.full(2, 20.0)
    params["ty"] = jnp.full(2, -10.0)
    xo, ro = apply_geo_batch(x, jnp.asarray(rows), jnp.asarray(mask),
                             params, fill=0.0)
    expected = np.zeros((2, 384, 512, 1), np.float32)
    expected[:, : 384 - 10, 20:, :] = np.asarray(x)[:, 10:, : 512 - 20, :]
    np.testing.assert_array_equal(np.asarray(xo), expected)
    assert tuple(np.asarray(ro)[0, 0, :2]) == (270.0, 180.0)


def test_geo_flip_matches_reference_label_math():
    """Flip label remaps match the reference (`flip_image`,
    augmentation.py:82-112): v: cy -> H - cy, ang -> -ang;
    h: cx -> W - cx, ang -> 180 - ang; both: both coords, ang
    unchanged mod 180."""
    rows = np.zeros((3, 1, 6), np.float32)
    rows[:, 0] = [250, 190, 80, 40, 30, 4]
    mask = np.ones((3, 1), bool)
    x = jnp.zeros((3, 384, 512, 1))
    params = _identity_params(3)
    params["mode"] = jnp.asarray([1, 2, 3], jnp.int32)
    _, ro = apply_geo_batch(x, jnp.asarray(rows), jnp.asarray(mask),
                            params, fill=0.0)
    ro = np.asarray(ro)
    # vertical
    assert tuple(ro[0, 0, :2]) == (250.0, 384.0 - 190.0)
    assert ro[0, 0, 4] == (-30.0) % 180.0
    # horizontal
    assert tuple(ro[1, 0, :2]) == (512.0 - 250.0, 190.0)
    assert ro[1, 0, 4] == 150.0
    # both
    assert tuple(ro[2, 0, :2]) == (512.0 - 250.0, 384.0 - 190.0)
    assert ro[2, 0, 4] % 180.0 == 30.0


def test_geo_warp_keeps_rings_inside_transformed_ellipse():
    """End-to-end geometry guard: render an antinode's ring pattern,
    warp image AND labels with a mixed flip+rotate+translate, and check
    the warped ring pixels lie inside the remapped label ellipse — any
    sign/convention mismatch between the image affine and the label
    remap fails this."""
    from spnet_tpu.data.synth import _render_antinode
    from spnet_tpu.ops.raster import ellipse_mask_jit

    ys = np.arange(384, dtype=np.float32)[:, None] * np.ones(
        (1, 512), np.float32)
    xs = np.ones((384, 1), np.float32) * np.arange(
        512, dtype=np.float32)[None]
    cx, cy, a, b, ang, rings = 260.0, 180.0, 90.0, 45.0, 35.0, 4.0
    on, _ = jax.jit(_render_antinode)(
        jnp.asarray(xs), jnp.asarray(ys), 1.0, cx, cy, a, b, ang, rings,
        0.0,
    )
    img = jnp.asarray(on, jnp.float32)[None, :, :, None]

    rows = np.zeros((1, 2, 6), np.float32)
    rows[0, 0] = [cx, cy, a, b, ang, rings]
    mask = np.zeros((1, 2), bool)
    mask[0, 0] = True

    for mode, theta, tx, ty in [(0, 25.0, 30.0, -20.0),
                                (2, -18.0, -25.0, 15.0),
                                (3, 12.0, 0.0, 0.0),
                                (1, -9.0, 10.0, 35.0)]:
        params = {
            "mode": jnp.asarray([mode], jnp.int32),
            "theta": jnp.asarray([theta]),
            "tx": jnp.asarray([tx]),
            "ty": jnp.asarray([ty]),
        }
        xo, ro = apply_geo_batch(img, jnp.asarray(rows),
                                 jnp.asarray(mask), params, fill=0.0)
        ncx, ncy, na, nb, nang, _ = np.asarray(ro)[0, 0]
        warped = np.asarray(xo)[0, :, :, 0] > 0.5
        label_mask = np.asarray(ellipse_mask_jit(
            float(ncx), float(ncy), float(na) * 1.05 + 3,
            float(nb) * 1.05 + 3, float(-np.deg2rad(nang)),
        ))
        assert warped.sum() > 200
        frac = (warped & label_mask).sum() / warped.sum()
        assert frac > 0.99, (mode, theta, tx, ty, frac)


def test_geo_resized_conjugation_consistent():
    """Warping the RESIZED image with the conjugated affine must agree
    with warping at native resolution then resizing (smooth image,
    loose tolerance for interpolation)."""
    yy, xx = np.meshgrid(np.linspace(0, 1, 384), np.linspace(0, 1, 512),
                         indexing="ij")
    smooth = np.sin(3 * xx + 1) * np.cos(2 * yy) + 0.2 * xx
    native = jnp.asarray(smooth, jnp.float32)[None, :, :, None]
    resized = jax.image.resize(native, (1, 331, 331, 1), "linear")
    rows = jnp.zeros((1, 1, 6))
    mask = jnp.zeros((1, 1), bool)
    params = {
        "mode": jnp.asarray([2], jnp.int32),
        "theta": jnp.asarray([17.0]),
        "tx": jnp.asarray([24.0]),
        "ty": jnp.asarray([-13.0]),
    }
    warp_resized, _ = apply_geo_batch(resized, rows, mask, params,
                                      fill=0.0)
    warp_native, _ = apply_geo_batch(native, rows, mask, params, fill=0.0)
    expected = jax.image.resize(warp_native, (1, 331, 331, 1), "linear")
    # the rotated fill border cuts diagonally through the frame and the
    # two pipelines disagree by half a pixel along it; compare only where
    # BOTH pipelines are clearly in-bounds (warped ones-mask ~ 1)
    ones_r = jnp.ones_like(resized)
    ones_n = jnp.ones_like(native)
    m1, _ = apply_geo_batch(ones_r, rows, mask, params, fill=0.0)
    m2, _ = apply_geo_batch(ones_n, rows, mask, params, fill=0.0)
    m2 = jax.image.resize(m2, (1, 331, 331, 1), "linear")
    valid = (np.asarray(m1) > 0.999) & (np.asarray(m2) > 0.999)
    # erode the validity mask a couple pixels
    from scipy.ndimage import binary_erosion

    valid = binary_erosion(valid[0, :, :, 0], iterations=3)
    d = np.abs(np.asarray(warp_resized - expected))[0, :, :, 0]
    assert valid.sum() > 50_000
    assert d[valid].max() < 0.02, d[valid].max()


def test_geo_transform_then_encode_invariance():
    """The full train-step label path: device geo-transform + device
    encode must equal host-encoding the (same) transformed rows — i.e.
    'encoded labels of transformed frames match transform-then-encode'."""
    grid = GridSpec()
    rng = np.random.default_rng(3)
    rows, mask = _random_rows(rng, 16)
    x = jnp.asarray(rng.normal(size=(16, 64, 64, 1)).astype(np.float32))
    key = jax.random.key(42)

    @jax.jit
    def device_path(x, rows, mask):
        params = sample_geo_params(key, 16)
        xo, ro = apply_geo_batch(x, rows, mask, params,
                                 img_w=grid.img_width,
                                 img_h=grid.img_height)
        return xo, ro, encode_batch_device(ro, mask, grid)

    _, ro, y_dev = device_path(x, jnp.asarray(rows), jnp.asarray(mask))
    y_host = _host_encode(np.asarray(ro), mask, grid)
    np.testing.assert_allclose(np.asarray(y_dev), y_host, atol=2e-5)


def test_geo_augment_batch_trains_shapes():
    """geo_augment_batch is vmappable/jittable end to end and leaves
    masked (padding) rows untouched."""
    rng = np.random.default_rng(5)
    rows, mask = _random_rows(rng, 8)
    sentinel = rows.copy()
    x = jnp.asarray(rng.normal(size=(8, 96, 96, 1)).astype(np.float32))
    xo, ro = jax.jit(geo_augment_batch)(
        x, jnp.asarray(rows), jnp.asarray(mask), jax.random.key(0)
    )
    assert xo.shape == x.shape and ro.shape == rows.shape
    ro = np.asarray(ro)
    np.testing.assert_array_equal(ro[~mask], sentinel[~mask])
