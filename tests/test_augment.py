"""Augmentation tests.

The load-bearing property (the reference validated it only by eyeball,
`tests/test_augemtation.py` cv2.imshow loops): after flip / rotate /
translate, the REMAPPED ellipse labels still cover the transformed image
content.  We verify it by rendering a filled ellipse, warping the image,
and measuring IoU between the warped mask and a mask rendered from the
remapped labels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spnet_tpu.grid import angle_deg_to_cs2
from spnet_tpu.ops.augment import (
    augment_on_the_fly,
    cutout,
    flip_image_and_labels,
    rotate_image_and_labels,
    salt_and_pepper,
    translate_image_and_labels,
)
from spnet_tpu.ops.raster import ellipse_mask_jit

H, W = 384, 512


def _mask_from_label(cx, cy, a, b, angle_deg):
    """Label -> pixel mask with the shared display convention (-angle on
    the y-down grid)."""
    th = -np.deg2rad(angle_deg)
    return np.asarray(ellipse_mask_jit(float(cx), float(cy), float(a),
                                       float(b), float(th)))


def _iou(m1, m2):
    return np.logical_and(m1, m2).sum() / max(np.logical_or(m1, m2).sum(), 1)


def _label_img(row):
    m = _mask_from_label(*row[:5])
    return m.astype(np.float32)[..., None]


ROW = np.array([[200.0, 150.0, 90.0, 40.0, 25.0, 3.0]], np.float32)
MASK1 = np.array([True])


@pytest.mark.parametrize("mode", [0, 1, -1])
def test_flip_label_image_consistency(mode):
    img = _label_img(ROW[0])
    out_img, out_rows = flip_image_and_labels(
        jnp.asarray(img), jnp.asarray(ROW), jnp.asarray(MASK1), mode
    )
    out_img = np.asarray(out_img)[..., 0] > 0.5
    remapped = _mask_from_label(*np.asarray(out_rows)[0, :5])
    assert _iou(out_img, remapped) > 0.95, mode  # 1px offset from the reference H-cy convention


@pytest.mark.parametrize("angle", [-18.0, 7.5, 20.0])
def test_rotate_label_image_consistency(angle):
    img = _label_img(ROW[0])
    out_img, out_rows = jax.jit(
        rotate_image_and_labels, static_argnames=()
    )(jnp.asarray(img), jnp.asarray(ROW), jnp.asarray(MASK1), angle)
    out_img = np.asarray(out_img)[..., 0] > 0.5
    remapped = _mask_from_label(*np.asarray(out_rows)[0, :5])
    assert _iou(out_img, remapped) > 0.93, angle


@pytest.mark.parametrize("t", [(30.0, -20.0), (-40.0, 15.0)])
def test_translate_label_image_consistency(t):
    img = _label_img(ROW[0])
    out_img, out_rows = translate_image_and_labels(
        jnp.asarray(img), jnp.asarray(ROW), jnp.asarray(MASK1), *t
    )
    out_img = np.asarray(out_img)[..., 0] > 0.5
    remapped = _mask_from_label(*np.asarray(out_rows)[0, :5])
    assert _iou(out_img, remapped) > 0.97, t


def test_flip_twice_restores():
    img = _label_img(ROW[0])
    i1, r1 = flip_image_and_labels(jnp.asarray(img), jnp.asarray(ROW),
                                   jnp.asarray(MASK1), 1)
    i2, r2 = flip_image_and_labels(i1, r1, jnp.asarray(MASK1), 1)
    np.testing.assert_allclose(np.asarray(i2), img)
    r2 = np.asarray(r2)[0]
    assert r2[0] == ROW[0, 0] and r2[1] == ROW[0, 1]
    # angle equal mod 180
    c0, s0 = angle_deg_to_cs2(ROW[0, 4])
    c2, s2 = angle_deg_to_cs2(r2[4])
    assert c2 == pytest.approx(c0, abs=1e-5)
    assert s2 == pytest.approx(s0, abs=1e-5)


def test_label_preserving_ops_keep_shape_and_range():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (4, 96, 96, 1)).astype(np.float32))
    key = jax.random.key(0)
    for fn in (cutout, salt_and_pepper):
        out = np.asarray(fn(x, key))
        assert out.shape == x.shape
        assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6
    out = np.asarray(jax.jit(augment_on_the_fly)(x, key))
    assert out.shape == x.shape
    assert np.isfinite(out).all()


def test_cutout_changes_pixels_sometimes():
    x = jnp.zeros((8, 96, 96, 1), jnp.float32)
    # constant image: cutout fills with values from [min, max] = {0} -> no
    # visible change; use a gradient instead
    g = jnp.linspace(-1, 1, 96)[None, :, None, None]
    x = x + g.transpose(0, 3, 1, 2).reshape(1, 96, 1, 1)  # noop-ish
    x = jnp.broadcast_to(jnp.linspace(-1, 1, 96)[None, :, None, None],
                         (8, 96, 96, 1))
    out = np.asarray(cutout(x, jax.random.key(3)))
    assert (out != np.asarray(x)).any()
