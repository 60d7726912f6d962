"""Loss + selective-sigmoid tests: the jnp implementation is checked
against an independent strided-column formulation (mirroring the
reference's `custom_loss`/`my_loss` math, `/root/reference/spnet/models.py:
555-633`), and the Pallas kernels are checked against the jnp twins for
both value and gradient."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spnet_tpu.config import GridSpec, LossWeights, VARS_PER_PRED
from spnet_tpu.grid import normalize
from spnet_tpu.ops.activations import (
    selective_sigmoid_jnp,
    selective_sigmoid_pallas,
)
from spnet_tpu.ops.losses import (
    loss_components,
    spnet_loss,
    spnet_loss_pallas,
)

W = LossWeights()


def _strided_reference_loss(yt, yp, loss_type):
    """Independent numpy implementation using flat strided columns, the way
    the reference formulates it."""
    v = VARS_PER_PRED
    sq = (yt - yp) ** 2
    pobj = 1 - yt[:, 6::v]
    if loss_type == "same":
        loss = W.noobj * np.sum(sq[:, 6::v], axis=-1)
    else:
        t = yt[:, 6::v]
        z = yp[:, 6::v]
        loss = W.noobj * np.sum(
            np.maximum(0.0, z) - z * t + np.log1p(np.exp(-np.abs(z))), axis=-1
        )
    loss += W.center * (
        np.sum(pobj * sq[:, 0::v], -1) + np.sum(pobj * sq[:, 1::v], -1)
    )
    loss += W.size * (
        np.sum(pobj * sq[:, 2::v], -1) + np.sum(pobj * sq[:, 3::v], -1)
    )
    ab = yt[:, 2::v] - yt[:, 3::v]
    loss += W.angle * (
        np.sum(pobj * sq[:, 4::v] * ab**2, -1)
        + np.sum(pobj * sq[:, 5::v] * ab**2, -1)
    )
    loss += W.rings * np.sum(pobj * sq[:, 7::v], -1)
    return np.mean(loss / yt.shape[1])


def _rand_batch(seed=0, b=4):
    g = GridSpec()
    rng = np.random.default_rng(seed)
    # y_true: normalized encodings of plausible grids (mix of objects/empties)
    yt = np.tile(g.defaults.reshape(-1), (b, 1)).astype(np.float32)
    t3 = yt.reshape(b, -1, 8)
    obj = rng.random(t3.shape[:2]) < 0.15
    t3[..., 6] = np.where(obj, 0.0, 1.0)
    t3[..., 7] = np.where(obj, rng.uniform(1, 11, t3.shape[:2]), 0.0)
    t3[..., 0] += rng.normal(0, 20, t3.shape[:2])
    t3[..., 2] = rng.uniform(20, 100, t3.shape[:2])
    t3[..., 3] = rng.uniform(10, 60, t3.shape[:2])
    ytn = normalize(yt.reshape(b, -1), g).astype(np.float32)
    ypn = (ytn + rng.normal(0, 0.3, ytn.shape)).astype(np.float32)
    return ytn, ypn


@pytest.mark.parametrize("loss_type", ["same", "hybrid"])
def test_loss_matches_strided_reference(loss_type):
    yt, yp = _rand_batch(1)
    ours = float(jax.jit(
        lambda a, b: spnet_loss(a, b, W, loss_type)
    )(yt, yp))
    ref = _strided_reference_loss(yt.astype(np.float64), yp.astype(np.float64),
                                  loss_type)
    assert ours == pytest.approx(ref, rel=1e-5)


@pytest.mark.parametrize("loss_type", ["same", "hybrid"])
def test_components_sum_to_total(loss_type):
    yt, yp = _rand_batch(2)
    comps = jax.jit(
        lambda a, b: loss_components(a, b, W, loss_type)
    )(yt, yp)
    total = sum(float(comps[k]) for k in
                ["center", "size", "angle", "noobj", "rings"])
    assert float(comps["total"]) == pytest.approx(total, rel=1e-6)


@pytest.mark.parametrize("loss_type", ["same", "hybrid"])
def test_pallas_loss_matches_jnp(loss_type):
    yt, yp = _rand_batch(3)
    f_jnp = jax.jit(lambda a, b: spnet_loss(a, b, W, loss_type))
    f_pal = jax.jit(lambda a, b: spnet_loss_pallas(a, b, W, loss_type))
    assert float(f_pal(yt, yp)) == pytest.approx(float(f_jnp(yt, yp)),
                                                 rel=1e-5)


@pytest.mark.parametrize("loss_type", ["same", "hybrid"])
def test_pallas_loss_grad_matches_jnp(loss_type):
    yt, yp = _rand_batch(4)
    g_jnp = jax.jit(jax.grad(
        lambda p, t: spnet_loss(t, p, W, loss_type)))(yp, yt)
    g_pal = jax.jit(jax.grad(
        lambda p, t: spnet_loss_pallas(t, p, W, loss_type)))(yp, yt)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_jnp),
                               rtol=1e-4, atol=1e-6)


def test_selective_sigmoid():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 576)).astype(np.float32)
    y = np.asarray(jax.jit(selective_sigmoid_jnp)(x))
    # slot 6 of every predictor is sigmoided, everything else untouched
    expect = x.copy()
    expect[:, 6::8] = 1.0 / (1.0 + np.exp(-x[:, 6::8]))
    np.testing.assert_allclose(y, expect, rtol=1e-6)

    y_pal = np.asarray(jax.jit(selective_sigmoid_pallas)(x))
    np.testing.assert_allclose(y_pal, expect, rtol=1e-6)
