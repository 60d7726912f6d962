"""Fused separable-conv Pallas kernel vs its jnp twin (interpret mode
on CPU; the TPU measurement lives in scripts/bench_sepconv.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spnet_tpu.ops.sepconv_pallas import (
    fold_bn,
    sepconv_infer_jnp,
    sepconv_infer_pallas,
)


@pytest.mark.parametrize("relu", [True, False])
def test_fused_sepconv_matches_jnp_twin(relu):
    rng = np.random.default_rng(3)
    b, h, w, c, f = 4, 9, 9, 128, 128
    x = jnp.asarray(rng.normal(0, 1, (b, h, w, c)).astype(np.float32))
    dw = jnp.asarray(rng.normal(0, 0.2, (3, 3, c)).astype(np.float32))
    pw = jnp.asarray(
        rng.normal(0, 0.1, (c, f)).astype(np.float32))
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, f).astype(np.float32))
    beta = jnp.asarray(rng.normal(0, 0.3, f).astype(np.float32))
    mean = jnp.asarray(rng.normal(0, 0.2, f).astype(np.float32))
    var = jnp.asarray(rng.uniform(0.5, 2.0, f).astype(np.float32))
    scale, bias = fold_bn(gamma, beta, mean, var)

    ref = sepconv_infer_jnp(x, dw, pw, scale, bias, relu=relu)
    out = sepconv_infer_pallas(x, dw, pw, scale, bias, relu=relu,
                               batch_tile=2)
    assert out.shape == (b, h, w, f)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_sepconv_uneven_batch_tile():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 1, (6, 5, 5, 8)).astype(np.float32))
    dw = jnp.asarray(rng.normal(0, 0.2, (3, 3, 8)).astype(np.float32))
    pw = jnp.asarray(rng.normal(0, 0.1, (8, 16)).astype(np.float32))
    one = jnp.ones(16, jnp.float32)
    zero = jnp.zeros(16, jnp.float32)
    # batch_tile=4 does not divide 6 -> kernel degrades to 2
    ref = sepconv_infer_jnp(x, dw, pw, one, zero)
    out = sepconv_infer_pallas(x, dw, pw, one, zero, batch_tile=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
