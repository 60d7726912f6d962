"""Fused separable-conv Pallas kernel vs its jnp twin (interpret mode
on CPU; the TPU measurement lives in scripts/bench_sepconv.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spnet_tpu.ops.sepconv_pallas import (
    fold_bn,
    sepconv_fits_vmem,
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
    out = sepconv_infer_pallas(x, dw, pw, scale, bias, relu=relu)
    assert out.shape == (b, h, w, f)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_sepconv_unaligned_w():
    """w not a sublane multiple: the kernel pads w internally before the
    (h, wp, c) -> (h*wp, c) collapse (the round-3 Mosaic reject was
    exactly this unaligned collapse)."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 1, (6, 5, 5, 8)).astype(np.float32))
    dw = jnp.asarray(rng.normal(0, 0.2, (3, 3, 8)).astype(np.float32))
    pw = jnp.asarray(rng.normal(0, 0.1, (8, 16)).astype(np.float32))
    one = jnp.ones(16, jnp.float32)
    zero = jnp.zeros(16, jnp.float32)
    ref = sepconv_infer_jnp(x, dw, pw, one, zero)
    out = sepconv_infer_pallas(x, dw, pw, one, zero)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sepconv_vmem_gate():
    """Xception-331 levels (stem halves 331->165, backbone conv1 halves
    again): the dominant 21x21x728 middle-flow shapes and the 42x42
    level fit the whole-image VMEM budget; the 83x83 and entry-flow
    levels do not (those use the XLA chain)."""
    assert sepconv_fits_vmem(21, 21, 728, 728)
    assert sepconv_fits_vmem(42, 42, 256, 256)
    assert sepconv_fits_vmem(11, 11, 1024, 1536)
    assert not sepconv_fits_vmem(83, 83, 128, 128)
    assert not sepconv_fits_vmem(165, 165, 128, 256)
