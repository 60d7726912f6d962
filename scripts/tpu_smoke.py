#!/usr/bin/env python3
"""On-hardware smoke test of the Pallas custom ops (the CPU test suite
exercises them in interpreter mode; this verifies the compiled Mosaic
kernels on a real TPU): fused loss fwd/bwd + selective sigmoid vs their
jnp twins.

Run on the TPU host: python scripts/tpu_smoke.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from spnet_tpu.config import LossWeights
from spnet_tpu.ops.activations import (
    selective_sigmoid_jnp,
    selective_sigmoid_pallas,
)
from spnet_tpu.ops.losses import spnet_loss, spnet_loss_pallas


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    w = LossWeights()
    yt = rng.normal(0, 0.3, (16, 576)).astype(np.float32)
    yp = rng.normal(0, 0.3, (16, 576)).astype(np.float32)

    for lt in ("same", "hybrid"):
        f_j = jax.jit(lambda a, b, lt=lt: spnet_loss(a, b, w, lt))
        f_p = jax.jit(lambda a, b, lt=lt: spnet_loss_pallas(a, b, w, lt))
        vj, vp = float(f_j(yt, yp)), float(f_p(yt, yp))
        assert abs(vj - vp) < 1e-5 * max(abs(vj), 1), (lt, vj, vp)
        g_j = jax.jit(jax.grad(lambda p, t, lt=lt: spnet_loss(t, p, w, lt)))(
            yp, yt)
        g_p = jax.jit(jax.grad(
            lambda p, t, lt=lt: spnet_loss_pallas(t, p, w, lt)))(yp, yt)
        err = float(jnp.abs(g_j - g_p).max())
        assert err < 1e-5, (lt, err)
        print(f"pallas loss [{lt}]: fwd {vp:.6f} == {vj:.6f}, "
              f"grad max err {err:.2e}  OK")

    x = rng.normal(size=(8, 576)).astype(np.float32)
    a = np.asarray(jax.jit(selective_sigmoid_jnp)(x))
    b = np.asarray(jax.jit(selective_sigmoid_pallas)(x))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
    print("pallas selective sigmoid: OK")
    print("TPU pallas smoke: ALL OK")


if __name__ == "__main__":
    main()
