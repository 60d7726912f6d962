"""Selective (strided) sigmoid activation.

Applies sigmoid only to the `noobj` slot of every predictor (one lane in
eight), leaving all other outputs linear — the behavior of the reference's
`SelectiveSigmoid` Keras layer (`/root/reference/spnet/models.py:277-298`),
which implements it with a transpose + boolean-mask `tf.where`.

TPU-native design: the (B, S*8) activation is viewed as (B*S, 8) and
transposed to (8, B*S) so that the strided slot becomes a *row* of the
tile (sublane index), which the VPU handles natively; the Pallas kernel
then applies sigmoid to that single row.  A pure-jnp twin (`_jnp` suffix)
is the oracle used by tests; XLA fuses it fully, so the jnp path is also
what the model uses by default — the Pallas kernel exists for fusion into
larger hand-written pipelines and as the documented custom-op example.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spnet_tpu.config import IND_NOOBJ, VARS_PER_PRED


def selective_sigmoid_jnp(x, start: int = IND_NOOBJ, skip: int = VARS_PER_PRED):
    """Reference-semantics strided sigmoid: sigmoid(x[..., start::skip]),
    identity elsewhere.  x: (..., M) with M % skip == 0."""
    m = x.shape[-1]
    lane = jnp.arange(m) % skip
    mask = lane == start
    return jnp.where(mask, jax.nn.sigmoid(x), x)


def _sel_sigmoid_kernel(x_ref, o_ref):
    """x_ref, o_ref: (VARS_PER_PRED, N) — sigmoid applied to the
    IND_NOOBJ-th row only."""
    x = x_ref[:]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    o_ref[:] = jnp.where(row == IND_NOOBJ, jax.nn.sigmoid(x), x)


def selective_sigmoid_pallas(x):
    """Pallas TPU version.  x: (B, M) with M % VARS_PER_PRED == 0."""
    b, m = x.shape
    n = b * (m // VARS_PER_PRED)
    xt = x.reshape(n, VARS_PER_PRED).T  # (8, N)
    interpret = jax.default_backend() != "tpu"
    yt = pl.pallas_call(
        _sel_sigmoid_kernel,
        out_shape=jax.ShapeDtypeStruct(xt.shape, xt.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
        interpret=interpret,
    )(xt)
    return yt.T.reshape(b, m)


# Default export: the jnp version (XLA fuses it into the surrounding graph).
selective_sigmoid = selective_sigmoid_jnp
