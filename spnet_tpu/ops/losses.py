"""The SPNet multi-task detection loss.

Semantics (matching the reference's graph/numpy twin pair `custom_loss` /
`my_loss`, `/root/reference/spnet/models.py:555-633`), computed on
NORMALIZED target/prediction vectors of shape (B, M), M = S * 8:

  pobj      = 1 - y_true[noobj slots]          (existence gate, 0/1)
  center    = w.center * pobj * (d_cx^2 + d_cy^2)
  size      = w.size   * pobj * (d_a^2 + d_b^2)
  angle     = w.angle  * pobj * (d_cos2t^2 + d_sin2t^2) * (a_t - b_t)^2
              -- the (a-b)^2 factor stops near-circles from punishing angle
  rings     = w.rings  * pobj * d_rings^2
  noobj     = w.noobj  * d_noobj^2                       (loss_type 'same')
            = w.noobj  * BCE-with-logits(z=y_pred, t=noobj_true)  (hybrid)
  loss      = mean_B( sum_slots(all terms) / M )

The reference's stride-end inconsistency (`:-1:` vs `::`,
`models.py:580-583` vs `612-615`) is numerically irrelevant and not
replicated — plain full strides everywhere.

Two implementations:
  * `loss_components` / `spnet_loss` — pure jnp (XLA fuses this fully;
    default in the train step, and the oracle for tests).
  * `spnet_loss_pallas` — fused Pallas TPU kernel with a hand-written
    backward (custom_vjp).  Layout: (B, M) is viewed as (B*S, 8) and
    transposed to (8, B*S) so each variable becomes a sublane row and the
    batch*slot axis lies along lanes; the kernel tiles the lane axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spnet_tpu.config import (
    IND_A,
    IND_ANGLE1,
    IND_ANGLE2,
    IND_B,
    IND_CX,
    IND_CY,
    IND_NOOBJ,
    IND_RINGS,
    VARS_PER_PRED,
    LossWeights,
)

# ---------------------------------------------------------------------------
# jnp reference implementation
# ---------------------------------------------------------------------------


def loss_components(
    y_true,
    y_pred,
    weights: LossWeights = LossWeights(),
    loss_type: str = "same",
):
    """Per-component scalar losses (diagnostic twin of the fused loss,
    mirroring the reference's `my_loss`).  Returns a dict with keys
    'center', 'size', 'angle', 'noobj', 'rings', 'total'."""
    b, m = y_pred.shape
    t = y_true.reshape(b, -1, VARS_PER_PRED)
    p = y_pred.reshape(b, -1, VARS_PER_PRED)
    sq = jnp.square(t - p)
    pobj = 1.0 - t[..., IND_NOOBJ]

    center = weights.center * jnp.sum(
        pobj * (sq[..., IND_CX] + sq[..., IND_CY]), axis=-1
    )
    size = weights.size * jnp.sum(
        pobj * (sq[..., IND_A] + sq[..., IND_B]), axis=-1
    )
    abdiff2 = jnp.square(t[..., IND_A] - t[..., IND_B])
    angle = weights.angle * jnp.sum(
        pobj * (sq[..., IND_ANGLE1] + sq[..., IND_ANGLE2]) * abdiff2, axis=-1
    )
    rings = weights.rings * jnp.sum(pobj * sq[..., IND_RINGS], axis=-1)

    if loss_type == "same":
        noobj = weights.noobj * jnp.sum(sq[..., IND_NOOBJ], axis=-1)
    else:
        # numerically stable BCE-with-logits on the raw noobj outputs
        z = p[..., IND_NOOBJ]
        tt = t[..., IND_NOOBJ]
        noobj = weights.noobj * jnp.sum(
            jnp.maximum(z, 0.0) - z * tt + jnp.log1p(jnp.exp(-jnp.abs(z))),
            axis=-1,
        )

    comps = {
        "center": jnp.mean(center) / m,
        "size": jnp.mean(size) / m,
        "angle": jnp.mean(angle) / m,
        "noobj": jnp.mean(noobj) / m,
        "rings": jnp.mean(rings) / m,
    }
    comps["total"] = (
        comps["center"]
        + comps["size"]
        + comps["angle"]
        + comps["noobj"]
        + comps["rings"]
    )
    return comps


def spnet_loss(
    y_true,
    y_pred,
    weights: LossWeights = LossWeights(),
    loss_type: str = "same",
):
    """Scalar total loss (twin of the reference's `custom_loss`)."""
    return loss_components(y_true, y_pred, weights, loss_type)["total"]


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------

_LANE_TILE = 2048  # lanes per grid step (16 * 128)


def _to_rows(y):
    """(B, M) -> (8, B*S): variable index becomes the sublane axis."""
    b, m = y.shape
    return y.reshape(b * (m // VARS_PER_PRED), VARS_PER_PRED).T


def _fwd_kernel(yt_ref, yp_ref, out_ref, *, w, loss_type, n_valid, inv_norm):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_ref[0, 0] = 0.0

    yt = yt_ref[:]
    yp = yp_ref[:]
    tile = yt.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1) + step * tile
    valid = (lane < n_valid).astype(yt.dtype)  # (1, tile)

    d = yt - yp
    sq = d * d
    pobj = (1.0 - yt[IND_NOOBJ, :])[None, :]

    geom = (
        w.center * (sq[IND_CX, :] + sq[IND_CY, :])
        + w.size * (sq[IND_A, :] + sq[IND_B, :])
        + w.rings * sq[IND_RINGS, :]
    )[None, :]
    abdiff = yt[IND_A, :] - yt[IND_B, :]
    geom += (
        w.angle
        * (sq[IND_ANGLE1, :] + sq[IND_ANGLE2, :])
        * (abdiff * abdiff)
    )[None, :]
    loss_tile = pobj * geom
    if loss_type == "same":
        loss_tile += w.noobj * sq[IND_NOOBJ, :][None, :]
    else:
        z = yp[IND_NOOBJ, :][None, :]
        tt = yt[IND_NOOBJ, :][None, :]
        loss_tile += w.noobj * (
            jnp.maximum(z, 0.0) - z * tt + jnp.log1p(jnp.exp(-jnp.abs(z)))
        )

    out_ref[0, 0] += jnp.sum(loss_tile * valid) * inv_norm


def _bwd_kernel(yt_ref, yp_ref, g_ref, dyp_ref, *, w, loss_type, inv_norm):
    """d(total)/d(y_pred) in the (8, N) layout; padding lanes produce
    garbage that the caller slices away."""
    yt = yt_ref[:]
    yp = yp_ref[:]
    g = g_ref[0, 0] * inv_norm

    d2 = 2.0 * (yp - yt)  # d(sqerr)/dyp
    pobj = (1.0 - yt[IND_NOOBJ, :])[None, :]
    row = jax.lax.broadcasted_iota(jnp.int32, yt.shape, 0)

    coef = jnp.zeros_like(yt)
    coef = jnp.where(row == IND_CX, w.center, coef)
    coef = jnp.where(row == IND_CY, w.center, coef)
    coef = jnp.where(row == IND_A, w.size, coef)
    coef = jnp.where(row == IND_B, w.size, coef)
    abdiff = yt[IND_A, :] - yt[IND_B, :]
    ab2 = (abdiff * abdiff)[None, :]
    coef = jnp.where(row == IND_ANGLE1, w.angle * ab2, coef)
    coef = jnp.where(row == IND_ANGLE2, w.angle * ab2, coef)
    coef = jnp.where(row == IND_RINGS, w.rings, coef)

    grad = pobj * coef * d2
    if loss_type == "same":
        noobj_grad = w.noobj * d2[IND_NOOBJ, :][None, :]
    else:
        z = yp[IND_NOOBJ, :][None, :]
        tt = yt[IND_NOOBJ, :][None, :]
        noobj_grad = w.noobj * (jax.nn.sigmoid(z) - tt)
    grad = jnp.where(row == IND_NOOBJ, noobj_grad, grad)
    dyp_ref[:] = grad * g


def _pad_lanes(rows, tile):
    n = rows.shape[1]
    pad = (-n) % tile
    if pad:
        rows = jnp.pad(rows, ((0, 0), (0, pad)))
    return rows


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def spnet_loss_pallas(y_true, y_pred, weights=LossWeights(), loss_type="same"):
    out, _ = _pallas_fwd(y_true, y_pred, weights, loss_type)
    return out


def _pallas_fwd(y_true, y_pred, weights, loss_type):
    b, m = y_pred.shape
    n = b * (m // VARS_PER_PRED)
    yt = _pad_lanes(_to_rows(y_true.astype(jnp.float32)), _LANE_TILE)
    yp = _pad_lanes(_to_rows(y_pred.astype(jnp.float32)), _LANE_TILE)
    n_pad = yt.shape[1]
    grid = n_pad // _LANE_TILE
    interpret = jax.default_backend() != "tpu"
    kern = functools.partial(
        _fwd_kernel,
        w=weights,
        loss_type=loss_type,
        n_valid=n,
        inv_norm=1.0 / (m * b),
    )
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (VARS_PER_PRED, _LANE_TILE),
                lambda i: (0, i),
                memory_space=pl.ANY if interpret else pltpu.VMEM,
            ),
            pl.BlockSpec(
                (VARS_PER_PRED, _LANE_TILE),
                lambda i: (0, i),
                memory_space=pl.ANY if interpret else pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(yt, yp)
    return out[0, 0], (y_true, y_pred)


def _pallas_bwd(weights, loss_type, res, g):
    y_true, y_pred = res
    b, m = y_pred.shape
    yt = _pad_lanes(_to_rows(y_true.astype(jnp.float32)), _LANE_TILE)
    yp = _pad_lanes(_to_rows(y_pred.astype(jnp.float32)), _LANE_TILE)
    n_pad = yt.shape[1]
    grid = n_pad // _LANE_TILE
    interpret = jax.default_backend() != "tpu"
    kern = functools.partial(
        _bwd_kernel, w=weights, loss_type=loss_type, inv_norm=1.0 / (m * b)
    )
    g_arr = jnp.asarray(g, jnp.float32).reshape(1, 1)
    dyp_rows = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (VARS_PER_PRED, _LANE_TILE),
                lambda i: (0, i),
                memory_space=pl.ANY if interpret else pltpu.VMEM,
            ),
            pl.BlockSpec(
                (VARS_PER_PRED, _LANE_TILE),
                lambda i: (0, i),
                memory_space=pl.ANY if interpret else pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (VARS_PER_PRED, _LANE_TILE),
            lambda i: (0, i),
            memory_space=pl.ANY if interpret else pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((VARS_PER_PRED, n_pad), jnp.float32),
        interpret=interpret,
    )(yt, yp, g_arr)
    n = b * (m // VARS_PER_PRED)
    dyp = dyp_rows[:, :n].T.reshape(b, m).astype(y_pred.dtype)
    return jnp.zeros_like(y_true), dyp


def _pallas_fwd_vjp(y_true, y_pred, weights, loss_type):
    out, res = _pallas_fwd(y_true, y_pred, weights, loss_type)
    return out, res


spnet_loss_pallas.defvjp(_pallas_fwd_vjp, _pallas_bwd)
