"""Fused separable-convolution inference kernel (Pallas TPU).

The one fusion XLA structurally cannot do for Xception/MobileNet-class
models: a separable conv is TWO conv HLOs (depthwise 3x3, pointwise
1x1), and XLA never producer-fuses across a convolution — the depthwise
output always round-trips HBM.  This kernel keeps it in VMEM:

    HBM -> VMEM:  x tile (nb, H, W, C), weights (once per grid step)
    VMEM:         depthwise 3x3 (9 shifted MADs, f32 acc, VPU)
                  -> pointwise (nb*H*W, C) @ (C, F) (MXU, f32 acc)
                  -> folded BatchNorm scale/bias -> ReLU
    VMEM -> HBM:  y tile (nb, H, W, F)

vs the XLA chain's  2x HBM write + 2x HBM read  of the (nb, H, W, C)
intermediate.  Inference-mode only (BN folded into scale/bias); the
jnp twin `sepconv_infer_jnp` is the correctness oracle, mirroring
`models/layers.py::SeparableConvBN` eval semantics (Xception variant,
bn_between=False).

Measured on TPU v5e by `scripts/bench_sepconv.py` (see VALIDATION.md).

Reference counterpart: the Keras SeparableConv2D layers inside the
backbones the reference selects (`/root/reference/spnet/models.py:
348-359`) — there the fusion question is cuDNN's, here it is ours.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn(gamma, beta, mean, var, eps: float = 1e-3):
    """Inference BatchNorm as y = z * scale + bias."""
    scale = gamma / jnp.sqrt(var + eps)
    return scale, beta - mean * scale


def sepconv_infer_jnp(x, dw, pw, scale, bias, relu: bool = True):
    """jnp twin: depthwise 3x3 SAME -> pointwise 1x1 -> BN -> ReLU.

    x: (B, H, W, C) bf16;  dw: (3, 3, C);  pw: (C, F);
    scale/bias: (F,) f32."""
    c = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, dw[:, :, None, :].astype(x.dtype),  # (3, 3, 1, C), like flax
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    z = jax.lax.conv_general_dilated(
        y, pw[None, None].astype(x.dtype),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    z = z * scale + bias
    if relu:
        z = jnp.maximum(z, 0.0)
    return z.astype(x.dtype)


def _round_up(a: int, m: int) -> int:
    return -(-a // m) * m


def _sublane_tile(dtype) -> int:
    """Minimum second-minor (sublane) tile for a dtype on TPU."""
    return {2: 16, 4: 8}.get(jnp.dtype(dtype).itemsize, 32)


def _kernel(x_ref, dw_ref, pw_ref, sc_ref, bi_ref, o_ref, *, relu):
    """One grid step = one image (rank-3 block, (H, W, C)).

    The round-3 formulations (explicit (nb,h,w,c)->(nb*h*w,c) collapse;
    4Dx2D jnp.dot) were rejected by Mosaic with 'infer-vector-layout:
    unsupported shape cast' because the collapse merged an UNALIGNED w
    into the sublane axis.  This version first pads w up to the dtype's
    sublane tile, making the (h, wp, c) -> (h*wp, c) collapse a
    tile-preserving relabeling, and contracts with a plain rank-2 MXU
    matmul."""
    x = x_ref[...]  # (H, W, C)
    h, w, c = x.shape
    f = o_ref.shape[-1]
    # halo kept in the input dtype (VMEM budget); each tap lifted to f32
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    dw = dw_ref[...].astype(jnp.float32)  # (3, 3, C)
    acc = jnp.zeros((h, w, c), jnp.float32)
    for u in range(3):
        for v in range(3):
            acc = acc + (
                xp[u : u + h, v : v + w, :].astype(jnp.float32)
                * dw[u, v]
            )
    acc = acc.astype(x.dtype)
    wp = _round_up(w, _sublane_tile(x.dtype))
    if wp != w:
        acc = jnp.pad(acc, ((0, 0), (0, wp - w), (0, 0)))
    z = jnp.dot(acc.reshape(h * wp, c), pw_ref[...].astype(x.dtype),
                preferred_element_type=jnp.float32)
    z = z * sc_ref[...] + bi_ref[...]
    if relu:
        z = jnp.maximum(z, 0.0)
    z = z.reshape(h, wp, f)
    o_ref[...] = z[:, :w, :].astype(o_ref.dtype)


def sepconv_vmem_bytes(h: int, w: int, c: int, f: int,
                       itemsize: int = 2) -> int:
    """Rough live-VMEM estimate for one grid step of the fused kernel:
    input tile + f32 depthwise accumulator + f32 matmul result + output
    tile + weights."""
    wp = _round_up(w, 16)
    return (
        (h + 2) * (w + 2) * c * itemsize  # padded input halo
        + h * wp * c * 4                  # f32 accumulator
        + h * wp * f * 4                  # f32 matmul output
        + h * w * f * itemsize            # output tile
        + c * f * itemsize + 9 * c * 4 + 2 * f * 4
    )


#: Conservative per-step VMEM budget (v5e VMEM is ~16 MB/core; leave
#: headroom for Mosaic temporaries and double-buffered grid DMA).
VMEM_BUDGET = 10 * 1024 * 1024


def sepconv_fits_vmem(h: int, w: int, c: int, f: int,
                      itemsize: int = 2) -> bool:
    return sepconv_vmem_bytes(h, w, c, f, itemsize) <= VMEM_BUDGET


@functools.partial(jax.jit, static_argnames=("relu",))
def sepconv_infer_pallas(x, dw, pw, scale, bias, relu: bool = True):
    """Fused VMEM-resident separable conv; twin of `sepconv_infer_jnp`.

    Grid is one image per step (the (B,) batch axis); shapes whose
    working set exceeds the VMEM budget (the 165x165 entry-flow level of
    Xception-331) should use the XLA chain instead — see
    `sepconv_fits_vmem`."""
    b, h, w, c = x.shape
    f = pw.shape[-1]
    interpret = jax.default_backend() != "tpu"
    vmem = pl.ANY if interpret else pltpu.VMEM
    return pl.pallas_call(
        functools.partial(_kernel, relu=relu),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((3, 3, c), lambda i: (0, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((c, f), lambda i: (0, 0), memory_space=vmem),
            pl.BlockSpec((f,), lambda i: (0,), memory_space=vmem),
            pl.BlockSpec((f,), lambda i: (0,), memory_space=vmem),
        ],
        out_specs=pl.BlockSpec((None, h, w, f), lambda i: (i, 0, 0, 0),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((b, h, w, f), x.dtype),
        interpret=interpret,
    )(x, dw.astype(jnp.float32), pw, scale.astype(jnp.float32),
      bias.astype(jnp.float32))
