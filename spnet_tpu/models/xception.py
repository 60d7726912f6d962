"""Xception backbone (Chollet 2017, arXiv:1610.02357) in Flax.

The reference uses Keras' `Xception(include_top=False)` — and, due to the
`weights=None` literal at `/root/reference/spnet/models.py:359`, trains it
FROM SCRATCH, so architectural parity (not pretrained-weight parity) is
what matters.  This is a fresh implementation of the published
architecture: entry flow (2 convs + 3 downsampling separable blocks),
middle flow (8 residual separable blocks at 728 channels), exit flow
(downsampling block + 1536/2048 separable convs).

TPU notes: all convs are NHWC bfloat16 with fp32 params; the 728-channel
middle flow dominates FLOPs and lands on the MXU as batched 1x1 matmuls
plus VPU depthwise passes.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from spnet_tpu.models.layers import ConvBN, SeparableConvBN


class _DownBlock(nn.Module):
    """[relu ->] sepconv -> sepconv -> maxpool, with a strided 1x1
    projection shortcut."""

    features: int
    first_relu: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = ConvBN(
            self.features, (1, 1), strides=(2, 2), name="shortcut",
            dtype=self.dtype,
        )(x, train)
        if self.first_relu:
            x = nn.relu(x)
        x = SeparableConvBN(self.features, name="sep1", dtype=self.dtype)(
            x, train
        )
        x = nn.relu(x)
        x = SeparableConvBN(self.features, name="sep2", dtype=self.dtype)(
            x, train
        )
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        return x + res


class _MiddleBlock(nn.Module):
    """3x (relu -> sepconv 728) with identity residual."""

    features: int = 728
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        for i in range(3):
            x = nn.relu(x)
            x = SeparableConvBN(
                self.features, name=f"sep{i + 1}", dtype=self.dtype
            )(x, train)
        return x + res


class Xception(nn.Module):
    """Feature extractor: input (B, H, W, C) -> (B, H/32-ish, W/32-ish, 2048)."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        # entry flow stem: two VALID 3x3 convs (the published/Keras shapes)
        x = ConvBN(
            32, (3, 3), strides=(2, 2), padding="VALID", act=nn.relu,
            name="conv1", dtype=self.dtype,
        )(x, train)
        x = ConvBN(
            64, (3, 3), padding="VALID", act=nn.relu, name="conv2",
            dtype=self.dtype,
        )(x, train)
        x = _DownBlock(128, first_relu=False, name="block2",
                       dtype=self.dtype)(x, train)
        x = _DownBlock(256, name="block3", dtype=self.dtype)(x, train)
        x = _DownBlock(728, name="block4", dtype=self.dtype)(x, train)
        for i in range(8):
            x = _MiddleBlock(name=f"middle{i + 1}",
                             dtype=self.dtype)(x, train)
        # exit flow
        res = ConvBN(
            1024, (1, 1), strides=(2, 2), name="exit_shortcut",
            dtype=self.dtype,
        )(x, train)
        x = nn.relu(x)
        x = SeparableConvBN(728, name="exit_sep1", dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = SeparableConvBN(1024, name="exit_sep2", dtype=self.dtype)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = x + res
        x = SeparableConvBN(1536, act=nn.relu, name="exit_sep3",
                            dtype=self.dtype)(x, train)
        x = SeparableConvBN(2048, act=nn.relu, name="exit_sep4",
                            dtype=self.dtype)(x, train)
        return x

    # Ordered top-level module names, used for freeze_fac masking
    # (analogue of freezing the first fraction of Keras layers,
    # reference `models.py:361-373`).
    LAYER_ORDER = (
        ["conv1", "conv2", "block2", "block3", "block4"]
        + [f"middle{i + 1}" for i in range(8)]
        + ["exit_shortcut", "exit_sep1", "exit_sep2", "exit_sep3", "exit_sep4"]
    )
