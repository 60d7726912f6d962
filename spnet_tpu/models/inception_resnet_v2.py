"""Inception-ResNet-v2 backbone (Szegedy et al. 2016, arXiv:1602.07261)
in Flax.

The reference's "big" option (`/root/reference/spnet/config.py:51`:
"InceptionResNetV2 seems too big & slow" — kept for capability parity and
speed/accuracy sweeps).  Fresh implementation of the published
architecture: stem, 10x Inception-ResNet-A (block35), Reduction-A, 20x
Inception-ResNet-B (block17), Reduction-B, 10x Inception-ResNet-C
(block8), final 1536-channel 1x1 conv.  Residual branch outputs are
scaled (0.17 / 0.10 / 0.20) before addition, as published.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from spnet_tpu.models.layers import KERAS_INIT, ConvBN

def _cbr(x, train, features, kernel=(1, 1), strides=(1, 1),
         padding="SAME", act=True, name="", dtype=jnp.bfloat16):
    # bn_scale=False: Keras IRv2 uses gamma-less BatchNorm throughout
    return ConvBN(features, kernel, strides=strides, padding=padding,
                  act=nn.relu if act else None, bn_scale=False,
                  name=name, dtype=dtype)(x, train)


class Block35(nn.Module):
    """Inception-ResNet-A: 35x35 grid residual block."""

    scale: float = 0.17
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        b0 = _cbr(x, train, 32, name="b0", dtype=self.dtype)
        b1 = _cbr(x, train, 32, name="b1a", dtype=self.dtype)
        b1 = _cbr(b1, train, 32, (3, 3), dtype=self.dtype, name="b1b")
        b2 = _cbr(x, train, 32, name="b2a", dtype=self.dtype)
        b2 = _cbr(b2, train, 48, (3, 3), dtype=self.dtype, name="b2b")
        b2 = _cbr(b2, train, 64, (3, 3), dtype=self.dtype, name="b2c")
        mix = jnp.concatenate([b0, b1, b2], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=self.dtype,
                     name="up", kernel_init=KERAS_INIT)(mix)
        return nn.relu(x + self.scale * up)


class Block17(nn.Module):
    """Inception-ResNet-B: 17x17 grid residual block (1x7/7x1 factorized)."""

    scale: float = 0.10
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        b0 = _cbr(x, train, 192, name="b0", dtype=self.dtype)
        b1 = _cbr(x, train, 128, name="b1a", dtype=self.dtype)
        b1 = _cbr(b1, train, 160, (1, 7), dtype=self.dtype, name="b1b")
        b1 = _cbr(b1, train, 192, (7, 1), dtype=self.dtype, name="b1c")
        mix = jnp.concatenate([b0, b1], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=self.dtype,
                     name="up", kernel_init=KERAS_INIT)(mix)
        return nn.relu(x + self.scale * up)


class Block8(nn.Module):
    """Inception-ResNet-C: 8x8 grid residual block (1x3/3x1 factorized)."""

    scale: float = 0.20
    final_relu: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        b0 = _cbr(x, train, 192, name="b0", dtype=self.dtype)
        b1 = _cbr(x, train, 192, name="b1a", dtype=self.dtype)
        b1 = _cbr(b1, train, 224, (1, 3), dtype=self.dtype, name="b1b")
        b1 = _cbr(b1, train, 256, (3, 1), dtype=self.dtype, name="b1c")
        mix = jnp.concatenate([b0, b1], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=self.dtype,
                     name="up", kernel_init=KERAS_INIT)(mix)
        out = x + self.scale * up
        return nn.relu(out) if self.final_relu else out


class InceptionResNetV2(nn.Module):
    """Feature extractor: (B, H, W, C) -> (B, h, w, 1536)."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        x = x.astype(self.dtype)
        # stem
        x = _cbr(x, train, 32, (3, 3), (2, 2), "VALID", dtype=self.dtype, name="stem1")
        x = _cbr(x, train, 32, (3, 3), dtype=self.dtype, padding="VALID", name="stem2")
        x = _cbr(x, train, 64, (3, 3), dtype=self.dtype, name="stem3")
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = _cbr(x, train, 80, (1, 1), dtype=self.dtype, padding="VALID", name="stem4")
        x = _cbr(x, train, 192, (3, 3), dtype=self.dtype, padding="VALID", name="stem5")
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        # mixed_5b (Inception-A)
        b0 = _cbr(x, train, 96, name="m5b_b0", dtype=self.dtype)
        b1 = _cbr(x, train, 48, name="m5b_b1a", dtype=self.dtype)
        b1 = _cbr(b1, train, 64, (5, 5), dtype=self.dtype, name="m5b_b1b")
        b2 = _cbr(x, train, 64, name="m5b_b2a", dtype=self.dtype)
        b2 = _cbr(b2, train, 96, (3, 3), dtype=self.dtype, name="m5b_b2b")
        b2 = _cbr(b2, train, 96, (3, 3), dtype=self.dtype, name="m5b_b2c")
        # count_include_pad=False = Keras AveragePooling2D edge semantics
        b3 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME",
                         count_include_pad=False)
        b3 = _cbr(b3, train, 64, name="m5b_b3", dtype=self.dtype)
        x = jnp.concatenate([b0, b1, b2, b3], axis=-1)  # 320

        for i in range(10):
            x = Block35(dtype=self.dtype, name=f"block35_{i + 1}")(x, train)

        # reduction-A (mixed_6a)
        b0 = _cbr(x, train, 384, (3, 3), (2, 2), "VALID", dtype=self.dtype, name="m6a_b0")
        b1 = _cbr(x, train, 256, name="m6a_b1a", dtype=self.dtype)
        b1 = _cbr(b1, train, 256, (3, 3), dtype=self.dtype, name="m6a_b1b")
        b1 = _cbr(b1, train, 384, (3, 3), (2, 2), "VALID", dtype=self.dtype, name="m6a_b1c")
        b2 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = jnp.concatenate([b0, b1, b2], axis=-1)  # 1088

        for i in range(20):
            x = Block17(dtype=self.dtype, name=f"block17_{i + 1}")(x, train)

        # reduction-B (mixed_7a)
        b0 = _cbr(x, train, 256, name="m7a_b0a", dtype=self.dtype)
        b0 = _cbr(b0, train, 384, (3, 3), (2, 2), "VALID", dtype=self.dtype, name="m7a_b0b")
        b1 = _cbr(x, train, 256, name="m7a_b1a", dtype=self.dtype)
        b1 = _cbr(b1, train, 288, (3, 3), (2, 2), "VALID", dtype=self.dtype, name="m7a_b1b")
        b2 = _cbr(x, train, 256, name="m7a_b2a", dtype=self.dtype)
        b2 = _cbr(b2, train, 288, (3, 3), dtype=self.dtype, name="m7a_b2b")
        b2 = _cbr(b2, train, 320, (3, 3), (2, 2), "VALID", dtype=self.dtype, name="m7a_b2c")
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = jnp.concatenate([b0, b1, b2, b3], axis=-1)  # 2080

        for i in range(9):
            x = Block8(dtype=self.dtype, name=f"block8_{i + 1}")(x, train)
        x = Block8(scale=1.0, final_relu=False, dtype=self.dtype,
                   name="block8_10")(x, train)

        x = _cbr(x, train, 1536, name="conv_7b", dtype=self.dtype)
        return x

    LAYER_ORDER = (
        ["stem1", "stem2", "stem3", "stem4", "stem5"]
        + ["m5b_b0", "m5b_b1a", "m5b_b1b", "m5b_b2a", "m5b_b2b",
           "m5b_b2c", "m5b_b3"]
        + [f"block35_{i + 1}" for i in range(10)]
        + ["m6a_b0", "m6a_b1a", "m6a_b1b", "m6a_b1c"]
        + [f"block17_{i + 1}" for i in range(20)]
        + ["m7a_b0a", "m7a_b0b", "m7a_b1a", "m7a_b1b", "m7a_b2a",
           "m7a_b2b", "m7a_b2c"]
        + [f"block8_{i + 1}" for i in range(10)]
        + ["conv_7b"]
    )
