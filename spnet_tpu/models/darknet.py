"""Darknet-19-style backbone ("full YOLO" configuration).

Capability twin of the reference's from-scratch YOLO experiments
(`/root/reference/spnet/models.py:106-220`, after YOLO9000 Table 6 —
unused in the paper runs but part of the model zoo surface).  Standard
conv/BN/LeakyReLU(0.1) ladder with 1x1 bottlenecks and a space-to-depth
passthrough of the penultimate stage, as published (Redmon & Farhadi
2016, arXiv:1612.08242).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from spnet_tpu.models.layers import ConvBN, leaky_relu_01


def _space_to_depth_2(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


class DarkNet19(nn.Module):
    """Feature extractor: (B, H, W, C) -> (B, H/32, W/32, 1024 + 256)."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        def cbl(x, f, k, name):
            return ConvBN(f, (k, k), act=leaky_relu_01, name=name,
                          dtype=self.dtype)(x, train)

        x = cbl(x, 32, 3, "conv1")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = cbl(x, 64, 3, "conv2")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = cbl(x, 128, 3, "conv3")
        x = cbl(x, 64, 1, "conv4")
        x = cbl(x, 128, 3, "conv5")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = cbl(x, 256, 3, "conv6")
        x = cbl(x, 128, 1, "conv7")
        x = cbl(x, 256, 3, "conv8")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = cbl(x, 512, 3, "conv9")
        x = cbl(x, 256, 1, "conv10")
        x = cbl(x, 512, 3, "conv11")
        x = cbl(x, 256, 1, "conv12")
        x = cbl(x, 512, 3, "conv13")
        skip = x
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = cbl(x, 1024, 3, "conv14")
        x = cbl(x, 512, 1, "conv15")
        x = cbl(x, 1024, 3, "conv16")
        x = cbl(x, 512, 1, "conv17")
        x = cbl(x, 1024, 3, "conv18")
        x = cbl(x, 1024, 3, "conv19")
        x = cbl(x, 1024, 3, "conv20")
        skip = cbl(skip, 64, 1, "conv21")
        skip = _space_to_depth_2(skip)
        return jnp.concatenate([skip, x], axis=-1)

    LAYER_ORDER = [f"conv{i}" for i in range(1, 22)]
