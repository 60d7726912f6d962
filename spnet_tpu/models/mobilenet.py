"""MobileNet v1 backbone (Howard et al. 2017, arXiv:1704.04861) in Flax.

The reference's fast option (`/root/reference/spnet/models.py:349-355`,
Keras `MobileNet(include_top=False)`).  Standard alpha=1.0 layer recipe:
a 3x3/2 conv stem then 13 depthwise-separable blocks with ReLU6.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from spnet_tpu.models.layers import ConvBN, SeparableConvBN


def relu6(x):
    return jnp.minimum(nn.relu(x), 6.0)


# (features, stride) per separable block
_BLOCKS = [
    (64, 1),
    (128, 2),
    (128, 1),
    (256, 2),
    (256, 1),
    (512, 2),
    (512, 1),
    (512, 1),
    (512, 1),
    (512, 1),
    (512, 1),
    (1024, 2),
    (1024, 1),
]


class MobileNet(nn.Module):
    """Feature extractor: (B, H, W, C) -> (B, H/32, W/32, 1024).

    `width_mult` scales all channel counts (alpha in the paper); the
    tiny settings are handy for CPU-mesh tests.
    """

    width_mult: float = 1.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        def ch(f):
            return max(8, int(f * self.width_mult))

        x = ConvBN(
            ch(32), (3, 3), strides=(2, 2), act=relu6, name="conv1",
            dtype=self.dtype,
        )(x, train)
        for i, (f, s) in enumerate(_BLOCKS):
            x = SeparableConvBN(
                ch(f), strides=(s, s), act=relu6, bn_between=True,
                name=f"block{i + 1}", dtype=self.dtype,
            )(x, train)
        return x

    LAYER_ORDER = ["conv1"] + [f"block{i + 1}" for i in range(len(_BLOCKS))]
