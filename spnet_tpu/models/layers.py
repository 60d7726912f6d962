"""Shared building blocks for the backbone zoo.

Flax/linen, NHWC, bfloat16 compute with float32 params by default —
the MXU-native configuration.  BatchNorm uses Keras-compatible defaults
(momentum 0.99, eps 1e-3) since the reference backbones are Keras
applications models (`/root/reference/spnet/models.py:348-359`).
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

#: Keras-compatible kernel init.  Every conv/dense layer the reference
#: builds uses Keras's default `glorot_uniform` (keras 2.1.3
#: Conv2D/Dense/DepthwiseConv2D initializers); flax's default is
#: lecun_normal, a genuinely different starting distribution.
KERAS_INIT = nn.initializers.glorot_uniform()


class ConvBN(nn.Module):
    """Conv -> BatchNorm (-> activation)."""

    features: int
    kernel: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: str = "SAME"
    act: Callable | None = None
    use_bias: bool = False
    #: Inception-ResNet-v2 uses gamma-less BatchNorm (Keras scale=False).
    bn_scale: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=self.padding,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=KERAS_INIT,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.99,
            epsilon=1e-3,
            use_scale=self.bn_scale,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.act is not None:
            x = self.act(x)
        return x


class SeparableConvBN(nn.Module):
    """Depthwise 3x3 + pointwise 1x1 (-> BatchNorm -> activation).

    The workhorse of Xception/MobileNet.  On TPU the pointwise conv is a
    plain MXU matmul; the depthwise conv maps to the VPU — keeping
    channels multiples of 128 where possible helps tiling.
    """

    features: int
    kernel: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    act: Callable | None = None
    #: MobileNet-style BN+act between depthwise and pointwise (Xception
    #: has none).
    bn_between: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        x = nn.Conv(
            in_ch,
            self.kernel,
            strides=self.strides,
            padding="SAME",
            feature_group_count=in_ch,
            use_bias=False,
            dtype=self.dtype,
            kernel_init=KERAS_INIT,
            name="depthwise",
        )(x)
        if self.bn_between:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99,
                epsilon=1e-3,
                dtype=self.dtype,
                name="bn_dw",
            )(x)
            if self.act is not None:
                x = self.act(x)
        x = nn.Conv(
            self.features,
            (1, 1),
            use_bias=False,
            dtype=self.dtype,
            kernel_init=KERAS_INIT,
            name="pointwise",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.99,
            epsilon=1e-3,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.act is not None:
            x = self.act(x)
        return x


def leaky_relu_01(x):
    return nn.leaky_relu(x, negative_slope=0.1)


def mish(x):
    """Mish activation, x * tanh(softplus(x)) — the reference keeps it as
    an optional experiment (`/root/reference/spnet/models.py:74-98`)."""
    return x * jnp.tanh(nn.softplus(x))
