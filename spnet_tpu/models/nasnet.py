"""NASNet-A (Mobile) backbone (Zoph et al. 2017, arXiv:1707.07012) in
Flax.

The reference's `create_model_simple` path uses Keras NASNetMobile
(`/root/reference/spnet/models.py:428-458`).  NASNet-A macro-architecture:
a strided stem conv, two reduction cells at rising widths, then three
stacks of `num_blocks` Normal cells separated by Reduction cells.  Mobile
configuration: penultimate_filters 1056 -> cell filters 44, num_blocks 4,
stem 32.

Cell wiring follows the published Fig. 4 (five add-blocks of separable
convs / pools over the current input h and the previous cell's input p,
with a 1x1 'adjust' projection or factorized reduction to align p).
Numerically exact twin of keras.applications.NASNetMobile (pinned by
`tests/test_models.py::test_keras_nasnet_import_parity` via imported
weights): strided sepconv SAME padding equals Keras' correct_pad for
odd kernels; reduction-cell pools replicate Keras' explicit zero-pad +
VALID pooling (zeros are real cells — `_pad_for_pool`); stride-1
average pools exclude padding from the divisor like Keras 'same'
AveragePooling2D.  BatchNorm: momentum 0.9997, eps 1e-3, like Keras.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from spnet_tpu.models.layers import KERAS_INIT

BN_MOM = 0.9997


def _bn(x, train, name):
    return nn.BatchNorm(
        use_running_average=not train, momentum=BN_MOM, epsilon=1e-3,
        dtype=x.dtype, name=name,
    )(x)


def _conv(x, f, k, s, name):
    return nn.Conv(f, (k, k), strides=(s, s), padding="SAME",
                   use_bias=False, dtype=x.dtype, name=name, kernel_init=KERAS_INIT)(x)


class SepBlock(nn.Module):
    """relu -> sepconv(k, s) -> BN -> relu -> sepconv(k, 1) -> BN
    (Keras `_separable_conv_block`)."""

    filters: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        def sep(x, s, name):
            in_ch = x.shape[-1]
            x = nn.Conv(in_ch, (self.kernel, self.kernel), strides=(s, s),
                        padding="SAME", feature_group_count=in_ch,
                        use_bias=False, dtype=x.dtype,
                        name=name + "_dw", kernel_init=KERAS_INIT)(x)
            return nn.Conv(self.filters, (1, 1), use_bias=False,
                           dtype=x.dtype, name=name + "_pw", kernel_init=KERAS_INIT)(x)

        x = nn.relu(x)
        x = sep(x, self.stride, "sep1")
        x = _bn(x, train, "bn1")
        x = nn.relu(x)
        x = sep(x, 1, "sep2")
        x = _bn(x, train, "bn2")
        return x


class Adjust(nn.Module):
    """Align the previous-cell tensor p to (spatial, filters) of the
    current cell (Keras `_adjust_block`)."""

    filters: int

    @nn.compact
    def __call__(self, p, ip, train=False):
        if p is None:
            return ip
        if p.shape[1] != ip.shape[1]:  # factorized reduction
            p = nn.relu(p)
            p1 = p[:, ::2, ::2, :]
            p1 = _conv(p1, self.filters // 2, 1, 1, "conv1")
            pp = jnp.pad(p, ((0, 0), (0, 1), (0, 1), (0, 0)))
            p2 = pp[:, 1::2, 1::2, :]
            p2 = _conv(p2, self.filters // 2, 1, 1, "conv2")
            p = jnp.concatenate([p1, p2], axis=-1)
            return _bn(p, train, "bn")
        if p.shape[-1] != self.filters:  # projection
            p = nn.relu(p)
            p = _conv(p, self.filters, 1, 1, "proj")
            return _bn(p, train, "bn")
        return p


def _avg3(x, s=1):
    # count_include_pad=False: Keras AveragePooling2D divides edge
    # windows by the number of REAL cells, not the window size
    return nn.avg_pool(x, (3, 3), strides=(s, s), padding="SAME",
                       count_include_pad=False)


def _max3(x, s=1):
    return nn.max_pool(x, (3, 3), strides=(s, s), padding="SAME")


def _pad_for_pool(x):
    """Keras reduction cells ZERO-PAD h (ZeroPadding2D(correct_pad)) and
    pool VALID — the pad cells are REAL zeros: included in average
    counts and compared by max (not -inf as SAME padding would be)."""
    pads = []
    for d in (1, 2):
        before = 1 if x.shape[d] % 2 else 0  # correct_pad, kernel 3
        pads.append((before, 1))
    return jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)))


def _avg3_padded(x):
    return nn.avg_pool(_pad_for_pool(x), (3, 3), strides=(2, 2),
                       padding="VALID")


def _max3_padded(x):
    return nn.max_pool(_pad_for_pool(x), (3, 3), strides=(2, 2),
                       padding="VALID")


class NormalCell(nn.Module):
    filters: int

    @nn.compact
    def __call__(self, ip, p, train=False):
        p = Adjust(self.filters, name="adjust")(p, ip, train)
        h = nn.relu(ip)
        h = _conv(h, self.filters, 1, 1, "conv1")
        h = _bn(h, train, "bn1")

        x1 = (SepBlock(self.filters, 5, name="left1")(h, train)
              + SepBlock(self.filters, 3, name="right1")(p, train))
        x2 = (SepBlock(self.filters, 5, name="left2")(p, train)
              + SepBlock(self.filters, 3, name="right2")(p, train))
        x3 = _avg3(h) + p
        x4 = _avg3(p) + _avg3(p)
        x5 = SepBlock(self.filters, 3, name="left5")(h, train) + h
        return jnp.concatenate([p, x1, x2, x3, x4, x5], axis=-1), ip


class ReductionCell(nn.Module):
    filters: int

    @nn.compact
    def __call__(self, ip, p, train=False):
        p = Adjust(self.filters, name="adjust")(p, ip, train)
        h = nn.relu(ip)
        h = _conv(h, self.filters, 1, 1, "conv1")
        h = _bn(h, train, "bn1")

        x1 = (SepBlock(self.filters, 5, 2, name="left1")(h, train)
              + SepBlock(self.filters, 7, 2, name="right1")(p, train))
        x2 = (_max3_padded(h)
              + SepBlock(self.filters, 7, 2, name="right2")(p, train))
        x3 = (_avg3_padded(h)
              + SepBlock(self.filters, 5, 2, name="right3")(p, train))
        x4 = x2 + _avg3(x1)
        x5 = (SepBlock(self.filters, 3, name="left5")(x1, train)
              + _max3_padded(h))
        return jnp.concatenate([x2, x3, x4, x5], axis=-1), ip


class NASNetMobile(nn.Module):
    """Feature extractor: (B, H, W, C) -> (B, h, w, 1056)."""

    penultimate_filters: int = 1056
    num_blocks: int = 4
    stem_filters: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        f = self.penultimate_filters // 24
        x = x.astype(self.dtype)
        x = nn.Conv(self.stem_filters, (3, 3), strides=(2, 2),
                    padding="VALID", use_bias=False, dtype=x.dtype,
                    name="stem_conv", kernel_init=KERAS_INIT)(x)
        x = _bn(x, train, "stem_bn")

        p = None
        x, p = ReductionCell(f // 4, name="stem_red1")(x, p, train)
        x, p = ReductionCell(f // 2, name="stem_red2")(x, p, train)
        for i in range(self.num_blocks):
            x, p = NormalCell(f, name=f"normal1_{i}")(x, p, train)
        x, p0 = ReductionCell(f * 2, name="red1")(x, p, train)
        p = p0
        for i in range(self.num_blocks):
            x, p = NormalCell(f * 2, name=f"normal2_{i}")(x, p, train)
        x, p0 = ReductionCell(f * 4, name="red2")(x, p, train)
        p = p0
        for i in range(self.num_blocks):
            x, p = NormalCell(f * 4, name=f"normal3_{i}")(x, p, train)
        return nn.relu(x)

    LAYER_ORDER = (
        ["stem_conv", "stem_red1", "stem_red2"]
        + [f"normal1_{i}" for i in range(4)]
        + ["red1"]
        + [f"normal2_{i}" for i in range(4)]
        + ["red2"]
        + [f"normal3_{i}" for i in range(4)]
    )
