"""SPNet model assembly: colorizer stem -> backbone -> grid head.

Capability twin of the reference's `create_model_functional`
(`/root/reference/spnet/models.py:302-424`):

  grayscale (B, S, S, 1)
    -> Conv(3ch, 3x3) 'colorizer'                      (models.py:321)
    -> AvgPool 2x2                                     (:323)
    -> [BN -> LeakyReLU(0.1) -> Conv(3ch)] x2 -> BN    (:326-336)
    -> + AvgPool(input)  (residual, broadcast 1->3 ch) (:337)
    -> Dropout(0.1)                                    (:340)
    -> backbone (Xception / MobileNet / ...)           (:348-359)
    -> Flatten -> Dense(num_outputs) 'FinalOutput'     (:378-388)
    [-> SelectiveSigmoid when model_type == 'ss']      (:390-394, 'ss')

The reference's L2(1e-4) kernel regularization (`models.py:401`) is applied
in the train step as an explicit weight-decay-style penalty over kernel
params (see train/steps.py) rather than by graph surgery.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from spnet_tpu.config import ModelConfig
from spnet_tpu.models.layers import leaky_relu_01
from spnet_tpu.models.mobilenet import MobileNet
from spnet_tpu.models.xception import Xception
from spnet_tpu.ops.activations import selective_sigmoid_jnp


def _backbone_ctor(name: str, width_mult: float = 1.0,
                   dtype: Any = jnp.bfloat16):
    """Returns (constructor kwargs -> module factory, layer order).

    The factory must only be invoked inside a parent module's compact
    scope (flax naming rules).  `dtype` is the compute dtype and MUST be
    threaded through (the backbones default to bfloat16 on their own;
    a float32 config has to override that)."""
    if name == "Xception":
        return (lambda mn: Xception(name=mn, dtype=dtype),
                Xception.LAYER_ORDER)
    if name == "MobileNet":
        return (lambda mn: MobileNet(width_mult=width_mult, name=mn,
                                     dtype=dtype),
                MobileNet.LAYER_ORDER)
    if name == "MobileNetTiny":  # CPU-testable config
        return (lambda mn: MobileNet(width_mult=0.125, name=mn,
                                     dtype=dtype),
                MobileNet.LAYER_ORDER)
    if name == "InceptionResNetV2":
        from spnet_tpu.models.inception_resnet_v2 import InceptionResNetV2

        return (lambda mn: InceptionResNetV2(name=mn, dtype=dtype),
                InceptionResNetV2.LAYER_ORDER)
    if name == "DarkNet19":
        from spnet_tpu.models.darknet import DarkNet19

        return (lambda mn: DarkNet19(name=mn, dtype=dtype),
                DarkNet19.LAYER_ORDER)
    if name == "NASNetMobile":
        from spnet_tpu.models.nasnet import NASNetMobile

        return (lambda mn: NASNetMobile(name=mn, dtype=dtype),
                NASNetMobile.LAYER_ORDER)
    raise ValueError(f"unknown backbone {name!r}")


class Stem(nn.Module):
    """The 'colorizer' front end (grayscale -> 3 pseudo-color channels at
    half resolution, with a pooled residual skip)."""

    filters: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        inputs = x
        x = nn.Conv(
            self.filters, (3, 3), padding="SAME", use_bias=False,
            dtype=self.dtype, name="colorizer",
        )(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype, name="bn1",
        )(x)
        x = leaky_relu_01(x)
        x = nn.Conv(
            self.filters, (3, 3), padding="SAME", use_bias=False,
            dtype=self.dtype, name="conv2",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype, name="bn2",
        )(x)
        x = leaky_relu_01(x)
        x = nn.Conv(
            self.filters, (3, 3), padding="SAME", use_bias=False,
            dtype=self.dtype, name="conv3",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype, name="bn3",
        )(x)
        # residual: 2x2-average-pooled input, broadcast 1ch -> filters
        skip = nn.avg_pool(inputs, (2, 2), strides=(2, 2))
        return x + skip  # (B, H/2, W/2, filters) + (B, H/2, W/2, 1)


class SPNet(nn.Module):
    """Full detector: stem + backbone + flat grid head.

    head styles:
      * default — single Dense(num_outputs) (reference `models.py:388`)
      * selective_sigmoid — + strided sigmoid on the noobj slots
        (reference model_type 'ss')
      * compound_head — separate sigmoid existence branch + linear branch
        interleaved back into the canonical layout (reference model_type
        'compound', `models.py:379-386`).  The reference interleaves with
        a permutation-matrix matmul (`InterleaveColumns`); on TPU this is
        a pure data-layout operation, so it is done with reshape/concat
        that XLA compiles to a copy — no FLOPs.
    """

    num_outputs: int = 576
    backbone: str = "Xception"
    dropout_rate: float = 0.1
    selective_sigmoid: bool = False
    compound_head: bool = False
    width_mult: float = 1.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        from spnet_tpu.config import IND_NOOBJ, VARS_PER_PRED

        x = x.astype(self.dtype)
        x = Stem(dtype=self.dtype, name="stem")(x, train)
        x = nn.Dropout(self.dropout_rate, deterministic=not train,
                       name="stem_dropout")(x)
        factory, _ = _backbone_ctor(self.backbone, self.width_mult,
                                    self.dtype)
        x = factory("backbone")(x, train)
        x = x.reshape((x.shape[0], -1))
        # fp32 head: the 576-way regression is precision-sensitive
        x = x.astype(jnp.float32)
        if self.compound_head:
            n_preds = self.num_outputs // VARS_PER_PRED
            sig = nn.Dense(n_preds, dtype=jnp.float32,
                           name="sigmoid_output")(x)
            sig = jax.nn.sigmoid(sig)
            dense = nn.Dense(self.num_outputs - n_preds,
                             dtype=jnp.float32, name="dense_output")(x)
            # interleave: place sig[k] at slot k's IND_NOOBJ lane
            d3 = dense.reshape(-1, n_preds, VARS_PER_PRED - 1)
            out = jnp.concatenate(
                [d3[..., :IND_NOOBJ], sig[..., None],
                 d3[..., IND_NOOBJ:]], axis=-1,
            )
            x = out.reshape(-1, self.num_outputs)
        else:
            x = nn.Dense(self.num_outputs, dtype=jnp.float32,
                         name="final_output")(x)
        if self.selective_sigmoid:
            x = selective_sigmoid_jnp(x)
        return x

    def backbone_layer_order(self):
        _, order = _backbone_ctor(self.backbone, self.width_mult)
        return order


def build_model(cfg: ModelConfig, num_outputs: int = 576,
                width_mult: float = 1.0) -> SPNet:
    return SPNet(
        num_outputs=num_outputs,
        backbone=cfg.backbone,
        dropout_rate=cfg.dropout_rate,
        selective_sigmoid=cfg.selective_sigmoid,
        width_mult=width_mult,
        dtype=jnp.dtype(cfg.compute_dtype),
    )
