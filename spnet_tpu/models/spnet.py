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
from spnet_tpu.models.layers import KERAS_INIT, leaky_relu_01
from spnet_tpu.models.mobilenet import MobileNet
from spnet_tpu.models.xception import Xception
from spnet_tpu.ops.activations import selective_sigmoid_jnp


def _backbone_ctor(name: str, width_mult: float = 1.0,
                   dtype: Any = jnp.bfloat16):
    """Returns (module class, constructor kwargs, layer order).

    Instantiate only inside a parent module's compact scope (flax naming
    rules).  `dtype` is the compute dtype and MUST be threaded through
    (the backbones default to bfloat16 on their own; a float32 config
    has to override that)."""
    if name == "Xception":
        return Xception, dict(dtype=dtype), Xception.LAYER_ORDER
    if name == "MobileNet":
        return (MobileNet, dict(width_mult=width_mult, dtype=dtype),
                MobileNet.LAYER_ORDER)
    if name == "MobileNetTiny":  # CPU-testable config
        return (MobileNet, dict(width_mult=0.125, dtype=dtype),
                MobileNet.LAYER_ORDER)
    if name == "InceptionResNetV2":
        from spnet_tpu.models.inception_resnet_v2 import InceptionResNetV2

        return (InceptionResNetV2, dict(dtype=dtype),
                InceptionResNetV2.LAYER_ORDER)
    if name == "DarkNet19":
        from spnet_tpu.models.darknet import DarkNet19

        return DarkNet19, dict(dtype=dtype), DarkNet19.LAYER_ORDER
    if name == "NASNetMobile":
        from spnet_tpu.models.nasnet import NASNetMobile

        return (NASNetMobile, dict(dtype=dtype),
                NASNetMobile.LAYER_ORDER)
    raise ValueError(f"unknown backbone {name!r}")


class _KernelHolder(nn.Module):
    """Owns a conv kernel under the same tree path nn.Conv would use
    (<name>/kernel), so the planar stem below stays checkpoint-compatible
    with the NHWC nn.Conv formulation."""

    shape: tuple
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", KERAS_INIT, self.shape, self.dtype,
        )


def _planar_conv3x3(planes, kernel, compute_dtype):
    """3x3 SAME conv expressed as 9 shifted multiply-adds on channel
    PLANES (B, C, H, W).

    TPU motivation: at C in {1, 3}, an NHWC conv tensor puts the channel
    dim on the 128-wide lane axis, so every HBM<->VMEM copy of the big
    331x331 stem tensors moves up to 128x the useful bytes (the round-1
    profile: copies = 66% of summed op time).  In the planar layout the
    minor dims are (H, W) — dense tiles, zero lane padding — and the
    shifted MADs are pure elementwise ops XLA fuses without layout
    changes.  Accumulation in float32, like the MXU conv it replaces.
    """
    b, c_in, h, w = planes.shape
    c_out = kernel.shape[-1]
    # round weights through the compute dtype exactly like nn.Conv does,
    # then accumulate in f32 (the MXU conv's accumulation dtype)
    k = kernel.astype(compute_dtype).astype(jnp.float32)
    xp = jnp.pad(planes.astype(jnp.float32),
                 ((0, 0), (0, 0), (1, 1), (1, 1)))
    outs = []
    for o in range(c_out):
        acc = jnp.zeros((b, h, w), jnp.float32)
        for u in range(3):
            for v in range(3):
                shifted = xp[:, :, u : u + h, v : v + w]
                acc = acc + jnp.einsum(
                    "bchw,c->bhw", shifted, k[u, v, :, o]
                )
        outs.append(acc)
    return jnp.stack(outs, axis=1).astype(compute_dtype)


def _fold_conv_pool_kernel(k1):
    """Fold a 3x3 stride-1 SAME conv followed by a 2x2 stride-2 VALID
    average pool into ONE 4x4 stride-2 kernel.

    pool(conv(x)) at output pixel (p, q) averages conv outputs at
    (2p+s, 2q+t), s,t in {0,1}, each reading x[2p+s-1 : 2p+s+2] — a 4x4
    input window anchored at (2p-1, 2q-1).  So the composite is exactly a
    4x4 conv with stride 2 and kernel
        k4[U, V] = 1/4 * sum_{s,t in {0,1}} k1[U-s, V-t]   (valid taps).
    Linear-op fusion, no approximation."""
    cin, cf = k1.shape[2], k1.shape[3]
    k4 = jnp.zeros((4, 4, cin, cf), k1.dtype)
    for s in range(2):
        for t in range(2):
            k4 = k4.at[s : s + 3, t : t + 3].add(k1)
    return k4 * 0.25


def _entry_patches(x):
    """Space-to-depth patch extraction for the fused entry: 4x4 windows
    at stride 2 (anchored at (-1, -1), zero-padded like SAME), stacked on
    the channel axis.

    (B, H, W, C) -> (B, HP, WP, 16*C) with HP = (H-2)//2 + 1.  Channel
    index layout: ((U*4 + V)*C + c) — matches
    `_fold_conv_pool_kernel(...).reshape(16*C, filters)`.

    TPU motivation (round-1 profile, VERDICT r2 item 3): at C=1 the NHWC
    conv tensors put the 1-wide channel dim on the 128-lane axis, so the
    331x331 stem intermediates are copy-bound (up to 128x padded lanes).
    The patch layout hands the MXU a 16-lane operand at QUARTER the
    spatial size, and the 331^2 x 3 conv1 intermediate never exists."""
    b, h, w, c = x.shape
    hp = (h - 2) // 2 + 1
    wp = (w - 2) // 2 + 1
    pad_b = max(0, 2 * hp - (h - 1))
    pad_r = max(0, 2 * wp - (w - 1))
    xp = jnp.pad(x, ((0, 0), (1, pad_b), (1, pad_r), (0, 0)))
    return jnp.concatenate(
        [
            xp[:, u : u + 2 * hp : 2, v : v + 2 * wp : 2, :]
            for u in range(4)
            for v in range(4)
        ],
        axis=-1,
    )


def _planar_avgpool2(planes):
    """2x2 stride-2 VALID average pool on (B, C, H, W) planes."""
    h2 = (planes.shape[2] - 2) // 2 + 1
    w2 = (planes.shape[3] - 2) // 2 + 1
    p = planes.astype(jnp.float32)
    out = (
        p[:, :, 0 : 2 * h2 : 2, 0 : 2 * w2 : 2]
        + p[:, :, 0 : 2 * h2 : 2, 1 : 2 * w2 : 2]
        + p[:, :, 1 : 2 * h2 : 2, 0 : 2 * w2 : 2]
        + p[:, :, 1 : 2 * h2 : 2, 1 : 2 * w2 : 2]
    ) / 4.0
    return out.astype(planes.dtype)


class Stem(nn.Module):
    """The 'colorizer' front end (grayscale -> 3 pseudo-color channels at
    half resolution, with a pooled residual skip).

    Computed in a channel-planes (B, C, H, W) layout: see
    `_planar_conv3x3` for why (lane-padding at C in {1, 3} made the
    NHWC formulation copy-bound on TPU).  Math, parameter tree, and
    batch-stat tree are identical to the reference formulation
    (`/root/reference/spnet/models.py:315-340`); `planar=False` keeps the
    original NHWC implementation as a numerical twin for tests."""

    filters: int = 3
    dtype: Any = jnp.bfloat16
    planar: bool = True
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.fused:
            return self._fused(x, train)
        if not self.planar:
            return self._nhwc(x, train)
        b, h, w, c_in = x.shape
        planes = jnp.transpose(x, (0, 3, 1, 2)).astype(self.dtype)

        k1 = _KernelHolder((3, 3, c_in, self.filters), name="colorizer")()
        k2 = _KernelHolder((3, 3, self.filters, self.filters),
                           name="conv2")()
        k3 = _KernelHolder((3, 3, self.filters, self.filters),
                           name="conv3")()

        def bn(p, name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.99,
                epsilon=1e-3, dtype=self.dtype, axis=1, name=name,
            )(p)

        p = _planar_conv3x3(planes, k1, self.dtype)
        p = _planar_avgpool2(p)
        p = leaky_relu_01(bn(p, "bn1"))
        p = leaky_relu_01(bn(_planar_conv3x3(p, k2, self.dtype), "bn2"))
        p = bn(_planar_conv3x3(p, k3, self.dtype), "bn3")
        skip = _planar_avgpool2(planes)  # (B, 1, H/2, W/2)
        p = p + skip
        return jnp.transpose(p, (0, 2, 3, 1))  # NHWC for the backbone

    def _fused(self, x, train):
        """Space-to-depth fused entry: conv1 + avgpool as ONE 4x4/2
        patch-einsum (see `_fold_conv_pool_kernel`), residual skip
        recovered from the same patch tensor — the 331^2 x 3 conv1
        intermediate and the separate pooled-input read both disappear.
        Same param/batch-stat tree and same math as the NHWC twin
        (exact in float32; bf16 differs only in rounding order)."""
        b, h, w, c_in = x.shape
        k1 = _KernelHolder((3, 3, c_in, self.filters), name="colorizer")()
        k4 = _fold_conv_pool_kernel(k1).reshape(16 * c_in, self.filters)
        patches = _entry_patches(x.astype(self.dtype))  # (B,HP,WP,16C)
        p = jnp.einsum(
            "bhwp,pf->bhwf",
            patches,
            k4.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)

        def bn(t, name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.99,
                epsilon=1e-3, dtype=self.dtype, name=name,
            )(t)

        p = leaky_relu_01(bn(p, "bn1"))
        p = nn.Conv(
            self.filters, (3, 3), padding="SAME", use_bias=False,
            dtype=self.dtype, name="conv2", kernel_init=KERAS_INIT)(p)
        p = leaky_relu_01(bn(p, "bn2"))
        p = nn.Conv(
            self.filters, (3, 3), padding="SAME", use_bias=False,
            dtype=self.dtype, name="conv3", kernel_init=KERAS_INIT)(p)
        p = bn(p, "bn3")
        # residual skip = 2x2/2 avg pool of the input: exactly the mean
        # of patch taps (U,V) in {1,2}^2 (rows 2p, 2p+1 / cols 2q, 2q+1)
        taps = [
            patches[..., (u * 4 + v) * c_in : (u * 4 + v + 1) * c_in]
            for u in (1, 2)
            for v in (1, 2)
        ]
        skip = ((taps[0].astype(jnp.float32) + taps[1] + taps[2]
                 + taps[3]) / 4.0).astype(self.dtype)
        return p + skip

    def _nhwc(self, x, train):
        inputs = x
        x = nn.Conv(
            self.filters, (3, 3), padding="SAME", use_bias=False,
            dtype=self.dtype, name="colorizer", kernel_init=KERAS_INIT)(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype, name="bn1",
        )(x)
        x = leaky_relu_01(x)
        x = nn.Conv(
            self.filters, (3, 3), padding="SAME", use_bias=False,
            dtype=self.dtype, name="conv2", kernel_init=KERAS_INIT)(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype, name="bn2",
        )(x)
        x = leaky_relu_01(x)
        x = nn.Conv(
            self.filters, (3, 3), padding="SAME", use_bias=False,
            dtype=self.dtype, name="conv3", kernel_init=KERAS_INIT)(x)
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
    #: Mixed-precision split: compute dtype for the backbone only
    #: (None = same as `dtype`).  Stem + head stay at `dtype`; see
    #: ModelConfig.backbone_dtype.
    backbone_dtype: Any = None
    remat: bool = False
    stem_planar: bool = False
    stem_fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        from spnet_tpu.config import IND_NOOBJ, VARS_PER_PRED

        x = x.astype(self.dtype)
        x = Stem(dtype=self.dtype, planar=self.stem_planar,
                 fused=self.stem_fused, name="stem")(x, train)
        x = nn.Dropout(self.dropout_rate, deterministic=not train,
                       name="stem_dropout")(x)
        bb_dtype = self.backbone_dtype or self.dtype
        x = x.astype(bb_dtype)
        cls, kwargs, _ = _backbone_ctor(self.backbone, self.width_mult,
                                        bb_dtype)
        if self.remat:
            # rematerialize backbone activations in the backward pass:
            # trades recompute FLOPs for HBM, enabling larger batches /
            # native-resolution inputs (nn.remat is param-structure
            # preserving, so checkpoints are interchangeable)
            cls = nn.remat(cls, static_argnums=(2,))
        x = cls(name="backbone", **kwargs)(x, train)
        x = x.reshape((x.shape[0], -1))
        # fp32 head: the 576-way regression is precision-sensitive
        x = x.astype(jnp.float32)
        if self.compound_head:
            n_preds = self.num_outputs // VARS_PER_PRED
            sig = nn.Dense(n_preds, dtype=jnp.float32,
                           name="sigmoid_output", kernel_init=KERAS_INIT)(x)
            sig = jax.nn.sigmoid(sig)
            dense = nn.Dense(self.num_outputs - n_preds,
                             dtype=jnp.float32, name="dense_output", kernel_init=KERAS_INIT)(x)
            # interleave: place sig[k] at slot k's IND_NOOBJ lane
            d3 = dense.reshape(-1, n_preds, VARS_PER_PRED - 1)
            out = jnp.concatenate(
                [d3[..., :IND_NOOBJ], sig[..., None],
                 d3[..., IND_NOOBJ:]], axis=-1,
            )
            x = out.reshape(-1, self.num_outputs)
        else:
            x = nn.Dense(self.num_outputs, dtype=jnp.float32,
                         name="final_output", kernel_init=KERAS_INIT)(x)
        if self.selective_sigmoid:
            x = selective_sigmoid_jnp(x)
        return x

    def backbone_layer_order(self):
        _, _, order = _backbone_ctor(self.backbone, self.width_mult)
        return order


def build_model(cfg: ModelConfig, num_outputs: int = 576,
                width_mult: float = 1.0) -> SPNet:
    return SPNet(
        num_outputs=num_outputs,
        backbone=cfg.backbone,
        dropout_rate=cfg.dropout_rate,
        selective_sigmoid=cfg.selective_sigmoid,
        compound_head=getattr(cfg, "compound_head", False),
        width_mult=width_mult,
        dtype=jnp.dtype(cfg.compute_dtype),
        backbone_dtype=(jnp.dtype(cfg.backbone_dtype)
                        if getattr(cfg, "backbone_dtype", "") else None),
        remat=cfg.remat,
        stem_planar=cfg.stem_planar,
        stem_fused=cfg.stem_fused,
    )
