"""Keras -> flax pretrained-weight import.

The reference's MobileNet path can start from Keras imagenet weights
(`/root/reference/spnet/models.py:349-355`; the Xception path passes
weights=None and trains from scratch, `models.py:359`).  This module maps
a Keras MobileNet (include_top=False) weight set onto the flax
`spnet_tpu.models.mobilenet.MobileNet` parameter / batch-stat trees.

Input can be a Keras model object or a weights file (.h5 / .keras /
.weights.h5) — anything `keras.saving.load_model` or
`model.load_weights` accepts.  This environment has no network egress,
so imagenet weights must be provided as a local file; the numerical
mapping itself is verified in tests against a randomly-initialized Keras
model (output parity through the whole 28-layer stack).
"""

from __future__ import annotations

import numpy as np


def _split_bn(weights):
    """Keras BN weight list [gamma, beta, moving_mean, moving_var] ->
    (params, stats) dicts for flax BatchNorm."""
    gamma, beta, mean, var = (np.asarray(w) for w in weights)
    return (
        {"scale": gamma, "bias": beta},
        {"mean": mean, "var": var},
    )


def keras_mobilenet_to_flax(model) -> tuple[dict, dict]:
    """Map a Keras MobileNet(include_top=False) to (params, batch_stats)
    trees matching `spnet_tpu.models.mobilenet.MobileNet`.

    Layer correspondence (Keras name -> flax path):
      conv1 / conv1_bn          -> conv1/{conv,bn}
      conv_dw_<i> / _bn         -> block<i>/{depthwise,bn_dw}
      conv_pw_<i> / _bn         -> block<i>/{pointwise,bn}
    Depthwise kernels transpose (kh, kw, C, 1) -> (kh, kw, 1, C), the
    flax feature_group_count layout.
    """
    by_name = {layer.name: layer for layer in model.layers}

    params: dict = {}
    stats: dict = {}

    conv1 = np.asarray(by_name["conv1"].get_weights()[0])
    bn_p, bn_s = _split_bn(by_name["conv1_bn"].get_weights())
    params["conv1"] = {"conv": {"kernel": conv1}, "bn": bn_p}
    stats["conv1"] = {"bn": bn_s}

    for i in range(1, 14):
        dw = np.asarray(by_name[f"conv_dw_{i}"].get_weights()[0])
        dw = np.transpose(dw, (0, 1, 3, 2))  # (kh,kw,C,1) -> (kh,kw,1,C)
        pw = np.asarray(by_name[f"conv_pw_{i}"].get_weights()[0])
        bndw_p, bndw_s = _split_bn(by_name[f"conv_dw_{i}_bn"].get_weights())
        bnpw_p, bnpw_s = _split_bn(by_name[f"conv_pw_{i}_bn"].get_weights())
        params[f"block{i}"] = {
            "depthwise": {"kernel": dw},
            "bn_dw": bndw_p,
            "pointwise": {"kernel": pw},
            "bn": bnpw_p,
        }
        stats[f"block{i}"] = {"bn_dw": bndw_s, "bn": bnpw_s}

    return params, stats


def load_keras_mobilenet(path_or_model) -> tuple[dict, dict]:
    """Load a Keras MobileNet from a file path (or pass a model through)
    and convert to flax trees."""
    if isinstance(path_or_model, str):
        import keras

        try:
            model = keras.saving.load_model(path_or_model)
        except Exception:
            # a bare weights file: rebuild the architecture and load into it
            model = keras.applications.MobileNet(
                include_top=False, weights=None,
                input_shape=(None, None, 3),
            )
            model.load_weights(path_or_model)
    else:
        model = path_or_model
    return keras_mobilenet_to_flax(model)


def apply_backbone_weights(params, batch_stats, bb_params, bb_stats):
    """Return (params, batch_stats) pytrees with the 'backbone' subtree
    replaced by the imported weights (shape-checked leaf by leaf)."""
    import jax

    def check(old, new):
        old_s = np.shape(old)
        new_s = np.shape(new)
        if old_s != new_s:
            raise ValueError(
                f"pretrained weight shape {new_s} != model shape {old_s}"
            )
        return np.asarray(new, dtype=np.asarray(old).dtype)

    new_params = dict(params)
    new_params["backbone"] = jax.tree_util.tree_map(
        check, dict(params["backbone"]), bb_params
    )
    new_stats = dict(batch_stats)
    new_stats["backbone"] = jax.tree_util.tree_map(
        check, dict(batch_stats["backbone"]), bb_stats
    )
    return new_params, new_stats
