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


def keras_xception_to_flax(model) -> tuple[dict, dict]:
    """Map a Keras Xception(include_top=False) to (params, batch_stats)
    trees matching `spnet_tpu.models.xception.Xception`.

    Layer correspondence (Keras name -> flax path):
      block1_conv1/_bn               -> conv1/{conv,bn}
      block1_conv2/_bn               -> conv2/{conv,bn}
      block{2,3,4}_sepconv{1,2}/_bn  -> block{2,3,4}/sep{1,2}
      conv2d{,_1,_2}/batch_normalization{,_1,_2}
                                     -> block{2,3,4}/shortcut
      block{5..12}_sepconv{1,2,3}    -> middle{1..8}/sep{1,2,3}
      conv2d_3/batch_normalization_3 -> exit_shortcut
      block13_sepconv{1,2}           -> exit_sep{1,2}
      block14_sepconv{1,2}           -> exit_sep{3,4}
    Keras SeparableConv2D holds [depthwise (kh,kw,C,1), pointwise];
    the depthwise kernel transposes to flax's (kh,kw,1,C) layout.
    """
    by_name = {layer.name: layer for layer in model.layers}

    params: dict = {}
    stats: dict = {}

    def conv_bn(kconv: str, kbn: str):
        kernel = np.asarray(by_name[kconv].get_weights()[0])
        bn_p, bn_s = _split_bn(by_name[kbn].get_weights())
        return {"conv": {"kernel": kernel}, "bn": bn_p}, {"bn": bn_s}

    def sep_bn(ksep: str):
        dw, pw = (np.asarray(w) for w in by_name[ksep].get_weights())
        dw = np.transpose(dw, (0, 1, 3, 2))  # (kh,kw,C,1) -> (kh,kw,1,C)
        bn_p, bn_s = _split_bn(by_name[ksep + "_bn"].get_weights())
        return (
            {"depthwise": {"kernel": dw}, "pointwise": {"kernel": pw},
             "bn": bn_p},
            {"bn": bn_s},
        )

    params["conv1"], stats["conv1"] = conv_bn("block1_conv1",
                                              "block1_conv1_bn")
    params["conv2"], stats["conv2"] = conv_bn("block1_conv2",
                                              "block1_conv2_bn")

    # The 4 residual 1x1 convs carry auto-generated names ("conv2d",
    # "conv2d_1", ... — uniquified PER PROCESS by Keras, so absolute
    # names are unreliable).  Identify them structurally: the only plain
    # Conv2D / BatchNormalization layers outside block1/sepconv, in
    # graph order block2, block3, block4, exit.
    res_convs = [l for l in model.layers
                 if l.__class__.__name__ == "Conv2D"
                 and not l.name.startswith("block1")]
    res_bns = [l for l in model.layers
               if l.__class__.__name__ == "BatchNormalization"
               and not l.name.endswith("_bn")]
    assert len(res_convs) == 4 and len(res_bns) == 4, (
        [l.name for l in res_convs], [l.name for l in res_bns])

    def res_names(i: int):
        return res_convs[i].name, res_bns[i].name

    for n, kblock in enumerate(("block2", "block3", "block4")):
        p: dict = {}
        s: dict = {}
        p["shortcut"], s["shortcut"] = conv_bn(*res_names(n))
        for j in (1, 2):
            p[f"sep{j}"], s[f"sep{j}"] = sep_bn(f"{kblock}_sepconv{j}")
        params[kblock] = p
        stats[kblock] = s

    for m in range(8):
        p, s = {}, {}
        for j in (1, 2, 3):
            p[f"sep{j}"], s[f"sep{j}"] = sep_bn(f"block{m + 5}_sepconv{j}")
        params[f"middle{m + 1}"] = p
        stats[f"middle{m + 1}"] = s

    params["exit_shortcut"], stats["exit_shortcut"] = conv_bn(*res_names(3))
    for flax_name, keras_name in (
        ("exit_sep1", "block13_sepconv1"),
        ("exit_sep2", "block13_sepconv2"),
        ("exit_sep3", "block14_sepconv1"),
        ("exit_sep4", "block14_sepconv2"),
    ):
        params[flax_name], stats[flax_name] = sep_bn(keras_name)

    return params, stats


def load_keras_backbone(path_or_model, backbone: str) -> tuple[dict, dict]:
    """Load Keras pretrained weights for `backbone` ('MobileNet' family
    or 'Xception') from a model/weights file and convert to flax trees.

    This environment has no network egress, so weights must be a LOCAL
    file.  Offline procurement (on any machine with internet):
        python -c "import keras; m = keras.applications.Xception(
            include_top=False, weights='imagenet');
            m.save_weights('xception_imagenet.weights.h5')"
    then pass that file as ModelConfig.pretrained / --pretrained.
    """
    if backbone in ("MobileNet", "MobileNetTiny"):
        return load_keras_mobilenet(path_or_model)
    if backbone == "Xception":
        model = path_or_model
        if isinstance(path_or_model, str):
            import keras

            try:
                model = keras.saving.load_model(path_or_model)
            except Exception:
                model = keras.applications.Xception(
                    include_top=False, weights=None,
                    input_shape=(None, None, 3),
                )
                model.load_weights(path_or_model)
        return keras_xception_to_flax(model)
    raise ValueError(
        f"pretrained Keras import supports MobileNet and Xception, "
        f"not {backbone!r}.  InceptionResNetV2 / NASNetMobile are "
        f"deliberately scratch-only: the reference itself never loads "
        f"pretrained weights for ANY headline run (models.py:359 "
        f"passes weights=None even for Xception), its non-Xception "
        f"backbones exist only as menu options, and both remaining "
        f"mappings (43 residual blocks with interleaved mixed blocks; "
        f"NASNet's generated cell naming) add ~500 lines of "
        f"name-plumbing with no run that would consume them.  The "
        f"MobileNet + Xception importers cover both backbones the "
        f"reference ever ran (models.py:349-359) and serve as the "
        f"pattern if a use case appears."
    )


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
