"""Model zoo smoke tests: shapes, param structure, grads, train/eval modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spnet_tpu.config import ModelConfig
from spnet_tpu.models import build_model
from spnet_tpu.models.spnet import SPNet


def _init_and_apply(model, x, train=False):
    rng = jax.random.key(0)
    variables = model.init(
        {"params": rng, "dropout": rng}, x, train=False
    )
    if train:
        y, updates = model.apply(
            variables, x, train=True,
            rngs={"dropout": jax.random.key(1)},
            mutable=["batch_stats"],
        )
        return y, variables, updates
    y = model.apply(variables, x, train=False)
    return y, variables, None


def test_mobilenet_tiny_forward():
    model = SPNet(num_outputs=576, backbone="MobileNetTiny",
                  dtype=jnp.float32)
    x = jnp.zeros((2, 96, 96, 1), jnp.float32)
    y, variables, _ = _init_and_apply(model, x)
    assert y.shape == (2, 576)
    assert y.dtype == jnp.float32
    # stem + backbone + head all present
    top = set(variables["params"].keys())
    assert {"stem", "backbone", "final_output"} <= top


def test_train_mode_updates_batch_stats():
    model = SPNet(num_outputs=64, backbone="MobileNetTiny",
                  dtype=jnp.float32)
    x = jnp.ones((2, 64, 64, 1), jnp.float32)
    y, variables, updates = _init_and_apply(model, x, train=True)
    assert "batch_stats" in updates
    # running stats must have changed from init (zeros means)
    leaf = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaf)


def test_gradients_flow():
    model = SPNet(num_outputs=64, backbone="MobileNetTiny",
                  dtype=jnp.float32)
    # random input: a CONSTANT image can dead-ReLU an entire
    # 0.125-width layer by init luck, which says nothing about flow
    x = jax.random.normal(jax.random.key(7), (2, 64, 64, 1), jnp.float32)
    rng = jax.random.key(0)
    variables = model.init({"params": rng, "dropout": rng}, x, train=False)

    def loss_fn(params):
        # train=True: batch-norm normalizes each layer's activations as
        # in real training.  (In eval mode at INIT, running stats are
        # (0, 1), so the Keras-matching glorot init — whose per-layer
        # gain is < 1 — decays activations geometrically; Keras behaves
        # identically and trains fine because BN train-mode rescales.)
        y, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, rngs={"dropout": jax.random.key(1)},
            mutable=["batch_stats"],
        )
        return jnp.mean(y**2)

    g = jax.jit(jax.grad(loss_fn))(variables["params"])
    norms = [float(jnp.linalg.norm(l)) for l in jax.tree_util.tree_leaves(g)]
    assert sum(n > 0 for n in norms) > len(norms) * 0.5


def test_selective_sigmoid_head():
    model = SPNet(num_outputs=64, backbone="MobileNetTiny",
                  selective_sigmoid=True, dtype=jnp.float32)
    x = jnp.ones((1, 64, 64, 1), jnp.float32)
    y, _, _ = _init_and_apply(model, x)
    noobj = np.asarray(y).reshape(-1, 8)[:, 6]
    assert ((noobj >= 0) & (noobj <= 1)).all()


@pytest.mark.slow
def test_xception_forward_tiny():
    model = SPNet(num_outputs=576, backbone="Xception", dtype=jnp.float32)
    x = jnp.zeros((1, 128, 128, 1), jnp.float32)
    y, variables, _ = _init_and_apply(model, x)
    assert y.shape == (1, 576)
    n_params = sum(
        int(np.prod(l.shape))
        for l in jax.tree_util.tree_leaves(variables["params"])
    )
    # Xception trunk is ~20.9M params (reference scale)
    assert 15e6 < n_params < 80e6


def test_build_model_from_config():
    cfg = ModelConfig(backbone="MobileNetTiny", compute_dtype="float32")
    m = build_model(cfg, num_outputs=576)
    assert m.backbone == "MobileNetTiny"


def test_compound_head():
    """'compound' head: sigmoid existence branch interleaved into the
    canonical layout (noobj lanes in [0,1], others unconstrained)."""
    model = SPNet(num_outputs=128, backbone="MobileNetTiny",
                  compound_head=True, dtype=jnp.float32)
    x = jnp.ones((2, 64, 64, 1), jnp.float32)
    y, variables, _ = _init_and_apply(model, x)
    assert y.shape == (2, 128)
    out = np.asarray(y).reshape(2, -1, 8)
    noobj = out[..., 6]
    assert ((noobj >= 0) & (noobj <= 1)).all()
    top = set(variables["params"].keys())
    assert {"sigmoid_output", "dense_output"} <= top


def test_compound_head_reachable_from_config():
    """ModelConfig.compound_head (reference model_type 'compound') must
    plumb through build_model — previously only the SPNet module had the
    flag, so the config/CLI surface could not select it."""
    from spnet_tpu.config import ModelConfig
    from spnet_tpu.models.spnet import build_model

    model = build_model(
        ModelConfig(backbone="MobileNetTiny", input_size=64,
                    compound_head=True, compute_dtype="float32"),
        num_outputs=128)
    assert model.compound_head
    x = jnp.ones((2, 64, 64, 1), jnp.float32)
    y, variables, _ = _init_and_apply(model, x)
    noobj = np.asarray(y).reshape(2, -1, 8)[..., 6]
    assert ((noobj >= 0) & (noobj <= 1)).all()


def test_darknet_backbone():
    model = SPNet(num_outputs=576, backbone="DarkNet19", dtype=jnp.float32)
    x = jnp.zeros((1, 128, 128, 1), jnp.float32)
    y, _, _ = _init_and_apply(model, x)
    assert y.shape == (1, 576)


@pytest.mark.slow
def test_backbone_param_counts_match_keras():
    """Architecture parity: total variable counts (params + batch stats)
    equal keras.applications' count_params() EXACTLY for all three
    backbones (verified against keras 3.13 / TF 2.21; values pinned here
    so CI does not need TF)."""
    import jax

    from spnet_tpu.models.inception_resnet_v2 import InceptionResNetV2
    from spnet_tpu.models.mobilenet import MobileNet
    from spnet_tpu.models.xception import Xception

    from spnet_tpu.models.nasnet import NASNetMobile

    expected = {
        "Xception": 20_861_480,
        "MobileNet": 3_228_864,
        "InceptionResNetV2": 54_336_736,
        "NASNetMobile": 4_269_716,
    }
    mods = {
        "Xception": Xception(),
        "MobileNet": MobileNet(),
        "InceptionResNetV2": InceptionResNetV2(),
        "NASNetMobile": NASNetMobile(),
    }
    for name, mod in mods.items():
        v = mod.init(jax.random.key(0), jnp.zeros((1, 160, 160, 3)),
                     train=False)
        n = sum(int(np.prod(l.shape))
                for l in jax.tree_util.tree_leaves(v))
        assert n == expected[name], (name, n, expected[name])


def test_nasnet_in_spnet():
    model = SPNet(num_outputs=64, backbone="NASNetMobile",
                  dtype=jnp.float32)
    x = jnp.zeros((1, 96, 96, 1), jnp.float32)
    y, _, _ = _init_and_apply(model, x)
    assert y.shape == (1, 64)


def test_planar_stem_matches_nhwc_twin():
    """The planar (channels-as-planes) stem must be numerically and
    structurally identical to the NHWC nn.Conv formulation: same param /
    batch-stat trees (checkpoint compatibility), same init values (same
    rng paths), same outputs in both eval and train modes."""
    import jax
    import jax.numpy as jnp

    from spnet_tpu.models.spnet import Stem

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (4, 65, 65, 1)).astype(np.float32))

    planar = Stem(dtype=jnp.float32, planar=True)
    nhwc = Stem(dtype=jnp.float32, planar=False)
    vp = planar.init(jax.random.key(3), x, train=False)
    vn = nhwc.init(jax.random.key(3), x, train=False)

    # identical trees AND identical initial values
    pa = jax.tree_util.tree_leaves_with_path(vp)
    pb = jax.tree_util.tree_leaves_with_path(vn)
    assert [jax.tree_util.keystr(k) for k, _ in pa] == \
           [jax.tree_util.keystr(k) for k, _ in pb]
    for (_, la), (_, lb) in zip(pa, pb):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    ye = planar.apply(vn, x, train=False)
    yn = nhwc.apply(vn, x, train=False)
    assert ye.shape == yn.shape == (4, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(ye), np.asarray(yn),
                               rtol=1e-5, atol=1e-5)

    # train mode: outputs AND updated batch stats agree
    yep, mp = planar.apply(vn, x, train=True, mutable=["batch_stats"])
    ynp_, mn = nhwc.apply(vn, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yep), np.asarray(ynp_),
                               rtol=1e-5, atol=1e-5)
    for (_, la), (_, lb) in zip(
        jax.tree_util.tree_leaves_with_path(mp),
        jax.tree_util.tree_leaves_with_path(mn),
    ):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-5, atol=1e-6)


def test_fused_stem_matches_nhwc_twin():
    """The space-to-depth fused entry (conv1 + avgpool folded into one
    4x4/2 patch-einsum, skip recovered from the patches) must be a
    numerical and structural twin of the NHWC formulation: same param /
    batch-stat trees and init, same outputs in eval AND train modes —
    the fold is exact linear algebra, so float32 agreement is to ULP
    scale.  Both odd (331-like) and even input sizes, and 3-channel
    input, to pin the padding derivation."""
    import jax
    import jax.numpy as jnp

    from spnet_tpu.models.spnet import Stem

    rng = np.random.default_rng(1)
    for h, c in ((65, 1), (64, 1), (33, 3)):
        x = jnp.asarray(rng.normal(0, 1, (2, h, h, c)).astype(np.float32))
        fused = Stem(dtype=jnp.float32, planar=False, fused=True)
        nhwc = Stem(dtype=jnp.float32, planar=False)
        vf = fused.init(jax.random.key(3), x, train=False)
        vn = nhwc.init(jax.random.key(3), x, train=False)

        pa = jax.tree_util.tree_leaves_with_path(vf)
        pb = jax.tree_util.tree_leaves_with_path(vn)
        assert [jax.tree_util.keystr(k) for k, _ in pa] == \
               [jax.tree_util.keystr(k) for k, _ in pb]
        for (_, la), (_, lb) in zip(pa, pb):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

        ye = fused.apply(vn, x, train=False)
        yn = nhwc.apply(vn, x, train=False)
        assert ye.shape == yn.shape == (2, (h - 2) // 2 + 1,
                                        (h - 2) // 2 + 1, 3)
        np.testing.assert_allclose(np.asarray(ye), np.asarray(yn),
                                   rtol=1e-5, atol=1e-5)

        yep, mp = fused.apply(vn, x, train=True, mutable=["batch_stats"])
        ynp_, mn = nhwc.apply(vn, x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(yep), np.asarray(ynp_),
                                   rtol=1e-5, atol=1e-5)
        for (_, la), (_, lb) in zip(
            jax.tree_util.tree_leaves_with_path(mp),
            jax.tree_util.tree_leaves_with_path(mn),
        ):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_keras_mobilenet_import_parity(tmp_path):
    """Pretrained-weight import (reference `models.py:349-355`): weights
    mapped from a Keras MobileNet must reproduce the Keras outputs
    through the whole 28-layer stack, proving both the architecture and
    the weight mapping.  Exercised end-to-end: save a Keras weights
    file, point ModelConfig.pretrained at it, and check the backbone
    subtree of the initialized train state."""
    keras = pytest.importorskip("keras")
    import jax
    import jax.numpy as jnp

    from spnet_tpu.io.keras_import import (
        apply_backbone_weights,
        keras_mobilenet_to_flax,
        load_keras_mobilenet,
    )
    from spnet_tpu.models.mobilenet import MobileNet

    km = keras.applications.MobileNet(include_top=False, weights=None,
                                      input_shape=(96, 96, 3))
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 96, 96, 3)).astype(np.float32)
    yk = np.asarray(km(x, training=False))

    bb_p, bb_s = keras_mobilenet_to_flax(km)
    fm = MobileNet(dtype=jnp.float32)
    yf = np.asarray(fm.apply({"params": bb_p, "batch_stats": bb_s},
                             jnp.asarray(x), train=False))
    denom = np.abs(yk).mean() + 1e-30
    assert np.abs(yk - yf).max() / denom < 1e-3

    # file round-trip + backbone grafting
    wpath = str(tmp_path / "mn.weights.h5")
    km.save_weights(wpath)
    bb_p2, bb_s2 = load_keras_mobilenet(wpath)
    v = fm.init(jax.random.key(0), jnp.asarray(x), train=False)
    wrapped_p = {"backbone": v["params"]}
    wrapped_s = {"backbone": v["batch_stats"]}
    new_p, new_s = apply_backbone_weights(wrapped_p, wrapped_s,
                                          bb_p2, bb_s2)
    np.testing.assert_array_equal(
        np.asarray(new_p["backbone"]["conv1"]["conv"]["kernel"]),
        np.asarray(km.get_layer("conv1").get_weights()[0]),
    )


def test_remat_backbone_identical():
    """ModelConfig.remat wraps the backbone in nn.remat: parameter
    structure, outputs, and gradients must be identical to the
    non-remat model (only peak memory changes)."""
    import jax
    import jax.numpy as jnp

    from spnet_tpu.config import ModelConfig
    from spnet_tpu.models.spnet import build_model

    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (2, 64, 64, 1))
        .astype(np.float32))
    plain = build_model(ModelConfig(backbone="MobileNetTiny",
                                    compute_dtype="float32"), 64)
    rem = build_model(ModelConfig(backbone="MobileNetTiny",
                                  compute_dtype="float32", remat=True), 64)
    v = plain.init(jax.random.key(0), x, train=False)
    v2 = rem.init(jax.random.key(0), x, train=False)
    assert jax.tree_util.tree_structure(v) == \
        jax.tree_util.tree_structure(v2)

    y1 = plain.apply(v, x, train=False)
    y2 = rem.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-6, atol=1e-6)

    def loss(m, params):
        out, _ = m.apply({"params": params,
                          "batch_stats": v["batch_stats"]}, x,
                         train=True, rngs={"dropout": jax.random.key(1)},
                         mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    g1 = jax.grad(lambda p: loss(plain, p))(v["params"])
    g2 = jax.grad(lambda p: loss(rem, p))(v["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_keras_xception_import_parity(tmp_path):
    """Xception pretrained-weight import: weights mapped from a Keras
    Xception(include_top=False) must reproduce the Keras outputs through
    the whole entry/middle/exit stack (random weights stand in for the
    imagenet file, which this offline environment cannot download — see
    io/keras_import.load_keras_backbone for procurement)."""
    keras = pytest.importorskip("keras")
    import jax.numpy as jnp

    from spnet_tpu.io.keras_import import (
        keras_xception_to_flax,
        load_keras_backbone,
    )
    from spnet_tpu.models.xception import Xception

    km = keras.applications.Xception(include_top=False, weights=None,
                                     input_shape=(96, 96, 3))
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (2, 96, 96, 3)).astype(np.float32)
    yk = np.asarray(km(x, training=False))

    bb_p, bb_s = keras_xception_to_flax(km)
    fm = Xception(dtype=jnp.float32)
    yf = np.asarray(fm.apply({"params": bb_p, "batch_stats": bb_s},
                             jnp.asarray(x), train=False))
    assert yk.shape == yf.shape
    # random-init Xception outputs are ~1e-5 in magnitude (36 relu/BN
    # layers shrink activations), so compare against the output SCALE
    # (worst element vs max) plus overall direction (cosine) instead of
    # elementwise relative error
    assert np.abs(yk - yf).max() / (np.abs(yk).max() + 1e-30) < 0.05
    cos = float(
        (yk * yf).sum()
        / (np.linalg.norm(yk) * np.linalg.norm(yf) + 1e-30)
    )
    assert cos > 0.999, cos

    # weights-file round trip through the dispatching loader
    wpath = str(tmp_path / "xc.weights.h5")
    km.save_weights(wpath)
    bb_p2, _ = load_keras_backbone(wpath, "Xception")
    np.testing.assert_array_equal(
        np.asarray(bb_p2["middle3"]["sep2"]["pointwise"]["kernel"]),
        np.asarray(bb_p["middle3"]["sep2"]["pointwise"]["kernel"]),
    )


def _keras_output_parity(yk, yf):
    """Shared closeness criterion for random-weight keras-vs-flax output
    comparison: worst element relative to the output's own scale, plus
    whole-tensor cosine (deep random BN/relu stacks shrink magnitudes,
    making elementwise relative error meaningless)."""
    assert yk.shape == yf.shape, (yk.shape, yf.shape)
    assert np.abs(yk - yf).max() / (np.abs(yk).max() + 1e-30) < 0.05
    cos = float((yk * yf).sum()
                / (np.linalg.norm(yk) * np.linalg.norm(yf) + 1e-30))
    assert cos > 0.999, cos


@pytest.mark.slow
def test_keras_irv2_import_parity():
    """InceptionResNetV2 pretrained-weight import: the creation-order
    zip of Keras auto-named conv/BN pairs (io/keras_import.py
    `_irv2_convbn_paths`) must reproduce Keras outputs through all 43
    residual blocks (random weights stand in for the imagenet file)."""
    keras = pytest.importorskip("keras")
    import jax.numpy as jnp

    from spnet_tpu.io.keras_import import keras_irv2_to_flax
    from spnet_tpu.models.inception_resnet_v2 import InceptionResNetV2

    km = keras.applications.InceptionResNetV2(
        include_top=False, weights=None, input_shape=(96, 96, 3))
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (2, 96, 96, 3)).astype(np.float32)
    yk = np.asarray(km(x, training=False))

    bb_p, bb_s = keras_irv2_to_flax(km)
    fm = InceptionResNetV2(dtype=jnp.float32)
    yf = np.asarray(fm.apply({"params": bb_p, "batch_stats": bb_s},
                             jnp.asarray(x), train=False))
    _keras_output_parity(yk, yf)


@pytest.mark.slow
def test_keras_nasnet_import_parity():
    """NASNetMobile pretrained-weight import: the per-cell name
    translation (io/keras_import.py `_nasnet_cell_ids`) must reproduce
    Keras outputs through all 12 normal + 4 reduction cells."""
    keras = pytest.importorskip("keras")
    import jax.numpy as jnp

    from spnet_tpu.io.keras_import import keras_nasnet_to_flax
    from spnet_tpu.models.nasnet import NASNetMobile

    km = keras.applications.NASNetMobile(
        include_top=False, weights=None, input_shape=(96, 96, 3))
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, (2, 96, 96, 3)).astype(np.float32)
    yk = np.asarray(km(x, training=False))

    bb_p, bb_s = keras_nasnet_to_flax(km)
    fm = NASNetMobile(dtype=jnp.float32)
    yf = np.asarray(fm.apply({"params": bb_p, "batch_stats": bb_s},
                             jnp.asarray(x), train=False))
    _keras_output_parity(yk, yf)


def test_f32_config_computes_f32_throughout():
    """Round-4 regression guard: Xception's _DownBlock/_MiddleBlock were
    instantiated without dtype and silently computed bfloat16 even when
    the config said float32 — which means the 'f32' accuracy-parity
    recipe never actually ran f32 in blocks 2-4 + the middle flow.
    Capture every submodule output of an f32-configured backbone and
    require float32 everywhere."""
    import jax

    from spnet_tpu.models.xception import Xception

    model = Xception(dtype=jnp.float32)
    x = jnp.zeros((1, 71, 71, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, False)
    _, st = model.apply(
        variables, x, False,
        capture_intermediates=lambda mdl, name: name == "__call__",
    )
    bad = []

    def walk(tree, path=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{path}/{k}")
        elif isinstance(tree, (tuple, list)):
            for i, v in enumerate(tree):
                walk(v, f"{path}[{i}]")
        elif hasattr(tree, "dtype"):
            if tree.dtype != jnp.float32:
                bad.append((path, str(tree.dtype)))

    walk(st["intermediates"])
    assert not bad, f"non-f32 intermediates in f32 config: {bad[:8]}"


def test_mixed_precision_backbone_dtype_split():
    """ModelConfig.backbone_dtype: stem + head compute in compute_dtype,
    backbone in backbone_dtype (the speed/accuracy mixed recipe)."""
    import jax

    from spnet_tpu.config import ModelConfig
    from spnet_tpu.models.spnet import build_model

    cfg = ModelConfig(backbone="MobileNetTiny", input_size=64,
                      compute_dtype="float32",
                      backbone_dtype="bfloat16")
    model = build_model(cfg, num_outputs=576)
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    variables = model.init(jax.random.key(0), x, False)
    out, st = model.apply(
        variables, x, False,
        capture_intermediates=lambda mdl, name: name == "__call__",
    )
    assert out.dtype == jnp.float32  # head is f32
    inter = st["intermediates"]
    stem_out = inter["stem"]["__call__"][0]
    bb_out = inter["backbone"]["__call__"][0]
    assert stem_out.dtype == jnp.float32
    assert bb_out.dtype == jnp.bfloat16
    # params stay f32 masters throughout
    for leaf in jax.tree_util.tree_leaves(variables["params"]):
        assert leaf.dtype == jnp.float32
