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
    x = jnp.ones((2, 64, 64, 1), jnp.float32)
    rng = jax.random.key(0)
    variables = model.init({"params": rng, "dropout": rng}, x, train=False)

    def loss_fn(params):
        y = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=False,
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
