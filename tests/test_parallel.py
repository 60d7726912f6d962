"""Mesh/sharding tests beyond the train step: large-batch sharded
inference (the 50k-frame movie predict path, SURVEY.md §5 'long context'
analogue) and mesh helpers."""

import jax
import jax.numpy as jnp
import numpy as np

from spnet_tpu.models.spnet import SPNet
from spnet_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicate_state,
    shard_batch,
)
from spnet_tpu.train.schedule import onecycle_schedule
from spnet_tpu.train.state import create_train_state
from spnet_tpu.train.steps import make_predict_step


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.size == 8
    assert mesh.axis_names == (DATA_AXIS,)
    m4 = make_mesh(4)
    assert m4.size == 4


def test_sharded_inference_matches_single_device():
    model = SPNet(num_outputs=576, backbone="MobileNetTiny",
                  dtype=jnp.float32)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((2, 64, 64, 1)),
        onecycle_schedule(1e-3, 10),
    )
    predict = make_predict_step(model)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(32, 64, 64, 1)).astype(np.float32))
    y1 = np.asarray(predict(state.params, state.batch_stats, x))

    mesh = make_mesh()
    params_r = replicate_state(mesh, state.params)
    stats_r = replicate_state(mesh, state.batch_stats)
    xs = shard_batch(mesh, x)
    assert xs.sharding == batch_sharding(mesh)
    y2 = np.asarray(predict(params_r, stats_r, xs))
    np.testing.assert_allclose(y2, y1, rtol=1e-4, atol=1e-5)


def test_sharded_inference_uint8_input():
    """The movie predict path feeds uint8 frames; normalization happens
    in the jitted program on device."""
    model = SPNet(num_outputs=64, backbone="MobileNetTiny",
                  dtype=jnp.float32)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((2, 64, 64, 1)),
        onecycle_schedule(1e-3, 10),
    )
    predict = make_predict_step(model)
    rng = np.random.default_rng(1)
    xu8 = jnp.asarray(rng.integers(0, 256, (16, 64, 64, 1),
                                   dtype=np.uint8))
    xf = (xu8.astype(jnp.float32) / 255.0 - 0.5) * 2.0
    y8 = np.asarray(predict(state.params, state.batch_stats, xu8))
    yf = np.asarray(predict(state.params, state.batch_stats, xf))
    np.testing.assert_allclose(y8, yf, rtol=1e-5, atol=1e-6)
