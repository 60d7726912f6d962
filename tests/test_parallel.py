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


def _epoch_trajectory(mesh, n_dev_note, x_np, y_np, idx_np):
    """Run 2 whole-epoch scan programs and return the per-step losses."""
    from spnet_tpu.config import LossWeights
    from spnet_tpu.train.steps import make_train_step

    model = SPNet(num_outputs=576, backbone="MobileNetTiny",
                  dtype=jnp.float32)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((idx_np.shape[1], 64, 64, 1)),
        onecycle_schedule(1e-3, 100),
    )
    if mesh is not None:
        state = replicate_state(mesh, state)
        x_all = jax.device_put(jnp.asarray(x_np), batch_sharding(mesh))
        y_all = jax.device_put(jnp.asarray(y_np), batch_sharding(mesh))
    else:
        x_all = jnp.asarray(x_np)
        y_all = jnp.asarray(y_np)
    step = make_train_step(model, LossWeights(), "same", l2_reg=1e-4,
                           augment=True, indexed="epoch", mesh=mesh)
    out = []
    for ep in range(2):
        state, losses = step(state, x_all, y_all, jnp.asarray(idx_np),
                             jax.random.fold_in(jax.random.key(7), ep))
        out.append(np.asarray(losses))
    return np.concatenate(out)


def test_mesh_epoch_scan_matches_single_device():
    """The production multi-device path — device-resident dataset sharded
    over the mesh, whole-epoch lax.scan — must produce the SAME loss
    trajectory as the single-device epoch program (global-batch BN, grad
    all-reduce inserted by XLA; reference parity target
    `multi_gpu.py:49-54`)."""
    rng = np.random.default_rng(3)
    n, bs, steps = 32, 16, 4
    x_np = rng.integers(0, 256, (n, 64, 64, 1), dtype=np.uint8)
    y_np = rng.normal(0, 0.2, (n, 576)).astype(np.float32)
    idx_np = rng.integers(0, n, (steps, bs)).astype(np.int32)

    tr_single = _epoch_trajectory(None, 1, x_np, y_np, idx_np)
    tr_mesh = _epoch_trajectory(make_mesh(), 8, x_np, y_np, idx_np)
    assert np.isfinite(tr_single).all() and np.isfinite(tr_mesh).all()
    # the programs are semantically identical, but train-mode BN batch
    # statistics are reductions whose float ordering differs between the
    # sharded and unsharded partitions; that ~1e-7 noise is amplified by
    # the 1/sqrt(var+eps) normalization and COMPOUNDS through chained
    # optimizer steps.  So: near-exact on the first step, bounded drift
    # over the 8-step trajectory.
    np.testing.assert_allclose(tr_mesh[0], tr_single[0], rtol=1e-3)
    rel = np.abs(tr_mesh - tr_single) / np.abs(tr_single)
    assert rel.max() < 5e-2, f"trajectories diverged: {rel}"


def test_chunked_device_put_matches_plain(monkeypatch):
    """chunked_device_put must be bit-identical to a plain device_put —
    the slicing (forced tiny via SPNET_PUT_CHUNK_BYTES) covers the >7 GB
    transfer wall found by the round-4 big-run bisect, including an
    uneven tail slice and non-float dtypes."""
    from spnet_tpu.parallel.mesh import chunked_device_put

    monkeypatch.setenv("SPNET_PUT_CHUNK_BYTES", "4096")
    rng = np.random.default_rng(7)
    for arr in (
        rng.integers(0, 255, (37, 17, 13, 1)).astype(np.uint8),  # odd tail
        rng.normal(size=(64, 72)).astype(np.float32),
        rng.normal(size=(3,)).astype(np.float32),  # below one chunk
    ):
        out = chunked_device_put(arr)
        np.testing.assert_array_equal(np.asarray(out), arr)

    # sharded path (delegates to plain put, one transfer per device)
    mesh = make_mesh()
    arr = rng.normal(size=(32, 9)).astype(np.float32)
    out = chunked_device_put(arr, sharding=batch_sharding(mesh))
    np.testing.assert_array_equal(np.asarray(out), arr)
    assert len(out.sharding.device_set) == mesh.size
