"""Training machinery tests: 1-cycle schedule parity with the reference
LUT, freeze masks, a few steps of actual optimization (loss decreases),
and data-parallel execution on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spnet_tpu.config import GridSpec, LossWeights
from spnet_tpu.grid import normalize
from spnet_tpu.models.spnet import SPNet
from spnet_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
from spnet_tpu.train.schedule import onecycle_lut, onecycle_schedule
from spnet_tpu.train.state import (
    backbone_freeze_labels,
    create_train_state,
    unfreeze,
)
from spnet_tpu.train.steps import make_eval_step, make_train_step


def test_onecycle_matches_reference_lut():
    lut = onecycle_lut(4e-5, n_data_points=800, epochs=10, batch_size=16)
    sched = onecycle_schedule(4e-5, total_steps=len(lut))
    got = np.array([float(sched(i)) for i in range(len(lut))])
    np.testing.assert_allclose(got, lut, rtol=2e-3)
    # beyond the schedule: holds the final value
    assert float(sched(len(lut) + 100)) == pytest.approx(lut[-1] * 0 +
                                                         4e-5 / 25 / 1e4,
                                                         rel=1e-5)


def _tiny_setup(freeze_fac=0.0, augment=False):
    model = SPNet(num_outputs=576, backbone="MobileNetTiny",
                  dtype=jnp.float32)
    sched = onecycle_schedule(1e-3, total_steps=100)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((2, 64, 64, 1)), sched,
        freeze_fac=freeze_fac,
    )
    step = make_train_step(model, LossWeights(), "same", l2_reg=1e-4,
                           augment=augment)
    return model, state, step


def _tiny_batch(b=4):
    g = GridSpec()
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (b, 64, 64, 1)).astype(np.float32)
    yt = np.tile(g.defaults.reshape(-1), (b, 1))
    y = normalize(yt, g).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


@pytest.mark.slow
def test_loss_decreases():
    model, state, step = _tiny_setup()
    x, y = _tiny_batch()
    losses = []
    for i in range(30):
        state, m = step(state, x, y, jax.random.key(i))
        losses.append(float(m["data_loss"]))
    assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]
    assert int(state.step) == 30


def test_freeze_labels_and_unfreeze():
    model, state, step = _tiny_setup(freeze_fac=0.5)
    labels = backbone_freeze_labels(
        state.params, model.backbone_layer_order(), 0.5
    )
    flat = jax.tree_util.tree_leaves_with_path(labels)
    frozen_blocks = {
        p[1].key for p, v in flat
        if v == "frozen" and p[0].key == "backbone"
    }
    # 14 backbone blocks * 0.5 -> first 7 frozen
    assert frozen_blocks == {"conv1"} | {f"block{i}" for i in range(1, 7)}
    # stem and head never frozen
    assert all(
        v == "train" for p, v in flat if p[0].key in ("stem", "final_output")
    )

    x, y = _tiny_batch(2)
    # snapshot to host: the train step donates the state buffers
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    state, _ = step(state, x, y, jax.random.key(0))
    # frozen leaves unchanged, trainable leaves changed
    def diff(a, b):
        return float(jnp.abs(a - b).max())

    assert diff(state.params["backbone"]["conv1"]["conv"]["kernel"],
                p0["backbone"]["conv1"]["conv"]["kernel"]) == 0.0
    assert diff(state.params["final_output"]["kernel"],
                p0["final_output"]["kernel"]) > 0.0

    p1 = jax.tree_util.tree_map(np.asarray, state.params)
    step_before = int(state.step)
    state2 = unfreeze(state, model)
    state2, _ = step(state2, x, y, jax.random.key(1))
    assert diff(state2.params["backbone"]["conv1"]["conv"]["kernel"],
                p1["backbone"]["conv1"]["conv"]["kernel"]) > 0.0
    # step counter carried across the phase switch
    assert int(state2.step) == step_before + 1


def test_data_parallel_step_matches_single_device():
    """The same batch must produce the same results whether it is
    replicated on one device or sharded over the 8-device mesh.  The eval
    path (frozen batch stats) must agree tightly; the train step involves
    cross-device batch-norm reductions whose float32 reassociation shifts
    the loss slightly, so it gets a looser bound."""
    model, state, step = _tiny_setup()
    x, y = _tiny_batch(8)
    ev = make_eval_step(model, LossWeights(), "same")
    out1, comp1 = ev(state, x, y)
    out1 = np.asarray(out1)

    mesh = make_mesh()
    assert mesh.size == 8
    state_r = replicate_state(mesh, state)
    xs, ysh = shard_batch(mesh, x, y)
    out2, comp2 = ev(state_r, xs, ysh)
    np.testing.assert_allclose(np.asarray(out2), out1, rtol=1e-4,
                               atol=1e-5)
    assert float(comp2["total"]) == pytest.approx(float(comp1["total"]),
                                                  rel=1e-4)

    # train step: executes correctly under sharding, loss close
    s1, m1 = step(state, x, y, jax.random.key(0))
    model2, state2, step2 = _tiny_setup()
    state2 = replicate_state(mesh, state2)
    s2, m2 = step2(state2, xs, ysh, jax.random.key(0))
    assert float(m2["loss"]) == pytest.approx(float(m1["loss"]), rel=2e-2)


def test_augment_in_train_step_runs():
    model, state, step = _tiny_setup(augment=True)
    x, y = _tiny_batch(2)
    state, m = step(state, x, y, jax.random.key(0))
    assert np.isfinite(float(m["loss"]))


def test_epoch_scan_carried_compute_params_matches_per_use_cast():
    """The epoch program can carry a compute-dtype copy of the params
    across scan steps (train/steps.py `carry_compute_params`) so the
    per-step per-kernel f32->bf16 convert ops disappear.  The carried
    copy is numerically the SAME thing the per-use casts produced, so
    the two programs must track each other closely; with f32 compute
    the carry is a no-op and must match exactly."""
    model = SPNet(num_outputs=576, backbone="MobileNetTiny",
                  dtype=jnp.bfloat16)
    sched = onecycle_schedule(1e-3, total_steps=100)

    def run(carry, steps):
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((2, 64, 64, 1)), sched)
        step = make_train_step(model, LossWeights(), "same",
                               l2_reg=1e-4, augment=False,
                               indexed="epoch", carry_compute_params=carry)
        g = GridSpec()
        rng = np.random.default_rng(0)
        n, b = 8, 2
        x_all = jnp.asarray(
            rng.integers(0, 256, (n, 64, 64, 1)).astype(np.uint8))
        y_all = jnp.asarray(normalize(
            np.tile(g.defaults.reshape(-1), (n, 1)), g).astype(np.float32))
        idx = jnp.asarray(
            rng.integers(0, n, (steps, b)).astype(np.int32))
        state, losses = step(state, x_all, y_all, idx, jax.random.key(1))
        return np.asarray(losses), jax.tree_util.tree_map(
            np.asarray, state.params)

    # one step: identical math (the carried copy IS what the per-use
    # casts produced; L2 reads the f32 masters in both paths), so the
    # loss must match to f32 noise and the updated masters must agree
    # to reassociation-level tolerance
    base_losses, base_params = run(None, 1)
    carried_losses, carried_params = run("bfloat16", 1)
    np.testing.assert_allclose(carried_losses, base_losses, rtol=1e-5)
    # Adam normalizes by sqrt(v): low-bit grad reassociation noise can
    # reach ~lr/10 on individual elements — bound by a fraction of lr
    # (1e-3 here), not by relative error
    for a, b in zip(jax.tree_util.tree_leaves(base_params),
                    jax.tree_util.tree_leaves(carried_params)):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=2e-4)

    # several chained steps: the two compiled programs place converts
    # differently, so low-bit f32 reassociation differences get
    # amplified by bf16 forward rounding — the trajectories must stay
    # finite and track loosely
    base_losses, _ = run(None, 4)
    carried_losses, _ = run("bfloat16", 4)
    assert np.all(np.isfinite(carried_losses))
    np.testing.assert_allclose(carried_losses, base_losses, rtol=5e-2)

    # f32 compute: carry must be a structural no-op (exact match)
    model_f32 = SPNet(num_outputs=576, backbone="MobileNetTiny",
                      dtype=jnp.float32)

    def run_f32(carry):
        state = create_train_state(
            model_f32, jax.random.key(0), jnp.zeros((2, 64, 64, 1)),
            sched)
        step = make_train_step(model_f32, LossWeights(), "same",
                               l2_reg=1e-4, augment=False,
                               indexed="epoch", carry_compute_params=carry)
        g = GridSpec()
        rng = np.random.default_rng(0)
        x_all = jnp.asarray(
            rng.integers(0, 256, (8, 64, 64, 1)).astype(np.uint8))
        y_all = jnp.asarray(normalize(
            np.tile(g.defaults.reshape(-1), (8, 1)), g).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 8, (4, 2)).astype(np.int32))
        _, losses = step(state, x_all, y_all, idx, jax.random.key(1))
        return np.asarray(losses)

    np.testing.assert_array_equal(run_f32("float32"), run_f32(None))


def test_epoch_scan_no_pregather_matches_pregather():
    """pregather=False (the big-input path: in-scan minibatch gathers
    from the resident dataset instead of a permuted epoch copy —
    train/steps.py) consumes the SAME minibatches in the same order, so
    with f32 compute the whole trajectory must match exactly."""
    model = SPNet(num_outputs=576, backbone="MobileNetTiny",
                  dtype=jnp.float32)
    sched = onecycle_schedule(1e-3, total_steps=100)
    g = GridSpec()
    rng = np.random.default_rng(0)
    n, b, steps = 8, 2, 4
    x_all = jnp.asarray(
        rng.integers(0, 256, (n, 64, 64, 1)).astype(np.uint8))
    y_all = jnp.asarray(normalize(
        np.tile(g.defaults.reshape(-1), (n, 1)), g).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, (steps, b)).astype(np.int32))

    def run(pregather):
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((b, 64, 64, 1)), sched)
        step = make_train_step(model, LossWeights(), "same",
                               l2_reg=1e-4, augment=True,
                               indexed="epoch", pregather=pregather)
        state, losses = step(state, x_all, y_all, idx, jax.random.key(1))
        return np.asarray(losses), jax.tree_util.tree_map(
            np.asarray, state.params)

    losses_pg, params_pg = run(True)
    losses_ng, params_ng = run(False)
    np.testing.assert_allclose(losses_ng, losses_pg, rtol=1e-6)
    for a, c in zip(jax.tree_util.tree_leaves(params_pg),
                    jax.tree_util.tree_leaves(params_ng)):
        np.testing.assert_allclose(a, c, rtol=1e-5, atol=1e-7)


def test_epoch_scan_unroll_matches_rolled(monkeypatch):
    """SPNET_SCAN_UNROLL=k replicates the scan body k times per loop
    iteration (a cross-step scheduling window for XLA; train/steps.py).
    The math is unchanged — only fusion/scheduling differ, so with f32
    compute the trajectory must match the rolled scan to reassociation
    ULPs, including a steps count that does not divide k (lax.scan
    handles the remainder)."""
    model = SPNet(num_outputs=576, backbone="MobileNetTiny",
                  dtype=jnp.float32)
    sched = onecycle_schedule(1e-3, total_steps=100)
    g = GridSpec()
    rng = np.random.default_rng(0)
    n, b, steps = 8, 2, 5
    x_all = jnp.asarray(
        rng.integers(0, 256, (n, 64, 64, 1)).astype(np.uint8))
    y_all = jnp.asarray(normalize(
        np.tile(g.defaults.reshape(-1), (n, 1)), g).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, (steps, b)).astype(np.int32))

    def run(unroll):
        monkeypatch.setenv("SPNET_SCAN_UNROLL", str(unroll))
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((b, 64, 64, 1)), sched)
        step = make_train_step(model, LossWeights(), "same",
                               l2_reg=1e-4, augment=True,
                               indexed="epoch")
        state, losses = step(state, x_all, y_all, idx, jax.random.key(1))
        return np.asarray(losses), jax.tree_util.tree_map(
            np.asarray, state.params)

    losses_1, params_1 = run(1)
    losses_2, params_2 = run(2)
    np.testing.assert_allclose(losses_2, losses_1, rtol=1e-6)
    for a, c in zip(jax.tree_util.tree_leaves(params_1),
                    jax.tree_util.tree_leaves(params_2)):
        np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-8)


def test_epoch_scan_split_matches_monolithic():
    """SPNET_MAX_SCAN_STEPS splits an epoch into chained shorter
    programs (loop.py) — the traced step_offset keeps the per-step rng
    folds global, so k programs of nb/k steps must reproduce the
    monolithic nb-step program to f32 reassociation ULPs (the carry
    crosses a program boundary, so schedules may differ; the rng
    stream and the math are identical).
    This is the workaround for the environment's long-program worker
    crashes (probe_bigprog; the 3,360-step dataset-D geo program)."""
    model = SPNet(num_outputs=576, backbone="MobileNetTiny",
                  dtype=jnp.float32)
    sched = onecycle_schedule(1e-3, total_steps=100)
    g = GridSpec()
    rng = np.random.default_rng(2)
    n, b, steps = 8, 2, 6
    x_all = jnp.asarray(
        rng.integers(0, 256, (n, 64, 64, 1)).astype(np.uint8))
    y_all = jnp.asarray(normalize(
        np.tile(g.defaults.reshape(-1), (n, 1)), g).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, (steps, b)).astype(np.int32))
    step = make_train_step(model, LossWeights(), "same",
                           l2_reg=1e-4, augment=True, indexed="epoch")

    def fresh():
        return create_train_state(
            model, jax.random.key(0), jnp.zeros((b, 64, 64, 1)), sched)

    ep_rng = jax.random.key(7)
    state_m, losses_m = step(fresh(), x_all, y_all, idx, ep_rng)

    state_s = fresh()
    parts = []
    for s0 in (0, 3):
        state_s, part = step(state_s, x_all, y_all, idx[s0:s0 + 3],
                             ep_rng, jnp.int32(s0))
        parts.append(np.asarray(part))
    # losses are the rng-equivalence check: a wrong step_offset would
    # change the augmentation stream and move losses at the 1e-3 level;
    # reassociation across the program boundary only moves them ULPs
    np.testing.assert_allclose(np.concatenate(parts),
                               np.asarray(losses_m), rtol=2e-5)
    # params: Adam normalizes by sqrt(v)~0 at early steps, amplifying
    # ULP-level gradient noise into %-level update drift (same f32 sign
    # noise the round-4 keras differential documented) — assert the
    # update MAGNITUDE agrees, not each entry
    # (a wrong rng stream would move most entries by ~lr=1e-3; the
    # observed chaotic drift tops out near 1e-4 on isolated entries)
    for a, c in zip(jax.tree_util.tree_leaves(state_m.params),
                    jax.tree_util.tree_leaves(state_s.params)):
        a, c = np.asarray(a), np.asarray(c)
        np.testing.assert_allclose(a, c, rtol=0.5, atol=3e-4)
