"""keras_adam: exact-update pin against tf.keras's Adam.

The reference's optimizer is tf.keras Adam (`models.py:494-502`,
eps=K.epsilon()=1e-7).  train/optim.keras_adam reproduces its update
rule (eps on UNcorrected sqrt(v), bias correction folded into lr_t);
these tests pin it against the real tf.keras implementation on random
parameter trees, and against the analytic formula without TF.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spnet_tpu.train.optim import keras_adam


def _run_keras_adam_jax(params, grads_seq, lr, eps):
    tx = keras_adam(lr, eps=eps)
    opt_state = tx.init(params)
    apply = jax.jit(lambda g, s, p: tx.update(g, s, p))
    out = [params]
    for g in grads_seq:
        updates, opt_state = apply(g, opt_state, out[-1])
        out.append(jax.tree_util.tree_map(lambda p, u: p + u,
                                          out[-1], updates))
    return out[1:]


def test_keras_adam_matches_analytic_formula():
    """Pure-numpy transcription of keras/optimizer_v2/adam.py's
    _resource_apply_dense (no TF needed)."""
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(5, 3)).astype(np.float32)
    grads = [rng.normal(size=(5, 3)).astype(np.float32) for _ in range(7)]
    lr, b1, b2, eps = 1e-3, 0.9, 0.999, 1e-7

    p = p0.copy()
    m = np.zeros_like(p)
    v = np.zeros_like(p)
    expect = []
    for t, g in enumerate(grads, start=1):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        lr_t = lr * np.sqrt(1 - b2**t) / (1 - b1**t)
        p = p - lr_t * m / (np.sqrt(v) + eps)
        expect.append(p.copy())

    got = _run_keras_adam_jax({"w": jnp.asarray(p0)},
                              [{"w": jnp.asarray(g)} for g in grads],
                              lr, eps)
    for e, o in zip(expect, got):
        np.testing.assert_allclose(np.asarray(o["w"]), e, rtol=2e-6,
                                   atol=2e-7)


def test_keras_adam_schedule_indexing():
    """A callable learning rate is evaluated at the PRE-update step
    index (0 for the first update), matching optax's convention so the
    1-cycle LUT lines up identically across variants."""
    seen = []

    def sched(step):
        seen.append(int(step))
        return 1e-3

    tx = keras_adam(sched)
    params = {"w": jnp.ones((2,))}
    s = tx.init(params)
    for _ in range(3):
        updates, s = tx.update({"w": jnp.ones((2,))}, s, params)
    assert seen[:3] == [0, 1, 2]


@pytest.mark.slow
def test_keras_adam_matches_tf_keras():
    tf = pytest.importorskip("tensorflow")
    tf.config.set_visible_devices([], "GPU")

    rng = np.random.default_rng(1)
    shapes = [(4, 4), (7,), (2, 3, 2)]
    p0 = [rng.normal(size=s).astype(np.float32) for s in shapes]
    steps = 6
    grads = [[rng.normal(size=s).astype(np.float32) for s in shapes]
             for _ in range(steps)]
    lr, eps = 4e-5, 1e-7

    tf_vars = [tf.Variable(p) for p in p0]
    opt = tf.keras.optimizers.Adam(learning_rate=lr, epsilon=eps)
    tf_traj = []
    for g in grads:
        opt.apply_gradients(zip([tf.constant(x) for x in g], tf_vars))
        tf_traj.append([v.numpy() for v in tf_vars])

    params = {f"p{i}": jnp.asarray(p) for i, p in enumerate(p0)}
    gseq = [{f"p{i}": jnp.asarray(x) for i, x in enumerate(g)}
            for g in grads]
    jx_traj = _run_keras_adam_jax(params, gseq, lr, eps)

    for t in range(steps):
        for i in range(len(shapes)):
            np.testing.assert_allclose(
                np.asarray(jx_traj[t][f"p{i}"]), tf_traj[t][i],
                rtol=1e-5, atol=1e-7,
                err_msg=f"step {t + 1} tensor {i}")


def test_make_optimizer_variant_plumbing():
    """SPNET_ADAM / adam_variant selects the keras update; the state
    tree is checkpoint-compatible in leaf count with optax.adam."""
    from spnet_tpu.train.optim import KerasAdamState
    from spnet_tpu.train.state import make_optimizer

    params = {"w": jnp.ones((3, 3)), "b": jnp.zeros((3,))}
    tx = make_optimizer(lambda s: 1e-3, params, [], 0.0,
                        adam_variant="keras")
    s = tx.init(params)
    assert isinstance(s, KerasAdamState)
    upd, _ = tx.update(params, s, params)
    assert all(np.all(np.isfinite(u))
               for u in jax.tree_util.tree_leaves(upd))
