"""Optimizers with exact Keras update semantics.

The reference trains with tf.keras's Adam (`models.py:494-502`,
lr from the 1-cycle callback, epsilon=K.epsilon()=1e-7).  Keras's Adam
is NOT the same update as optax.adam even at equal hyperparameters:

  Keras (keras/optimizer_v2/adam.py):
      lr_t = lr * sqrt(1 - b2^t) / (1 - b1^t)
      p   -= lr_t * m_t / (sqrt(v_t) + eps)          # v_t UNcorrected

  optax.adam:
      p   -= lr * m_hat / (sqrt(v_hat) + eps)        # v_hat corrected

Rewriting Keras's update in optax's form shows the difference is the
epsilon's bias correction:  keras == optax with
eps_t = eps / sqrt(1 - b2^t) — ~31.6x larger at step 1 (b2=0.999),
decaying to eps.  Early in training, when v is tiny, this damps the
effective step size; the trajectories diverge most during the warmup
epochs.  `keras_adam` reproduces the Keras update exactly (pinned
against tf.keras in tests/test_optim.py).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax


class KerasAdamState(NamedTuple):
    count: jnp.ndarray  # int32 step counter (t-1; incremented before use)
    mu: Any
    nu: Any


def keras_adam(
    learning_rate: Union[float, Callable],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-7,
) -> optax.GradientTransformation:
    """Adam with tf.keras update semantics (see module docstring)."""

    def init_fn(params):
        zeros = lambda p: jnp.zeros_like(p)
        return KerasAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * jnp.square(g),
            state.nu, updates)
        lr = learning_rate(count - 1) if callable(learning_rate) \
            else learning_rate
        t = count.astype(jnp.float32)
        lr_t = lr * jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
        new_updates = jax.tree_util.tree_map(
            lambda m, v: -lr_t * m / (jnp.sqrt(v) + eps), mu, nu)
        return new_updates, KerasAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)
