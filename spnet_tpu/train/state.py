"""Train state + optimizer construction, including freeze/unfreeze.

The reference freezes the first `freeze_fac` fraction of backbone layers
by rebuilding and recompiling the Keras model
(`/root/reference/spnet/models.py:361-373,510-552`).  Here freezing is an
optimizer property: `optax.multi_transform` routes frozen subtrees to
`set_to_zero`, and "unfreezing" swaps the optimizer (fresh Adam moments —
same effect as the reference's recompile) while keeping params,
batch_stats and the global step (the 1-cycle schedule continues across
the phase switch, like the reference's persistent callback iteration
counter).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct


from spnet_tpu.models.spnet import SPNet


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    schedule: Callable = struct.field(pytree_node=False)


def backbone_freeze_labels(params, layer_order: list[str],
                           freeze_fac: float):
    """Label tree: 'frozen' for the first int(n*freeze_fac) backbone
    top-level blocks, 'train' elsewhere (stem + head always train)."""
    n_frozen = int(len(layer_order) * freeze_fac)
    frozen = set(layer_order[:n_frozen])

    def label(path, _leaf):
        keys = [getattr(p, "key", None) for p in path]
        if len(keys) >= 2 and keys[0] == "backbone" and keys[1] in frozen:
            return "frozen"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(
    schedule: Callable,
    params,
    layer_order: list[str],
    freeze_fac: float = 0.0,
    adam_variant: str | None = None,
) -> optax.GradientTransformation:
    # eps matches Keras's Adam default (K.epsilon() = 1e-7, the optimizer
    # the reference compiles with at models.py:494-502); optax's default
    # is 1e-8.  adam_variant="keras" additionally reproduces Keras's
    # UPDATE semantics (eps applied to uncorrected sqrt(v), bias
    # correction folded into lr_t — see train/optim.py); the two differ
    # most during warmup, when v is tiny.  SPNET_ADAM overrides for
    # queued experiment runs.
    import os

    if adam_variant is None:
        adam_variant = os.environ.get("SPNET_ADAM", "optax")
    if adam_variant == "keras":
        from spnet_tpu.train.optim import keras_adam

        adam = keras_adam(learning_rate=schedule, eps=1e-7)
    else:
        adam = optax.adam(learning_rate=schedule, eps=1e-7)
    if freeze_fac <= 0.0:
        return adam
    labels = backbone_freeze_labels(params, layer_order, freeze_fac)
    return optax.multi_transform(
        {"train": adam, "frozen": optax.set_to_zero()}, labels
    )


def create_train_state(
    model: SPNet,
    rng,
    sample_input,
    schedule: Callable,
    freeze_fac: float = 0.0,
    adam_variant: str | None = None,
) -> TrainState:
    variables = model.init({"params": rng, "dropout": rng},
                           sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(schedule, params, model.backbone_layer_order(),
                        freeze_fac, adam_variant=adam_variant)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        schedule=schedule,
    )


def unfreeze(state: TrainState, model: SPNet,
             adam_variant: str | None = None) -> TrainState:
    """Phase switch: all params trainable, fresh optimizer state, same
    weights/stats/step (reference `unfreeze_model`)."""
    tx = make_optimizer(state.schedule, state.params,
                        model.backbone_layer_order(), freeze_fac=0.0,
                        adam_variant=adam_variant)
    return state.replace(tx=tx, opt_state=tx.init(state.params))
