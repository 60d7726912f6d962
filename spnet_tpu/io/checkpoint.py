"""Checkpoint / resume via Orbax.

Replaces the reference's HDF5 weight files + whole-model .h5
(`/root/reference/spnet/callbacks.py:20-41`, `models.py:474-485`,
`train_spnet.py:145-150`) with Orbax checkpoints that bundle:

  * model params + batch_stats + global step
  * the full ExperimentConfig JSON — including the GridSpec whose
    means/ranges the reference kept as hidden module globals (a
    resume/predict hazard there; explicit artifact here).

Semantics preserved: `restore_if_exists` auto-resumes when a checkpoint
directory is present, else starts fresh; `no_cp_fatal` (inference paths)
raises when nothing can be loaded.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from spnet_tpu.config import ExperimentConfig

CONFIG_FILENAME = "experiment.json"


def save_checkpoint(ckpt_dir: str, state, config: ExperimentConfig,
                    step: int | None = None) -> str:
    """Write params/batch_stats/step (+ config JSON) under ckpt_dir."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {
        "params": jax.tree_util.tree_map(np.asarray, state.params),
        "batch_stats": jax.tree_util.tree_map(np.asarray,
                                              state.batch_stats),
        "step": np.asarray(state.step),
    }
    # Optimizer state travels too (flattened: optax namedtuple trees
    # don't round-trip a target-less Orbax restore).  Resuming with
    # fresh Adam moments mid-anneal measurably destabilizes training —
    # an f32 Dataset-A run resumed at epoch 81/100 fell from 94.8 % to
    # 84.1 % ring-acc over the weights-only-resumed tail.  (The
    # reference's resume is weights-only: `models.py:474-485`.)
    opt_state = getattr(state, "opt_state", None)
    if opt_state is not None:
        leaves = jax.tree_util.tree_leaves(opt_state)
        payload["opt_state_leaves"] = {
            f"{i:04d}": np.asarray(leaf) for i, leaf in enumerate(leaves)
        }
    path = os.path.join(ckpt_dir, "state")
    ckptr = ocp.StandardCheckpointer()
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, payload)
    ckptr.wait_until_finished()
    with open(os.path.join(ckpt_dir, CONFIG_FILENAME), "w") as f:
        f.write(config.to_json())
    return path


def load_checkpoint(ckpt_dir: str) -> tuple[dict, ExperimentConfig]:
    """Load payload + config; raises FileNotFoundError if absent."""
    path = os.path.join(os.path.abspath(ckpt_dir), "state")
    cfg_path = os.path.join(ckpt_dir, CONFIG_FILENAME)
    if not os.path.exists(path):
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(path)
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            config = ExperimentConfig.from_json(f.read())
    else:
        config = ExperimentConfig()
    return payload, config


def restore_if_exists(ckpt_dir: str, state, no_cp_fatal: bool = False):
    """Auto-resume semantics (reference `setup_model`,
    `models.py:474-485`): load weights into `state` when a checkpoint
    exists; otherwise return `state` unchanged (or raise when
    no_cp_fatal)."""
    try:
        payload, _ = load_checkpoint(ckpt_dir)
    except FileNotFoundError:
        if no_cp_fatal:
            raise
        print(f"    No checkpoint in {ckpt_dir}; starting from scratch.")
        return state
    print(f"    Checkpoint detected in {ckpt_dir}; resuming.")
    import jax.numpy as jnp

    new = state.replace(
        params=payload["params"],
        batch_stats=payload["batch_stats"],
        step=jnp.asarray(payload["step"]),
    )
    saved = payload.get("opt_state_leaves")
    opt_state = getattr(state, "opt_state", None)
    if saved is not None and opt_state is not None:
        # numeric key sort (lexicographic would mis-order past %04d);
        # then verify per-leaf shape AND dtype against the template
        # optimizer — a same-leaf-count different optimizer (or a
        # changed param tree) must fall back to weights-only, not load
        # moments into the wrong slots.
        leaves = [saved[k] for k in sorted(saved, key=int)]
        template = jax.tree_util.tree_leaves(opt_state)
        treedef = jax.tree_util.tree_structure(opt_state)
        compatible = len(template) == len(leaves) and all(
            np.shape(s) == np.shape(t)
            and np.asarray(s).dtype == np.asarray(t).dtype
            for s, t in zip(leaves, template)
        )
        if compatible:
            new = new.replace(
                opt_state=jax.tree_util.tree_unflatten(treedef, leaves)
            )
        else:
            # structure changed (e.g. freeze phase boundary): weights-only
            print("    (optimizer state in checkpoint does not match the "
                  "current optimizer; resuming weights-only)")
    return new
