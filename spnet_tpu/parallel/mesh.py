"""Device mesh + sharding helpers.

Replaces the reference's tower data-parallelism
(`/root/reference/spnet/multi_gpu.py`: per-GPU batch slices under
tf.device, outputs concatenated on the CPU) with the TPU-native SPMD
recipe: one `jax.sharding.Mesh` with a 'data' axis, batch arrays sharded
along it, params/stats replicated.  Under `jax.jit` XLA then partitions
the step and inserts the gradient all-reduce (psum) over ICI — there is
no hand-written communication anywhere.

The mesh generalizes to multi-host/multi-slice by building it from
`jax.devices()`; model-parallel axes are unnecessary at SPNet scale
(<100M params — SURVEY.md §2 parallelism table).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Device-put arrays with the batch dim sharded over the mesh."""
    s = batch_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out[0] if len(out) == 1 else out


def replicate_state(mesh: Mesh, tree):
    """Replicate a pytree (params / train state arrays) over the mesh."""
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), tree)
