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


# Single host->device transfers above ~7 GB crash this environment's TPU
# worker (round-4 bisect: the 6.04 GB 384-run put is fine, the 8.05 GB
# native-resolution put kills the worker before the first epoch ever
# runs — /tmp/r4_bigdebug, scripts/debug_big.sh).  2 GiB slices stay far
# below the wall; the device-side concatenate costs one HBM->HBM copy.
PUT_CHUNK_BYTES_DEFAULT = 2 * 1024**3


def chunked_device_put(a, sharding=None, chunk_bytes: int | None = None):
    """device_put `a` in leading-axis slices of <= chunk_bytes, filling a
    preallocated device buffer via DONATED dynamic_update_slice calls —
    peak HBM = full array + one slice (a device-side concatenate would
    peak at 2x the array, which is exactly what the 8 GB case can't
    afford).

    With a `sharding` the array is delegated to a plain device_put: each
    device then receives only its own 1/N shard, which is already below
    the wall (and update-slice writes at arbitrary offsets into a
    batch-sharded buffer would reshard).  SPNET_PUT_CHUNK_BYTES overrides
    the slice size (tests use a tiny value to exercise the path on small
    arrays)."""
    import os

    import jax.numpy as jnp

    if chunk_bytes is None:
        chunk_bytes = int(os.environ.get("SPNET_PUT_CHUNK_BYTES",
                                         PUT_CHUNK_BYTES_DEFAULT))
    if sharding is not None:
        return jax.device_put(a, sharding)
    a = np.asarray(a)
    if a.nbytes <= chunk_bytes or a.ndim == 0 or a.shape[0] <= 1:
        return jax.device_put(a)
    item = max(a.nbytes // a.shape[0], 1)
    n = max(int(chunk_bytes // item), 1)

    upd = jax.jit(
        lambda buf, part, i: jax.lax.dynamic_update_slice_in_dim(
            buf, part, i, axis=0),
        donate_argnums=(0,),
    )
    buf = jnp.zeros(a.shape, a.dtype)
    for i in range(0, a.shape[0], n):
        buf = upd(buf, jnp.asarray(a[i : i + n]), i)
    return buf
