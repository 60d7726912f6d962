"""Multi-host (multi-process / DCN) readiness.

The reference's data-parallelism was single-host only
(`/root/reference/spnet/multi_gpu.py:35-88`: per-GPU batch slices under
tf.device inside one process).  spnet_tpu's mesh path (parallel/mesh.py)
already scales SPMD over every device jax can see; what a pod-slice run
additionally needs — and what this module provides — is the
single-controller-per-host glue:

  1. `maybe_initialize()` — gated `jax.distributed.initialize()`.  Call
     it before first jax use on EVERY process of a multi-host job; it is
     a no-op for single-host runs (no coordinator configured), so every
     CLI can call it unconditionally.
  2. `process_shard()` — (process_index, process_count) for grain-style
     per-host file lists: pass straight to `build_dataset(shard_index=,
     num_shards=)`, which computes the SAME seeded global shuffle on
     every host and takes the strided slice, so host shards are an
     exact disjoint partition (pinned in tests/test_multihost.py).
  3. `host_to_global()` — assemble the global batch-sharded jax.Array
     from each process's LOCAL shard (`jax.make_array_from_process_local
     _data`).  Under jit, XLA then inserts the gradient all-reduce over
     ICI within a host and DCN across hosts — no hand-written comms.

Topology rule (scaling-book recipe): the mesh's 'data' axis is built
over jax.devices() — all chips of all hosts — with each host feeding
only its local shard; gradients ride ICI first, crossing DCN once per
step.  SPNet-scale models (<100 M params) replicate; no model axes.
"""

from __future__ import annotations

import os

import jax

from spnet_tpu.parallel.mesh import Mesh, batch_sharding

#: Env vars that opt a process into the distributed runtime.  The
#: SPNET_* spellings override; the JAX_* ones let standard launchers
#: (e.g. one exported coordinator per pod slice) work unmodified.  On
#: real TPU pod slices jax.distributed.initialize() can discover all
#: arguments from the TPU metadata — SPNET_DIST=1 requests exactly that.
COORD_ENV = ("SPNET_COORDINATOR", "JAX_COORDINATOR_ADDRESS")


def _env(*names: str) -> str | None:
    for n in names:
        v = os.environ.get(n)
        if v:
            return v
    return None


def maybe_initialize(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_ids=None) -> bool:
    """Initialize jax's distributed runtime when configured; else no-op.

    Configuration sources, in priority order: explicit arguments, then
    SPNET_COORDINATOR/SPNET_NUM_PROCESSES/SPNET_PROCESS_ID (or the
    JAX_COORDINATOR_ADDRESS spelling), then SPNET_DIST=1 for TPU-pod
    auto-discovery (all args None — jax fills them from the TPU
    metadata server).  Idempotent: a second call (or an already
    initialized runtime) returns True without re-initializing.  Must run
    before the backend comes up — call it first thing in main().
    """
    coordinator = coordinator or _env(*COORD_ENV)
    auto = os.environ.get("SPNET_DIST") == "1"
    if not coordinator and not auto:
        return False
    try:
        state = jax._src.distributed.global_state  # noqa: SLF001
        if getattr(state, "client", None) is not None:
            return True  # already initialized
    except Exception:
        pass
    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
        n = num_processes if num_processes is not None else _env(
            "SPNET_NUM_PROCESSES", "JAX_NUM_PROCESSES")
        i = process_id if process_id is not None else _env(
            "SPNET_PROCESS_ID", "JAX_PROCESS_ID")
        if n is not None:
            kwargs["num_processes"] = int(n)
        if i is not None:
            kwargs["process_id"] = int(i)
        if local_device_ids is not None:
            kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    return True


def process_shard() -> tuple[int, int]:
    """(shard_index, num_shards) for this process's file lists."""
    return jax.process_index(), jax.process_count()


def host_to_global(mesh: Mesh, a) -> jax.Array:
    """Per-process local batch shard -> ONE global jax.Array sharded
    over the mesh's data axis.

    Every process passes its own disjoint slice (len = global_len /
    process_count); the result behaves as the full array inside jit.
    For process_count == 1 this is exactly a sharded device_put, so the
    resident-dataset staging path can use it unconditionally under a
    multi-process runtime."""
    return jax.make_array_from_process_local_data(batch_sharding(mesh), a)


def is_multiprocess() -> bool:
    return jax.process_count() > 1
