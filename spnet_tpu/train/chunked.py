"""Chunked device-resident training for datasets larger than HBM.

The resident fast path (train/loop.py) keeps the WHOLE training set in
device HBM and runs each epoch as one lax.scan program.  When the set
does not fit (the reference's 50k-frame Dataset-A workflow at scales it
never reached), this module streams fixed-size HBM shards instead:

  host dataset -> [chunk k on device | chunk k+1 transferring] -> scan(k)

Each epoch visits the chunks in a (seeded) random order and shuffles
WITHIN each chunk; the next chunk's host->device transfer is issued
before the current chunk's epoch-scan runs, so the copy rides under the
compute (jax transfers are async).  All chunks share one scan shape, so
the program compiles once.  Chunk buffers are explicitly deleted after
use to bound HBM at ~3 chunks (current + next + the scan's permuted
batch copy).

No reference counterpart: the reference feeds Keras fit() from host RAM
(`/root/reference/spnet/utils.py:352-423` loads everything into a shared
array) and simply cannot exceed host memory either.
"""

from __future__ import annotations

import numpy as np


def plan_chunks(n_items: int, item_bytes: int, batch_size: int,
                budget_bytes: int) -> tuple[int, int]:
    """Pick (chunk_len, n_chunks) so that ~3 in-flight chunks fit the
    budget.  chunk_len is a multiple of batch_size; the dataset tail
    that doesn't fill a whole chunk is still used (last chunk may be
    shorter, but to keep ONE compiled scan program we truncate to whole
    chunks — callers should size datasets to multiples when possible)."""
    per_chunk_budget = max(budget_bytes // 3, batch_size * item_bytes)
    chunk_len = max(per_chunk_budget // max(item_bytes, 1), batch_size)
    chunk_len = (chunk_len // batch_size) * batch_size
    chunk_len = min(chunk_len, (n_items // batch_size) * batch_size)
    n_chunks = n_items // chunk_len
    return int(chunk_len), int(n_chunks)


class ChunkStreamer:
    """Streams equal-length chunks of (x, y[, rows, mask]) to the device
    with one-chunk-ahead prefetch."""

    def __init__(self, arrays: tuple, chunk_len: int, n_chunks: int,
                 put=None):
        import jax

        self.arrays = arrays
        self.chunk_len = chunk_len
        self.n_chunks = n_chunks
        self.put = put or jax.device_put

    def _put(self, ci: int):
        s = slice(ci * self.chunk_len, (ci + 1) * self.chunk_len)
        return tuple(self.put(a[s]) for a in self.arrays)

    def epoch(self, order: np.ndarray):
        """Yield (chunk_index, device_arrays) following `order`, with the
        next chunk's transfer issued before yielding the current one."""
        pending = self._put(int(order[0]))
        for k, ci in enumerate(order):
            cur = pending
            if k + 1 < len(order):
                pending = self._put(int(order[k + 1]))
            yield int(ci), cur
            for buf in cur:  # free HBM before the next iteration
                try:
                    buf.delete()
                except Exception:
                    pass


def run_chunked_epoch(train_step, state, streamer: ChunkStreamer,
                      batch_size: int, rng_key, epoch: int, seed: int,
                      geo: bool = False):
    """One full epoch over all chunks; returns (state, mean_loss, n_batches).

    train_step is the indexed='epoch' program; per chunk it receives a
    within-chunk permutation (steps, batch) index matrix."""
    import jax
    import jax.numpy as jnp

    ep_rng = np.random.default_rng(seed + epoch)
    order = ep_rng.permutation(streamer.n_chunks)
    steps = streamer.chunk_len // batch_size
    losses = []
    for ci, bufs in streamer.epoch(order):
        perm = ep_rng.permutation(streamer.chunk_len)[
            : steps * batch_size].astype(np.int32)
        idx_mat = jnp.asarray(perm.reshape(steps, batch_size))
        step_key = jax.random.fold_in(rng_key,
                                      epoch * streamer.n_chunks + ci)
        if geo:
            x, y, rows, mask = bufs
            state, ls = train_step(state, x, y, rows, mask, idx_mat,
                                   step_key)
        else:
            x, y = bufs
            state, ls = train_step(state, x, y, idx_mat, step_key)
        losses.append(ls)
    mean_loss = float(jnp.mean(jnp.stack(losses)))
    return state, mean_loss, steps * streamer.n_chunks
