"""Parallel input pipeline: worker-threaded batch loading + device prefetch.

TPU-native replacement for the reference's multi-worker torch DataLoader
(`/root/reference/main.py:225-242`, ``num_workers``/``worker_init_fn``):

* ``ParallelBatchLoader`` — assembles batches in a thread pool while the
  accelerator computes.  Threads (not processes) because the hot per-sample
  work — the C++ transforms in ``data/native.py`` (ctypes releases the GIL)
  and numpy resize/crop — runs outside the GIL; there is no pickling tax
  and workers share the dataset cache.
* ``device_prefetch`` — keeps ``size`` batches resident on device (sharded
  over the mesh 'data' axis when given) so the train step never waits on a
  host→device DMA; the JAX equivalent of Lightning's implicit CUDA-stream
  overlap.

Determinism: batches are yielded strictly in submission order, the
shuffle order depends only on ``seed``/epoch, and per-sample augmentation
RNG is derived from ``(dataset.seed, epoch, idx)`` (``SemanticDataset.
sample``), so a run reproduces exactly regardless of worker count or how
threads interleave (matching the reference's ``worker_init_fn`` seeding
contract, `main.py:156-183`).
"""

from __future__ import annotations

import collections
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, Optional

import jax
import numpy as np


def _assemble(dataset, idxs, tokenizer, epoch=0) -> Dict[str, Any]:
    # Datasets with a ``sample(idx, salt)`` method get per-sample seeded
    # augmentation RNG (salt = epoch): reproducible regardless of how the
    # thread pool interleaves __getitem__ calls.
    if hasattr(dataset, "sample"):
        items = [dataset.sample(int(i), epoch) for i in idxs]
    else:
        items = [dataset[int(i)] for i in idxs]
    batch: Dict[str, Any] = {
        "image": np.stack([it["image"] for it in items]).astype(np.float32),
        "parts": np.stack([it["parts"] for it in items]),
    }
    if "rgb" in items[0]:
        batch["rgb"] = np.stack(
            [it["rgb"] for it in items]).astype(np.float32)
    captions = [it["caption"] for it in items]
    if tokenizer is not None:
        batch["input_ids"] = np.asarray(tokenizer(captions))
    batch["captions"] = captions
    return batch


class ParallelBatchLoader:
    """Iterable over batches, assembled by ``num_workers`` threads with up
    to ``prefetch_batches`` batches in flight ahead of the consumer."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        tokenizer=None,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        epochs: Optional[int] = None,
        num_workers: int = 8,
        prefetch_batches: int = 4,
        process_index: int = 0,
        process_count: int = 1,
    ):
        """``batch_size`` is GLOBAL; on a multi-host cluster each process
        assembles only its contiguous ``batch_size/process_count`` slice of
        every batch (the rows its addressable devices own under a 'data'
        sharding), from a shuffle order derived purely from ``seed``/epoch —
        identical on every host, no coordination needed."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.tokenizer = tokenizer
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epochs = epochs
        self.num_workers = max(1, num_workers)
        self.prefetch_batches = max(1, prefetch_batches)
        if batch_size % process_count:
            raise ValueError(
                f"global batch {batch_size} must divide over "
                f"{process_count} processes")
        if not 0 <= process_index < process_count:
            raise ValueError(f"process_index {process_index} outside "
                             f"[0, {process_count})")
        self.process_index = process_index
        self.process_count = process_count

    def _index_batches(self):
        rng = np.random.default_rng(self.seed)
        epoch = 0
        n = len(self.dataset)
        local_bs = self.batch_size // self.process_count
        lo = self.process_index * local_bs
        while self.epochs is None or epoch < self.epochs:
            order = np.arange(n)
            if self.shuffle:
                rng.shuffle(order)
            for start in range(0, n, self.batch_size):
                idxs = order[start:start + self.batch_size]
                if len(idxs) < self.batch_size:
                    if self.drop_last:
                        break
                    if self.process_count > 1:
                        # a ragged tail can't split evenly across hosts
                        break
                yield epoch, idxs[lo:lo + local_bs]
            epoch += 1

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        pending: collections.deque = collections.deque()
        with ThreadPoolExecutor(self.num_workers) as pool:
            it = self._index_batches()
            try:
                for epoch, idxs in it:
                    pending.append(
                        pool.submit(_assemble, self.dataset, idxs,
                                    self.tokenizer, epoch))
                    if len(pending) >= self.prefetch_batches:
                        yield pending.popleft().result()
                while pending:
                    yield pending.popleft().result()
            finally:
                for f in pending:
                    f.cancel()


def device_prefetch(iterator, mesh=None, size: int = 2,
                    keys=("image", "input_ids", "rgb", "latent", "parts")):
    """Keep ``size`` batches on device ahead of the consumer.

    Array leaves under ``keys`` are ``device_put`` (sharded over the mesh
    'data' axis when ``mesh`` is given); other entries (captions) pass
    through on host.  The device transfer for batch N+size overlaps the
    compute on batch N — jax dispatch is async, so ``device_put`` returns
    immediately and the DMA streams in the background.
    """
    sharding = None
    multihost = jax.process_count() > 1
    if mesh is not None:
        from fgdm_tpu.parallel.mesh import data_sharding

        sharding = data_sharding(mesh)

    def put_one(x):
        if sharding is None:
            return jax.device_put(x)
        if multihost:
            # x is this host's contiguous batch slice; assemble the global
            # array from every host's local shards (no cross-host copy)
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    def put(batch):
        out = dict(batch)
        for k in keys:
            if k in out and hasattr(out[k], "shape"):
                out[k] = put_one(out[k])
        return out

    buf: collections.deque = collections.deque()
    for batch in iterator:
        buf.append(put(batch))
        if len(buf) > size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
