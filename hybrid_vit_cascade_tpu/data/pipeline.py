"""Batching + device-feeding iterator.

Replaces torch DataLoader + DistributedSampler (train_direct_4gpu.py:218-219):
per-host sharding is a plain slice by jax.process_index(); per-device layout
comes from placing each batch with a NamedSharding over the mesh's data axis.
Background-thread prefetch keeps the host IO (nibabel/PIL) off the step path.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import jax
import numpy as np


def shard_batch(batch: Dict[str, np.ndarray], sharding=None) -> Dict:
    """Device-put a host batch; with a NamedSharding, lay the batch axis out
    over the mesh's data axis (the XLA equivalent of DistributedSampler).

    Multi-host: each process holds only ITS loader shard (DataLoader slices
    indices by process_index), so the global array is assembled from the
    per-process pieces with make_array_from_process_local_data — a plain
    device_put cannot address the other hosts' devices."""
    arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
    if sharding is None:
        return {**batch, **jax.device_put(arrays)}
    if jax.process_count() > 1:
        return {**batch, **{k: jax.make_array_from_process_local_data(sharding, v)
                            for k, v in arrays.items()}}
    return {**batch, **{k: jax.device_put(v, sharding) for k, v in arrays.items()}}


class DataLoader:
    """Minimal epoch-based loader: shuffle (seeded per epoch, the
    `sampler.set_epoch` equivalent), batch, optional background prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        num_prefetch: int = 2,
        process_count: Optional[int] = None,
        process_index: Optional[int] = None,
        transform=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_prefetch = num_prefetch
        # host-side batch map (e.g. pre-resizing CT targets to the stage
        # resolution so stage-1 never ships 256³ over the host↔device link);
        # runs inside the prefetch thread, overlapping device compute
        self.transform = transform
        self.process_count = process_count if process_count is not None else jax.process_count()
        self.process_index = process_index if process_index is not None else jax.process_index()
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = (
            np.random.default_rng(self.seed + self.epoch).permutation(n)
            if self.shuffle
            else np.arange(n)
        )
        # Per-host shard (multi-host: each process reads its slice only).
        # Truncate to a multiple of process_count first so every process
        # yields the SAME number of batches per epoch — unequal counts would
        # desynchronize the jitted collectives and hang multi-host training.
        if self.process_count > 1:
            idx = idx[: len(idx) - len(idx) % self.process_count]
        return idx[self.process_index :: self.process_count]

    def __len__(self) -> int:
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _collate(self, items) -> Dict:
        out: Dict = {}
        for key in items[0]:
            vals = [it[key] for it in items]
            if isinstance(vals[0], np.ndarray):
                out[key] = np.stack(vals)
            else:
                out[key] = vals
        return out

    def _batches(self) -> Iterator[Dict]:
        idx = self._indices()
        nb = len(self)
        for b in range(nb):
            chunk = idx[b * self.batch_size : (b + 1) * self.batch_size]
            if len(chunk) == 0:
                break
            batch = self._collate([self.dataset[int(i)] for i in chunk])
            yield self.transform(batch) if self.transform is not None else batch

    def __iter__(self) -> Iterator[Dict]:
        if self.num_prefetch <= 0:
            yield from self._batches()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.num_prefetch)
        sentinel = object()
        err: list = []

        def producer():
            try:
                for batch in self._batches():
                    q.put(batch)
            except Exception as e:  # surface loader errors on the main thread
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
