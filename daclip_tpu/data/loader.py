"""Batching / sharded sampling / device prefetch — TPU-native data feeding.

Replaces torch DataLoader + DistIterSampler (data/__init__.py:8-33,
data_sampler.py:31-62):
  * IterSampler — deterministic per-epoch permutation of dataset×ratio, strided
    across hosts (same ×200 epoch enlargement trick for iter-based training),
  * DataLoader — thread-pool sample fetch + numpy collate + optional double-
    buffered `jax.device_put` so the next batch is on device while the current
    step runs (replacement for pinned-memory/NCCL prefetch).
"""
from __future__ import annotations

import collections
import concurrent.futures
import threading
from typing import Dict, Iterator, Optional

import numpy as np

try:
    import jax
except ImportError:  # pragma: no cover
    jax = None


class IterSampler:
    """DistIterSampler parity (data_sampler.py:31-62) with numpy RNG: permutation
    of total = ceil(len·ratio / num_hosts)·num_hosts indices mod len, strided by
    host id; reshuffled per epoch via `set_epoch`."""

    def __init__(self, dataset_len: int, host_id: int = 0, num_hosts: int = 1,
                 ratio: int = 100):
        self.dataset_len = dataset_len
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.num_samples = int(np.ceil(dataset_len * ratio / num_hosts))
        self.total_size = self.num_samples * num_hosts
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return self.num_samples

    def __iter__(self) -> Iterator[int]:
        g = np.random.default_rng(self.epoch)
        indices = g.permutation(self.total_size) % self.dataset_len
        return iter(indices[self.host_id:self.total_size:self.num_hosts].tolist())


def _collate(samples) -> Dict[str, np.ndarray]:
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        elif isinstance(vals[0], (int, float, np.integer, np.floating)):
            out[key] = np.asarray(vals)
        else:
            out[key] = vals  # strings/paths stay as lists
    return out


class DataLoader:
    """Iterates batches of collated numpy dicts.

    batch_size is the PER-HOST batch (the caller shards it over local devices via
    NamedSharding); drop_last always true for train parity (data/__init__.py:26).
    """

    def __init__(self, dataset, batch_size: int, sampler: Optional[IterSampler] = None,
                 shuffle: bool = False, num_workers: int = 0, drop_last: bool = True,
                 seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.seed = seed
        self._epoch = 0

    def __len__(self):
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _indices(self):
        if self.sampler is not None:
            return list(iter(self.sampler))
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(idx)
        return idx.tolist()

    def set_epoch(self, epoch: int):
        self._epoch = epoch
        if self.sampler is not None:
            self.sampler.set_epoch(epoch)

    def __iter__(self):
        indices = self._indices()
        nb = len(self)
        batches = [indices[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]
        if self.num_workers > 0:
            # per-SAMPLE futures over a shared pool (2 batches of lookahead):
            # all num_workers threads decode concurrently — a per-batch task
            # would serialize the samples inside it and cap parallelism at the
            # lookahead depth regardless of the worker count
            with concurrent.futures.ThreadPoolExecutor(self.num_workers) as ex:
                pending = collections.deque()
                it = iter(batches)
                for _ in range(2):
                    b = next(it, None)
                    if b is not None:
                        pending.append([ex.submit(self.dataset.__getitem__, i)
                                        for i in b])
                while pending:
                    futs = pending.popleft()
                    b = next(it, None)
                    if b is not None:
                        pending.append([ex.submit(self.dataset.__getitem__, i)
                                        for i in b])
                    yield _collate([f.result() for f in futs])
        else:
            for b in batches:
                yield _collate([self.dataset[i] for i in b])


def device_prefetch(iterator, sharding=None, size: int = 2):
    """Wrap a host batch iterator with async device_put double buffering."""
    queue = collections.deque()

    def _put(batch):
        return {k: (jax.device_put(v, sharding) if isinstance(v, np.ndarray)
                    else v) for k, v in batch.items()}

    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(_put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(_put(next(it)))
        except StopIteration:
            pass
        yield out
