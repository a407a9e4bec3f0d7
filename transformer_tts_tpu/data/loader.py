"""Data loader: sampler -> threaded fetch -> bucketed collate.

Replaces torch ``DataLoader(num_workers=8)`` (train_fastspeech2.py:344)
with a thread-pool prefetcher (feature loading is numpy IO — the GIL is
released in np.load/file reads) feeding statically-bucketed batches.
Multi-host: pass ``shard``/``num_shards`` (= jax.process_index/count) to
keep the DistributedSamplerWrapper contract.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

from transformer_tts_tpu.data.batching import collate
from transformer_tts_tpu.data.sampler import (
    LengthsBatchSampler, NumBatchSampler, shard_batches)


class DataLoader:
    def __init__(self, dataset, hp, *, sampler=None, num_workers: int = 8,
                 prefetch: int = 4, shard: int = 0, num_shards: int = 1,
                 pad_batch: bool = True, batch_multiple: int = 1,
                 fixed_shapes: bool = None):
        self.dataset = dataset
        self.hp = hp
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.shard = shard
        self.num_shards = num_shards
        self.pad_batch = pad_batch
        self.batch_multiple = batch_multiple
        if sampler is None:
            if hp.batch_size is not None:
                sampler = NumBatchSampler(len(dataset), hp.batch_size,
                                          seed=hp.seed)
            elif hp.max_seqlen is not None:
                lengths = dataset.mel_lengths(hp.lengths_file)
                sampler = LengthsBatchSampler(
                    lengths, hp.max_seqlen, seed=hp.seed,
                    sort_by_length=hp.sort_by_length)
            else:
                raise ValueError("set hp.batch_size or hp.max_seqlen")
        self.sampler = sampler
        # Multi-process SPMD requires IDENTICAL array shapes on every
        # process at every step (each process's local rows join one
        # global jax.Array): force every batch to one fixed
        # (batch, text, mel) shape — the top buckets and the largest
        # sampler batch. Single-process keeps per-batch bucketing.
        if fixed_shapes is None:
            fixed_shapes = num_shards > 1
        self.fixed_shapes = fixed_shapes
        if fixed_shapes:
            from transformer_tts_tpu.data.batching import pick_batch_bucket
            max_b = max(len(b) for b in self.sampler.all_indices)
            self._fixed = dict(
                text_len=max(hp.text_buckets),
                mel_len=max(hp.length_buckets),
                batch=pick_batch_bucket(max_b, multiple=batch_multiple))
        else:
            self._fixed = {}

    def __len__(self) -> int:
        batches = list(iter(self.sampler))
        if self.num_shards > 1:
            return len(shard_batches(batches, self.shard, self.num_shards))
        return len(batches)

    def _load_batch(self, indices):
        if hasattr(self.dataset, "load_batch_samples"):
            samples = self.dataset.load_batch_samples(
                indices, n_threads=max(self.num_workers, 1))
        else:
            samples = [self.dataset[i] for i in indices]
        return collate(samples, self.hp, pad_batch=self.pad_batch,
                       batch_multiple=self.batch_multiple, **self._fixed)

    def __iter__(self) -> Iterator[dict]:
        batches = list(iter(self.sampler))
        if self.num_shards > 1:
            batches = shard_batches(batches, self.shard, self.num_shards)
        if self.num_workers <= 1:
            for idx in batches:
                yield self._load_batch(idx)
            return
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            futures = queue.Queue()
            n_inflight = min(self.prefetch + self.num_workers, len(batches))
            it = iter(batches)
            for _ in range(n_inflight):
                futures.put(pool.submit(self._load_batch, next(it)))
            pending = len(batches) - n_inflight
            while not futures.empty():
                yield futures.get().result()
                if pending > 0:
                    futures.put(pool.submit(self._load_batch, next(it)))
                    pending -= 1
