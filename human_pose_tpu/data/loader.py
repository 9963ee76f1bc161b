"""Prefetching data loader with per-host sharding and resumable RNG.

Replaces torch's DataLoader + DistributedSampler (reference
src/base/datamodule.py:68-89): a thread pool decodes/augments samples ahead of
the training loop (cv2/numpy release the GIL for the heavy ops) while the TPU
computes, and an epoch-seeded permutation is sharded across processes
(``sampler.set_epoch`` equivalent: the permutation is a function of
(seed, epoch), reference trainer.py:278-279).

RNG snapshot/restore covers python and numpy generators (reference
datamodule.py:91-106 captures all framework RNG states for bit-compatible
resume; JAX keys are explicit so only host RNG needs capture).
"""

from __future__ import annotations

import random
import threading
from concurrent.futures import ThreadPoolExecutor
from queue import Queue
from typing import Callable, Iterator

import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        collate_fn: Callable,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 4,
        prefetch: int = 2,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        # shard across processes (DistributedSampler equivalent): pad to a
        # multiple so every process sees the same number of batches
        per = -(-n // self.process_count)
        padded = np.concatenate([order, order[: per * self.process_count - n]])
        return padded[self.process_index :: self.process_count]

    def __len__(self) -> int:
        n = len(self._epoch_indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator:
        indices = self._epoch_indices()
        nb = len(self)
        batches = [
            indices[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)
        ]
        q: Queue = Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for batch_idx in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(self.dataset.__getitem__, batch_idx))
                    q.put(self.collate_fn(samples))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()

    # -- resumable host RNG (reference datamodule.py:91-106) ----------------
    def state_dict(self) -> dict:
        return {
            "epoch": self.epoch,
            "python_random": random.getstate(),
            "numpy_random": np.random.get_state(),
        }

    def load_state_dict(self, state: dict) -> None:
        self.epoch = int(state["epoch"])
        if "python_random" in state:
            st = state["python_random"]
            random.setstate((st[0], tuple(st[1]), st[2]) if isinstance(st, (list, tuple)) else st)
        if "numpy_random" in state:
            st = list(state["numpy_random"])
            st[1] = np.asarray(st[1], np.uint32)
            np.random.set_state(tuple(st))
