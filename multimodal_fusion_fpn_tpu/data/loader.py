"""Threaded prefetching data loader.

TPU-native replacement for the reference's ``torch.utils.data.DataLoader``
(``/root/reference/train.py:79-95``): a thread pool decodes and transforms
examples ahead of the training step (numpy/scipy release the GIL in the
hot paths), batches are collated into stacked numpy arrays, and the
training loop overlaps host→HBM transfer of batch N+1 with the device
step N (double buffering happens in the Trainer).

Determinism: example ``i`` of epoch ``e`` uses
``np.random.Generator(seed, e, i)`` regardless of thread scheduling —
stronger reproducibility than the reference's per-worker seeding
(``train.py:30-34``).
"""

import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Optional

import numpy as np


def default_collate(examples):
    """Stack a list of example dicts into a batch dict (torch
    ``default_collate`` analogue: arrays are stacked, scalars become
    arrays, strings become lists)."""
    batch = {}
    for key in examples[0]:
        vals = [e[key] for e in examples]
        first = vals[0]
        if isinstance(first, np.ndarray):
            batch[key] = np.stack(vals)
        elif isinstance(first, (int, float, np.integer, np.floating)):
            batch[key] = np.asarray(vals)
        else:
            batch[key] = list(vals)
    return batch


class DataLoader:
    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 drop_last: bool = False, num_workers: int = 0,
                 seed: int = 1234,
                 collate_fn: Callable = default_collate,
                 prefetch_batches: int = 2,
                 transform_rng: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.seed = seed
        self.collate_fn = collate_fn
        self.prefetch_batches = max(1, prefetch_batches)
        self.transform_rng = transform_rng
        self.epoch = 0
        self._local = threading.local()

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _worker_dataset(self):
        # Thread-local shallow copy: each worker thread gets its own
        # record slot so dataset._load is race-free.
        ds = getattr(self._local, "dataset", None)
        if ds is None:
            import copy
            ds = copy.copy(self.dataset)
            self._local.dataset = ds
        return ds

    def _fetch(self, position: int, index: int):
        rng = np.random.default_rng([self.seed, self.epoch, position]) \
            if self.transform_rng else None
        ds = self._worker_dataset()
        return ds.get_example(int(index), rng)

    def __iter__(self):
        n = len(self.dataset)
        if self.shuffle:
            order = np.random.default_rng(
                [self.seed, self.epoch]).permutation(n)
        else:
            order = np.arange(n)

        n_batches = len(self)
        if self.num_workers <= 0:
            for b in range(n_batches):
                idxs = order[b * self.batch_size:(b + 1) * self.batch_size]
                examples = [self._fetch(b * self.batch_size + j, i)
                            for j, i in enumerate(idxs)]
                yield self.collate_fn(examples)
            return

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            window = self.prefetch_batches
            futures = {}

            def submit_batch(b):
                idxs = order[b * self.batch_size:(b + 1) * self.batch_size]
                futures[b] = [
                    pool.submit(self._fetch, b * self.batch_size + j, i)
                    for j, i in enumerate(idxs)]

            for b in range(min(window, n_batches)):
                submit_batch(b)
            for b in range(n_batches):
                if b + window < n_batches:
                    submit_batch(b + window)
                examples = [f.result() for f in futures.pop(b)]
                yield self.collate_fn(examples)
