"""Batching + background prefetch.

Replaces torch.utils.data.DataLoader (data/__init__.py:44-53: shuffle unless
serial_batches, drop_last when training).  Decoding happens in a thread pool
(PIL releases the GIL for IO/decode); batches are collated into numpy arrays
ready for device transfer.  Samples raising SkipSampleException are skipped
and replaced (the reference skips them during eval, inference_manager.py:99).
"""

from __future__ import annotations

import queue
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

import numpy as np

from deepsee_tpu.data.datasets import SkipSampleException

_ARRAY_KEYS = ("label", "image_hr", "guiding_label", "guiding_image")


def collate(samples: List[Dict]) -> Dict:
    out: Dict = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if key in _ARRAY_KEYS:
            out[key] = np.stack(vals)
        else:
            out[key] = vals  # paths, ids
    return out


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 4,
                 seed: int = 0, prefetch: int = 2,
                 shard_index: int = 0, num_shards: int = 1,
                 reseed_dataset: bool = True):
        """shard_index/num_shards: per-host sharding for multi-host meshes —
        each host reads a disjoint stripe of every (globally shuffled)
        epoch, the on-device batch dim then shards over the "data" axis.

        reseed_dataset=False skips the per-epoch dataset.seed() call — for
        auxiliary loaders (in-training evaluation) that share a dataset
        object with the live training loader and must not perturb its
        augmentation stream."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.reseed_dataset = reseed_dataset
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset) // self.num_shards
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _indices(self) -> List[int]:
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        if self.num_shards > 1:
            idx = idx[self.shard_index::self.num_shards]
        return idx

    def __iter__(self) -> Iterator[Dict]:
        """Abandonment-safe iteration: breaking out of (or GC'ing) the
        iterator stops the decode pool and the prefetch thread promptly —
        consumers like the in-training evaluator take N batches and leave
        (eval/evaluator.py), which must not leak threads or keep decoding
        the rest of the epoch in the background."""
        indices = self._indices()
        self.epoch += 1
        if self.reseed_dataset and callable(getattr(self.dataset, "seed", None)):
            self.dataset.seed(self.seed + self.epoch)
        stop = threading.Event()

        def fetch(i):
            try:
                return self.dataset[i]
            except SkipSampleException:
                return None

        def batches():
            # sliding window of futures: decode stays ~2*workers ahead of
            # consumption instead of submitting the whole epoch eagerly
            buf: List[Dict] = []
            pool = ThreadPoolExecutor(self.num_workers)
            try:
                window: deque = deque()
                it = iter(indices)

                def top_up():
                    while len(window) < self.num_workers * 2:
                        try:
                            i = next(it)
                        except StopIteration:
                            return
                        window.append(pool.submit(fetch, i))

                top_up()
                while window and not stop.is_set():
                    sample = window.popleft().result()
                    top_up()
                    if sample is None:
                        continue
                    buf.append(sample)
                    if len(buf) == self.batch_size:
                        yield collate(buf)
                        buf = []
                if buf and not self.drop_last and not stop.is_set():
                    yield collate(buf)
            finally:
                pool.shutdown(wait=False, cancel_futures=True)

        if self.prefetch <= 0:
            try:
                yield from batches()
            finally:
                stop.set()
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        _END = object()

        def producer():
            try:
                for b in batches():
                    while not stop.is_set():
                        try:
                            q.put(b, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        break
            finally:
                # block until the sentinel fits (the consumer is draining)
                # or the consumer abandoned us (stop set)
                while True:
                    try:
                        q.put(_END, timeout=0.1)
                        break
                    except queue.Full:
                        if stop.is_set():
                            break

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                b = q.get()
                if b is _END:
                    break
                yield b
        finally:
            stop.set()
