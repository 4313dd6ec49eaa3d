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
                 shard_index: int = 0, num_shards: int = 1):
        """shard_index/num_shards: per-host sharding for multi-host meshes —
        each host reads a disjoint stripe of every (globally shuffled)
        epoch, the on-device batch dim then shards over the "data" axis."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        self.shard_index = shard_index
        self.num_shards = num_shards
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
        indices = self._indices()
        self.epoch += 1
        if callable(getattr(self.dataset, "seed", None)):
            self.dataset.seed(self.seed + self.epoch)

        def fetch(i):
            try:
                return self.dataset[i]
            except SkipSampleException:
                return None

        def batches():
            buf: List[Dict] = []
            with ThreadPoolExecutor(self.num_workers) as pool:
                for sample in pool.map(fetch, indices):
                    if sample is None:
                        continue
                    buf.append(sample)
                    if len(buf) == self.batch_size:
                        yield collate(buf)
                        buf = []
            if buf and not self.drop_last:
                yield collate(buf)

        if self.prefetch <= 0:
            yield from batches()
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        _END = object()

        def producer():
            try:
                for b in batches():
                    q.put(b)
            finally:
                q.put(_END)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            b = q.get()
            if b is _END:
                break
            yield b
