"""Batch loader: frame-major stacking with background prefetch.

Re-design of reference `ltr/data/loader.py` (LTRLoader:122, ltr_collate_stack1:72):
batches stack samples at dim 1 (frame-major: (num_frames, batch, ...)) which is what
the actors/networks expect, and what makes the sequence axis the natural data-parallel
shard axis. Prefetching uses a thread pool (the producers are numpy/cv2 which release
the GIL); a process pool is unnecessary because the heavy math runs on device.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np


def _stack_dim1(samples: list, stack_dim: int = 1) -> dict:
    """Collate a list of processed samples into frame-major arrays
    (reference loader.py:19-120 ltr_collate_stack1). stack_dim=1 (default) yields
    (num_frames, batch, ...); stack_dim=0 yields plain (batch, ...) like
    reference ltr_collate."""
    out = {}
    keys = samples[0].keys()
    for k in keys:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], str):
            out[k] = vals
            continue
        if isinstance(vals[0], (list, tuple)):
            # list over frames -> stack frames at dim 0, batch at dim 1
            frames = len(vals[0])
            stacked = np.stack(
                [np.stack([np.asarray(v[f]) for v in vals], axis=0)
                 for f in range(frames)], axis=0)
            out[k] = stacked if stack_dim == 1 else \
                np.moveaxis(stacked, 0, 1)
        elif stack_dim == 0:
            out[k] = np.stack([np.asarray(v) for v in vals], axis=0)
        else:
            out[k] = np.stack([np.asarray(v) for v in vals], axis=0)[None] \
                if np.asarray(vals[0]).ndim > 0 else np.asarray(vals)
    return out


class LTRLoader:
    """Iterable over epochs of frame-major batches (reference loader.py:122-195)."""

    def __init__(self, name: str, dataset, training: bool = True, batch_size: int = 8,
                 num_workers: int = 4, epoch_interval: int = 1, stack_dim: int = 1,
                 drop_last: bool = True, prefetch: int = 2):
        self.name = name
        self.training = training
        self.dataset = dataset
        self.batch_size = batch_size
        self.epoch_interval = epoch_interval
        self.stack_dim = stack_dim
        self.num_workers = max(num_workers, 1)
        self.prefetch = prefetch
        self.__len = len(dataset) // batch_size

    def __len__(self):
        return self.__len

    def _produce(self, q: queue.Queue, stop: threading.Event):
        try:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(self.num_workers) as pool:
                idx = 0
                for _ in range(len(self)):
                    if stop.is_set():
                        return
                    samples = list(pool.map(self.dataset.__getitem__,
                                            range(idx, idx + self.batch_size)))
                    idx += self.batch_size
                    q.put(_stack_dim1(samples, self.stack_dim))
        finally:
            q.put(None)

    def __iter__(self) -> Iterator[dict]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        t = threading.Thread(target=self._produce, args=(q, stop), daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()


class MultiEpochLTRLoader(LTRLoader):
    """LTRLoader whose producer pool persists across epochs (reference
    loader.py:194-208 / _RepeatSampler:211): the prefetch thread keeps filling the
    queue through epoch boundaries so epoch N+1's first batch is already staged when
    epoch N's last step finishes."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._q: Optional[queue.Queue] = None

    def _produce_forever(self, q: queue.Queue, stop: threading.Event):
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(self.num_workers) as pool:
            while not stop.is_set():
                idx = 0
                for _ in range(len(self)):
                    if stop.is_set():
                        return
                    samples = list(pool.map(self.dataset.__getitem__,
                                            range(idx, idx + self.batch_size)))
                    idx += self.batch_size
                    q.put(_stack_dim1(samples, self.stack_dim))

    def __iter__(self) -> Iterator[dict]:
        if self._q is None:
            self._q = queue.Queue(maxsize=self.prefetch)
            self._stop = threading.Event()
            t = threading.Thread(target=self._produce_forever,
                                 args=(self._q, self._stop), daemon=True)
            t.start()
        for _ in range(len(self)):
            yield self._q.get()
