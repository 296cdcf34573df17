"""Threaded prefetching data loader (torch-DataLoader equivalent, TPU-native).

The reference feeds the GPU with `torch.utils.data.DataLoader(num_workers=4,
pin_memory=True)` (`/root/reference/ModeT/train.py:98-99`). On TPU the
equivalent is: worker threads materialize numpy batches ahead of time while
the device computes, and `jax.device_put` overlaps the host->device copy with
the current step (JAX dispatch is async). This loader does exactly that —
a bounded queue of prefetched batches filled by a thread pool.

Items come from any indexable dataset returning tuples of (1, D, H, W)
numpy arrays; batches are stacked to (B, D, H, W, 1) channels-last device
arrays (segmentation volumes keep their integer dtype).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Sequence

import jax
import numpy as np


def _to_ndhwc(arr: np.ndarray) -> np.ndarray:
    # (1, D, H, W) -> (D, H, W, 1)
    if arr.ndim != 4 or arr.shape[0] != 1:
        raise ValueError(f"expected (1, D, H, W) item, got {arr.shape}")
    return np.moveaxis(arr, 0, -1)


class Loader:
    """Iterates a dataset in batches with background prefetch.

    Args:
      dataset: indexable with __len__ and __getitem__ -> tuple of numpy arrays.
      batch_size: leading batch dim of the stacked output.
      shuffle: reshuffle indices each epoch.
      seed: RNG seed for shuffling.
      num_workers: prefetch threads (0 = synchronous).
      prefetch: max batches queued ahead.
      drop_last: drop the trailing partial batch.
      device_put: move batches onto the default device (async).
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        seed: int = 24,
        num_workers: int = 4,
        prefetch: int = 2,
        drop_last: bool = False,
        device_put: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.prefetch = max(1, prefetch)
        self.drop_last = drop_last
        self.device_put = device_put
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self) -> Sequence[Sequence[int]]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        n = len(idx)
        stop = n - n % self.batch_size if self.drop_last else n
        return [idx[i : i + self.batch_size] for i in range(0, stop, self.batch_size) if len(idx[i : i + self.batch_size])]

    def _make_batch(self, indices):
        items = [self.dataset[int(i)] for i in indices]
        ncols = len(items[0])
        cols = []
        for c in range(ncols):
            col = np.stack([_to_ndhwc(np.asarray(it[c])) for it in items])
            cols.append(col)
        if self.device_put:
            cols = [jax.device_put(c) for c in cols]
        return tuple(cols)

    def __iter__(self) -> Iterator:
        batches = self._batches()
        self._epoch += 1
        if self.num_workers == 0:
            for b in batches:
                yield self._make_batch(b)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        it = iter(batches)
        lock = threading.Lock()
        n_alive = [self.num_workers]
        # preserve ordering: a single dispatcher thread assigns sequence
        # numbers; emit in order via a reorder buffer
        seq_lock = threading.Lock()
        seq = [0]

        def worker():
            while not stop.is_set():
                with seq_lock:
                    my_seq = seq[0]
                    try:
                        b = batches[my_seq]
                    except IndexError:
                        break
                    seq[0] += 1
                try:
                    out = self._make_batch(b)
                    q.put((my_seq, out))
                except Exception as e:  # propagate to consumer
                    q.put((my_seq, e))
            with lock:
                n_alive[0] -= 1
                if n_alive[0] == 0:
                    q.put((None, None))

        threads = [threading.Thread(target=worker, daemon=True) for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            pending = {}
            next_out = 0
            done = False
            while next_out < len(batches):
                while next_out not in pending and not done:
                    s, out = q.get()
                    if s is None:
                        done = True
                        break
                    pending[s] = out
                if next_out in pending:
                    out = pending.pop(next_out)
                    next_out += 1
                    if isinstance(out, Exception):
                        raise out
                    yield out
                elif done:
                    break
        finally:
            stop.set()
            # drain queue so workers blocked on put() can exit
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
