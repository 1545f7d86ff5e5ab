"""Threaded prefetching batch loader (replaces torch DataLoader workers,
train_lightning.py:35-45).

h5py/gzip decode releases the GIL inside the HDF5 C library, so a thread pool
keeps the TPU fed without torch's process-fork machinery; batches are
collated into contiguous numpy arrays ready for device put. Deterministic
per-epoch shuffling via a seeded generator.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np


def collate(samples: list) -> dict:
    """Stack a list of per-scene dicts into batch arrays; `meta` entries are
    collected into lists (the reference keeps them as python values too)."""
    out = {}
    for k in samples[0]:
        if k == "meta":
            out["meta"] = [s["meta"] for s in samples]
        else:
            out[k] = np.stack([np.asarray(s[k]) for s in samples])
    return out


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 4, seed: int = 0, drop_last: bool = True,
                 prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(0, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def _batch_indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self._epoch))
            rng.shuffle(idx)
        nb = len(self)
        for b in range(nb):
            yield idx[b * self.batch_size: (b + 1) * self.batch_size]

    def __iter__(self) -> Iterator[dict]:
        if self.num_workers == 0:
            for ids in self._batch_indices():
                yield collate([self.dataset[int(i)] for i in ids])
            return

        batches = list(self._batch_indices())
        out_q: "queue.Queue[tuple[int, Optional[dict], Optional[BaseException]]]" = (
            queue.Queue(maxsize=self.prefetch)
        )
        lock = threading.Lock()
        cursor = [0]
        stop_ev = threading.Event()

        def put_with_backpressure(item) -> bool:
            # A plain blocking put() would deadlock a worker forever when the
            # consumer abandons iteration early (every epoch under
            # limit_train_batches < 1): the generator's finally block can't
            # drain faster than workers refill. Poll the stop event instead.
            while not stop_ev.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            while not stop_ev.is_set():
                with lock:
                    i = cursor[0]
                    if i >= len(batches):
                        return
                    cursor[0] += 1
                try:
                    batch = collate([self.dataset[int(j)] for j in batches[i]])
                    if not put_with_backpressure((i, batch, None)):
                        return
                except BaseException as e:  # surfaced in the consumer
                    put_with_backpressure((i, None, e))
                    return

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        pending: dict[int, dict] = {}
        next_i = 0
        received = 0
        try:
            while received < len(batches):
                i, batch, err = out_q.get()
                if err is not None:
                    raise err
                received += 1
                pending[i] = batch
                while next_i in pending:
                    yield pending.pop(next_i)
                    next_i += 1
        finally:
            stop_ev.set()
            with lock:
                cursor[0] = len(batches)
            # Drain so any worker mid-put releases immediately and its
            # prefetched 512² batch memory is dropped with it.
            try:
                while True:
                    out_q.get_nowait()
            except queue.Empty:
                pass
