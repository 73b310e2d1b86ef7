"""Multi-worker host loader with device prefetch.

Replaces the reference's torch DataLoader worker processes (`main.py:96-99`)
with a thread pool (cv2/numpy release the GIL for the heavy parts: imread,
undistort, resize) feeding a bounded queue. Items are prepared ahead of the
train step so the TPU never waits on the host.

Abandoning an epoch mid-iteration (generator GC, `break`, a new `iter()`)
STOPS the workers: they check a per-epoch stop event between items and the
bounded output queue uses timed puts so no thread blocks forever. Without
this, threads from a discarded iterator keep reading the dataset — racing
cv2 buffers and outliving temp directories.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

import numpy as np

_SENTINEL = object()


class PrefetchLoader:
    """Iterates a dataset for one epoch with `num_workers` threads and a
    `prefetch`-deep queue. Order is nondeterministic under shuffle (matches
    torch DataLoader(shuffle=True) semantics)."""

    def __init__(
        self,
        dataset,
        shuffle: bool = True,
        num_workers: int = 4,
        prefetch: int = 8,
        seed: int | None = None,
        transform: Callable | None = None,
    ):
        self.dataset = dataset
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)
        self.transform = transform

    def __len__(self) -> int:
        return len(self.dataset)

    def __iter__(self) -> Iterator:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)

        idx_q: queue.Queue = queue.Queue()
        for i in order:
            idx_q.put(int(i))
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        n_alive = threading.Semaphore(0)
        stop = threading.Event()

        error: list = [None]  # (index, exception) from a failed worker

        def worker():
            try:
                while not stop.is_set():
                    try:
                        i = idx_q.get_nowait()
                    except queue.Empty:
                        return
                    try:
                        item = self.dataset[i]
                        if self.transform is not None:
                            item = self.transform(item)
                    except BaseException as exc:
                        # a corrupt item must fail the epoch loudly, not
                        # silently drop the item and one worker forever;
                        # stopping here drains the pool, the closer posts
                        # the sentinel, and the consumer re-raises below
                        error[0] = (i, exc)
                        stop.set()
                        return
                    while not stop.is_set():
                        try:
                            out_q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
            finally:
                n_alive.release()

        workers = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for w in workers:
            w.start()

        def closer():
            for _ in workers:
                n_alive.acquire()
            # a worker error sets `stop` but the consumer is still blocked
            # on get() — the sentinel must be delivered then; when instead
            # the CONSUMER set `stop` (abandoned iterator) nobody reads, so
            # bounded retries keep this daemon thread from spinning forever
            attempts = 0
            while not stop.is_set() or (error[0] is not None and attempts < 600):
                attempts += 1
                try:
                    out_q.put(_SENTINEL, timeout=0.1)
                    return
                except queue.Full:
                    continue

        threading.Thread(target=closer, daemon=True).start()

        try:
            while True:
                item = out_q.get()
                if item is _SENTINEL:
                    if error[0] is not None:
                        i, exc = error[0]
                        raise RuntimeError(
                            f"prefetch worker failed on dataset[{i}]"
                        ) from exc
                    return
                yield item
        finally:
            # reached on epoch end, break, or generator GC: release workers
            # and WAIT for them — a worker mid-__getitem__ must not outlive
            # the iterator (it would race dataset teardown, e.g. a tempdir-
            # backed test tree being deleted under its cv2.imread)
            stop.set()
            for w in workers:
                w.join(timeout=5.0)
