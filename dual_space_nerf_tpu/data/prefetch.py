"""Multi-worker host loader with device prefetch.

Replaces the reference's torch DataLoader worker processes (`main.py:96-99`)
with a thread pool (cv2/numpy release the GIL for the heavy parts: imread,
undistort, resize) feeding a bounded queue. Items are prepared ahead of the
train step so the TPU never waits on the host.

`backend="process"` (or DSNERF_LOADER_BACKEND=process) swaps the thread
pool for forked worker PROCESSES running `dataset[i]` — for hosts where
Python-level sampling (the 60/5/35 pixel loop) caps thread scaling under
the GIL. The device-side transform still runs on the consumer thread
(jax arrays do not cross process boundaries).

Abandoning an epoch mid-iteration (generator GC, `break`, a new `iter()`)
STOPS the workers: they check a per-epoch stop event between items and the
bounded output queue uses timed puts so no thread blocks forever. Without
this, threads from a discarded iterator keep reading the dataset — racing
cv2 buffers and outliving temp directories.
"""

from __future__ import annotations

import multiprocessing
import os
import queue
import threading
from typing import Callable, Iterator

import numpy as np

_SENTINEL = object()

_WORKER_DATASET = None


def _init_worker(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset
    # the parent process is threaded by the time an epoch iterates (JAX
    # backend threads, cv2's internal pool): a forked child inherits cv2's
    # thread-pool STATE but not its threads, so the first parallel cv2 call
    # would deadlock — pin the workers to single-threaded cv2 (items are
    # already process-parallel here)
    import cv2

    cv2.setNumThreads(0)


def _get_item(i: int):
    return _WORKER_DATASET[int(i)]


class PrefetchLoader:
    """Iterates a dataset for one epoch with `num_workers` threads and a
    `prefetch`-deep queue. Yield order is nondeterministic under the default
    `ordered=False` (matches torch DataLoader(shuffle=True) semantics:
    whichever worker finishes first yields first).

    `ordered=True` re-assembles items in submission order (the shuffled
    index order) regardless of worker completion order — required by the
    multi-host path (training/loop.py), where every process must consume
    the IDENTICAL batch stream. Each `__iter__` also advances an epoch
    counter and forwards it via `dataset.set_epoch(epoch)` when the dataset
    has one, so per-(epoch, item) rng schemes stay in lockstep across
    processes."""

    def __init__(
        self,
        dataset,
        shuffle: bool = True,
        num_workers: int = 4,
        prefetch: int = 8,
        seed: int | None = None,
        transform: Callable | None = None,
        backend: str | None = None,
        ordered: bool = False,
    ):
        self.dataset = dataset
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)
        self.transform = transform
        self.ordered = ordered
        self._epoch = 0
        # env wins over config/arg so in-flight A/Bs work without edits
        # (same convention as the DSNERF_KNN_* kernel knobs)
        backend = (
            os.environ.get("DSNERF_LOADER_BACKEND") or backend or "thread"
        )
        if backend not in ("thread", "process"):
            raise ValueError(
                f"PrefetchLoader backend {backend!r}: expected "
                "'thread' or 'process' (DSNERF_LOADER_BACKEND)"
            )
        self.backend = backend

    def __len__(self) -> int:
        return len(self.dataset)

    def _iter_process(self, order) -> Iterator:
        """Forked worker processes sample items; the device transform runs
        on the consumer thread. fork shares the dataset's numpy tables
        copy-on-write — nothing re-pickles per item.

        fork-after-init hazard: this pool forks at epoch-iteration time,
        AFTER the JAX backend (and usually cv2's thread pool) started
        threads; forking a threaded process is only safe because the
        children never touch JAX (the transform runs on the consumer
        thread) and pin cv2 to 0 threads (`_init_worker`). If a future
        host still hangs here, switch to the default "thread" backend —
        the decoded-image cache makes post-warmup items cheap enough that
        one thread feeds the step loop."""
        ctx = multiprocessing.get_context("fork")
        pool = ctx.Pool(
            self.num_workers, initializer=_init_worker,
            initargs=(self.dataset,),
        )
        # imap preserves submission order; imap_unordered trades order for
        # slightly better worker utilization (the default)
        imap = pool.imap if self.ordered else pool.imap_unordered
        try:
            for item in imap(_get_item, [int(i) for i in order]):
                if self.transform is not None:
                    item = self.transform(item)
                yield item
        finally:
            pool.terminate()
            pool.join()

    def __iter__(self) -> Iterator:
        self._epoch += 1
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self._epoch)
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        if self.backend == "process":
            yield from self._iter_process(order)
            return

        idx_q: queue.Queue = queue.Queue()
        for seq, i in enumerate(order):
            idx_q.put((seq, int(i)))
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        n_alive = threading.Semaphore(0)
        stop = threading.Event()

        error: list = [None]  # (index, exception) from a failed worker

        def worker():
            try:
                while not stop.is_set():
                    try:
                        seq, i = idx_q.get_nowait()
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
                            out_q.put((seq, item), timeout=0.1)
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
            # ordered mode: re-assemble by submission sequence. The buffer
            # is bounded by prefetch + num_workers items (workers block on
            # the full out_q while the head-of-line item is in flight).
            buffered: dict = {}
            next_seq = 0
            while True:
                got = out_q.get()
                if got is _SENTINEL:
                    if error[0] is not None:
                        i, exc = error[0]
                        raise RuntimeError(
                            f"prefetch worker failed on dataset[{i}]"
                        ) from exc
                    # drain any buffered tail (possible only if the
                    # sentinel raced ahead, which the closer prevents; be
                    # safe anyway)
                    while self.ordered and next_seq in buffered:
                        yield buffered.pop(next_seq)
                        next_seq += 1
                    return
                seq, item = got
                if not self.ordered:
                    yield item
                    continue
                buffered[seq] = item
                while next_seq in buffered:
                    yield buffered.pop(next_seq)
                    next_seq += 1
        finally:
            # reached on epoch end, break, or generator GC: release workers
            # and WAIT for them — a worker mid-__getitem__ must not outlive
            # the iterator (it would race dataset teardown, e.g. a tempdir-
            # backed test tree being deleted under its cv2.imread)
            stop.set()
            for w in workers:
                w.join(timeout=5.0)
