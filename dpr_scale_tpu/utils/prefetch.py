"""Background-thread batch prefetching.

The reference's input pipeline is a torch DataLoader pinned to
``num_workers=0`` ("increasing this bugs out right now",
dpr_scale/datamodule/dpr.py:292) — collate runs serially with the train
loop. Here host-side assembly (mmap reads + Rust tokenization, which
releases the GIL) overlaps device steps via a small queue.

The iterator supports early abandonment: dropping it (or calling
``close()``) signals the worker to stop instead of leaving a thread
blocked on a full queue — important because producers share host state
(e.g. the example builder's RNG) with the next epoch's iterator.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


class _Prefetcher:
    def __init__(self, iterable: Iterable[T], buffer_size: int):
        self._q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
        self._cancel = threading.Event()
        self._err: list = []
        self._thread = threading.Thread(
            target=self._worker, args=(iterable,), daemon=True
        )
        self._thread.start()

    def _worker(self, iterable):
        try:
            for item in iterable:
                while not self._cancel.is_set():
                    try:
                        self._q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if self._cancel.is_set():
                    return
        except BaseException as e:  # propagate into consumer
            self._err.append(e)
        finally:
            try:
                self._q.put_nowait(_SENTINEL)
            except queue.Full:
                pass  # consumer gone; cancel flag ends everything

    def close(self):
        self._cancel.set()

    def __del__(self):
        self.close()

    def __iter__(self) -> Iterator[T]:
        return self

    def __next__(self) -> T:
        while True:
            try:
                item = self._q.get(timeout=0.1)
            except queue.Empty:
                if not self._thread.is_alive():
                    if self._err:
                        raise self._err[0]
                    raise StopIteration
                continue
            if item is _SENTINEL:
                self.close()
                if self._err:
                    raise self._err[0]
                raise StopIteration
            return item


def prefetch(iterable: Iterable[T], buffer_size: int = 2) -> Iterator[T]:
    """``buffer_size <= 0`` DISABLES prefetching (synchronous
    passthrough). It must not reach queue.Queue, where maxsize=0 means
    an UNBOUNDED queue — the producer would race ahead and buffer the
    whole epoch in host RAM (a 21M-passage corpus of tokenized batches)."""
    if buffer_size <= 0:
        return iter(iterable)
    return _Prefetcher(iterable, buffer_size)
