"""Background-thread batch prefetching.

The reference's input pipeline is a torch DataLoader pinned to
``num_workers=0`` ("increasing this bugs out right now",
dpr_scale/datamodule/dpr.py:292) — collate runs serially with the train
loop. Here host-side assembly (mmap reads + Rust tokenization, which
releases the GIL) overlaps device steps via a small queue.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def prefetch(iterable: Iterable[T], buffer_size: int = 2) -> Iterator[T]:
    q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
    err: list = []

    def worker():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # propagate into consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
