"""Multiprocess batch building: JSONL parse + sampling + tokenization in
worker processes, feeding the training loop through the prefetch queue.

The reference pins ``num_workers=0`` because its DataLoader workers are
broken ("increasing this bugs out right now",
dpr_scale/datamodule/dpr.py:292), leaving single-process collate as the
known input bottleneck (SURVEY.md §3 hot loops). Here workers each
rebuild a lightweight datamodule (mmap datasets reopen instantly via the
cached offset index) and assemble whole batches; results stream back in
order.

Start method: **forkserver**, not fork. Workers launch under an
initialized, multithreaded JAX parent; forking a multithreaded process
is a deadlock waiting to happen (Python 3.12 warns on it). The
forkserver's server process is a fresh single-threaded interpreter, so
children fork from a thread-free image. Accelerator-tunnel env vars are
stripped from the children's environment (set before the server spawns)
so worker interpreters — whose sitecustomize may import jax — can never
claim the device.

Workers never touch jax — only numpy + the Rust tokenizer.
"""
from __future__ import annotations

import multiprocessing as mp
import os
from typing import Callable, Iterable, Iterator, Sequence

_STATE: dict = {}

# env vars that would let a worker interpreter claim the accelerator
# (the axon sitecustomize imports jax at child startup)
_DEVICE_ENV = ("PALLAS_AXON_POOL_IPS",)


def _init_worker(factory: Callable, spec) -> None:
    # HF tokenizers disables its internal thread pool after a fork with a
    # loud warning; batch-level parallelism comes from our workers instead
    os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")
    for var in _DEVICE_ENV:
        os.environ.pop(var, None)
    _STATE["obj"] = factory(spec)


def _run(payload):
    method, args = payload
    return getattr(_STATE["obj"], method)(*args)


class WorkerPool:
    """A forkserver pool whose workers hold a rebuilt batch-builder object."""

    def __init__(self, num_workers: int, factory: Callable, spec):
        try:
            ctx = mp.get_context("forkserver")
        except ValueError:  # platform without forkserver
            ctx = mp.get_context("spawn")
        # the forkserver/spawned children inherit os.environ as of server
        # start: scrub device-claiming vars for the spawn, then restore
        saved = {v: os.environ.pop(v) for v in _DEVICE_ENV if v in os.environ}
        try:
            self._pool = ctx.Pool(
                num_workers, initializer=_init_worker, initargs=(factory, spec)
            )
        finally:
            os.environ.update(saved)

    def imap(
        self, method: str, args_list: Iterable[tuple], ahead: int = 0
    ) -> Iterator:
        """Ordered, pipelined map of ``obj.method(*args)`` over workers.

        At most ``ahead`` tasks are in flight (default 2x workers) — a
        plain ``Pool.imap`` buffers finished results without bound, which
        for epoch-sized iterators means the whole epoch in host RAM.
        """
        from collections import deque

        ahead = ahead or 2 * self._pool._processes
        pending: deque = deque()
        for args in args_list:
            pending.append(self._pool.apply_async(_run, ((method, args),)))
            if len(pending) >= ahead:
                yield pending.popleft().get()
        while pending:
            yield pending.popleft().get()

    def close(self) -> None:
        self._pool.terminate()
        self._pool.join()

    def __del__(self):
        try:
            self._pool.terminate()
        except Exception:
            pass
