"""Online retrieval serving: query text -> encoded -> index search -> passages.

The reference is train/eval tooling only ("not a serving system",
SURVEY.md); this module adds the deployment surface the TPU build targets:
thread-safe retriever handles (dense MIPS and multi-vector CITADEL) plus a
stdlib HTTP server (``cli/serve.py``). Queries are padded into
power-of-two batch buckets so the jitted encode+search programs are reused
across request sizes.

Concurrency design — a coalescing worker per retriever, with an OPT-IN
two-stage encode/search overlap:

  request threads --> encode worker [--> bounded queue --> search worker]

* Concurrent callers COALESCE: the encode worker merges everything pending
  (bounded by ``coalesce_wait_ms`` after the first request) into one
  padded device batch — under load the TPU sees large batches instead of a
  serialized stream of small ones, which is where its throughput lives.
* The default is ``serialized=True``: each coalesced group runs
  tokenize -> encode -> search -> join end-to-end on one worker. A
  two-stage overlap (encode group N+1 while group N searches,
  ``serialized=False``) was built and A/B-measured on-chip at 2.1M rows /
  16 clients (tools/bench_serving_http.py --ab): it LOSES 38% —
  147 q/s pipelined vs 235 q/s serialized, p50 393 vs 207 ms. On a
  single chip encode and search serialize on the device anyway, so the
  overlap buys no device parallelism; what it does do is drain the
  encode queue faster, which SHRINKS the coalesced group sizes — the
  back-pressure of the serialized worker is itself the batching
  mechanism. Keep the overlap opt-in for deployments where the stages
  use different devices or host routing work dominates (CITADEL).
* Passage materialization (host dict/mmap lookups) happens on the REQUEST
  thread, off the device critical path.

The latency accounting mirrors the reference's retrieval-task timing
surface (reference dpr_scale/task/citadel_retrieval_task.py:111-139).

API (``make_server``):
    POST /search          dense tower   {"questions": [...], "k": 10}
    POST /search_citadel  multivec tower (when configured)
      -> {"results": [[{"id","title","text","score"}, ...], ...]}
    GET /healthz  -> {"status": "ok", "corpus_rows": N, "towers": [...]}
"""
from __future__ import annotations

import json
import queue as _queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np


class _Pending:
    __slots__ = ("texts", "k_searched", "event", "scores", "rows", "error")

    def __init__(self, texts, k_searched):
        self.texts = texts
        self.k_searched = k_searched
        self.event = threading.Event()
        self.scores = self.rows = self.error = None


class _CoalescingPipeline:
    """Two-stage encode/search pipeline shared by the retriever types.

    Subclasses implement:
      * ``_encode_chunk(texts) -> payload`` — tokenize + device encode of
        one <=max_batch chunk (runs on the encode worker);
      * ``_search_payload(payload, k) -> (scores, rows)`` — index search of
        one chunk's payload, host numpy outputs (runs on the search worker);
      * ``num_rows`` — corpus size, for k clamping and /healthz.
    """

    def __init__(
        self,
        passages,  # CSVDataset
        default_k: int = 10,
        max_batch: int = 64,
        max_k: int = 1000,
        coalesce_wait_ms: float = 2.0,
        search_queue_depth: int = 2,
        serialized: bool = True,
    ):
        self.passages = passages
        self.default_k = default_k
        self.max_batch = max_batch
        self.max_k = max_k
        self.coalesce_wait_ms = coalesce_wait_ms
        # serialized=True (default, measured faster — see module
        # docstring) finishes each coalesced group end-to-end on the
        # encode worker; serialized=False enables the two-stage
        # encode/search overlap. Read per group, so it can be toggled on
        # a live pipeline (tools/bench_serving_http.py --ab does, between
        # timed phases).
        self.serialized = serialized
        self._encode_q: _queue.Queue = _queue.Queue()
        self._search_q: _queue.Queue = _queue.Queue(maxsize=search_queue_depth)
        self._workers_started = False
        self._worker_lock = threading.Lock()
        # serializes _search_group across the encode worker (serialized
        # mode) and the search worker (pipelined mode): flipping
        # ``serialized`` live (bench --ab) while a group is still queued
        # must not interleave device searches across the phase boundary
        self._search_group_lock = threading.Lock()

    # -- subclass surface ------------------------------------------------ #

    @property
    def num_rows(self) -> int:
        raise NotImplementedError

    def _encode_chunk(self, texts: List[str]):
        raise NotImplementedError

    def _search_payload(self, payload, k: int):
        raise NotImplementedError

    # -- shared plumbing -------------------------------------------------- #

    def _pad_batch(self, n: int) -> int:
        return min(self.max_batch, max(8, 1 << (n - 1).bit_length()))

    def _run_one(self, texts: List[str], k_searched: int):
        """Full pipeline for one request, chunked — the isolation/retry
        path when a coalesced group fails."""
        all_s, all_r = [], []
        for lo in range(0, len(texts), self.max_batch):
            chunk = texts[lo : lo + self.max_batch]
            payload = self._encode_chunk(chunk)
            s, r = self._search_payload(payload, k_searched)
            all_s.append(s[: len(chunk)])
            all_r.append(r[: len(chunk)])
        return np.concatenate(all_s), np.concatenate(all_r)

    def _isolate(self, batch: List[_Pending]):
        """A poisoned request coalesced with healthy ones must not fail
        unrelated callers — retry each request alone (rare path)."""
        for r in batch:
            try:
                r.scores, r.rows = self._run_one(r.texts, r.k_searched)
            except Exception as e_r:  # noqa: BLE001
                r.error = e_r
            r.event.set()

    def _encode_worker(self):
        while True:
            first = self._encode_q.get()
            batch = [first]
            n = len(first.texts)
            deadline = time.perf_counter() + self.coalesce_wait_ms / 1e3
            while n < self.max_batch:
                left = deadline - time.perf_counter()
                if left <= 0:
                    break
                try:
                    nxt = self._encode_q.get(timeout=left)
                except _queue.Empty:
                    break
                batch.append(nxt)
                n += len(nxt.texts)
            texts = [t for r in batch for t in r.texts]
            k_s = max(r.k_searched for r in batch)
            try:
                payloads = [
                    (
                        self._encode_chunk(texts[lo : lo + self.max_batch]),
                        min(self.max_batch, len(texts) - lo),
                    )
                    for lo in range(0, len(texts), self.max_batch)
                ]
            except Exception:  # noqa: BLE001
                self._isolate(batch)
                continue
            if self.serialized:
                # default: finish the group on this thread — while it
                # runs, new requests pile up into a LARGER next group
                self._search_group(batch, payloads, k_s)
            else:
                # bounded: blocks (back-pressure) once the search worker is
                # one group behind — encode never races further ahead
                self._search_q.put((batch, payloads, k_s))

    def _search_group(self, batch, payloads, k_s):
        with self._search_group_lock:
            self._search_group_locked(batch, payloads, k_s)

    def _search_group_locked(self, batch, payloads, k_s):
        try:
            all_s, all_r = [], []
            for payload, n_real in payloads:
                s, r = self._search_payload(payload, k_s)
                all_s.append(s[:n_real])
                all_r.append(r[:n_real])
            scores = np.concatenate(all_s)
            rows = np.concatenate(all_r)
            off = 0
            for r in batch:
                m = len(r.texts)
                r.scores, r.rows = scores[off : off + m], rows[off : off + m]
                off += m
                r.event.set()
        except Exception as e:  # noqa: BLE001
            if len(batch) == 1:
                batch[0].error = e
                batch[0].event.set()
            else:
                self._isolate(batch)

    def _search_worker(self):
        while True:
            self._search_group(*self._search_q.get())

    def _ensure_workers(self):
        if not self._workers_started:
            with self._worker_lock:
                if not self._workers_started:
                    for target in (self._encode_worker, self._search_worker):
                        threading.Thread(target=target, daemon=True).start()
                    self._workers_started = True

    def search(self, questions: List[str], k: Optional[int] = None) -> List[List[dict]]:
        from dpr_scale_tpu.retrieve.retrieval import rows_to_ctxs

        if not questions:
            return []
        k = k or self.default_k
        k = min(k, self.max_k, self.num_rows)
        # round the searched k up to a power of two so arbitrary client k
        # values reuse a handful of jitted top-k programs (a novel k would
        # otherwise compile on the serving workers)
        k_searched = min(
            1 << max(0, k - 1).bit_length(), self.max_k, self.num_rows
        )
        self._ensure_workers()
        req = _Pending(list(questions), k_searched)
        self._encode_q.put(req)
        req.event.wait()
        if req.error is not None:
            raise req.error
        # passage fetch on the caller's thread, off the device pipeline
        return rows_to_ctxs(self.passages, req.scores[:, :k], req.rows[:, :k])


class Retriever(_CoalescingPipeline):
    """Dense-tower serving: encode queries with the query tower and search
    the exact/int8/approx MIPS index; thread-safe."""

    def __init__(
        self,
        encoder,  # CorpusEncoder with use_query_tower=True
        tokenizer,
        index,  # MipsIndex
        passages,  # CSVDataset
        **kwargs,
    ):
        super().__init__(passages, **kwargs)
        self.encoder = encoder
        self.tokenizer = tokenizer
        self.index = index

    @property
    def num_rows(self) -> int:
        return self.index.num_rows

    def _encode_chunk(self, texts: List[str]):
        pad_b = self._pad_batch(len(texts))
        padded = texts + [""] * (pad_b - len(texts))
        ids, mask = self.tokenizer(padded)
        # stays a DEVICE array: MipsIndex.search device_puts its queries,
        # so fetching the embeddings to host here would be a wasted
        # device->host->device round trip on the serving critical path
        return self.encoder._encode(self.encoder.params, ids, mask)

    def _search_payload(self, payload, k: int):
        scores, rows = self.index.search(payload, k)
        return np.asarray(scores), np.asarray(rows)


class CitadelRetriever(_CoalescingPipeline):
    """Multi-vector (CITADEL/COIL/ColBERT) serving behind the same
    coalescing pipeline: queries are routed to experts and scored against
    the inverted expert index (host- or device-resident).

    Parity anchor: the reference scores CITADEL queries in a batch loop
    with per-phase latency accounting (reference
    dpr_scale/task/citadel_retrieval_task.py:111-139); serving itself is
    beyond-reference.
    """

    def __init__(
        self,
        model,  # MultiVecEncoder (query side)
        params,
        tokenizer,
        index,  # InvertedExpertIndex or DeviceExpertIndex
        passages,
        topk_route: int = 1,
        add_cls: bool = False,
        **kwargs,
    ):
        super().__init__(passages, **kwargs)
        import jax

        self.tokenizer = tokenizer
        self.index = index
        self._encode_jit = jax.jit(
            lambda ids, mask: model.apply(
                {"params": params},
                ids,
                mask,
                topk=topk_route,
                add_cls=add_cls,
                routing_stats=False,  # training-only (B, vocab) planes
            )
        )

    @property
    def num_rows(self) -> int:
        return self.index.num_docs

    def _encode_chunk(self, texts: List[str]):
        import jax.numpy as jnp

        pad_b = self._pad_batch(len(texts))
        padded = texts + [""] * (pad_b - len(texts))
        ids, mask = self.tokenizer(padded)
        out = self._encode_jit(jnp.asarray(ids), jnp.asarray(mask))
        # the expert index routes on HOST numpy (bucket/slot table lookups),
        # so the fetch is mandatory here — doing it on the encode worker is
        # exactly what overlaps it with the search of the previous group.
        # Pad rows are trimmed before search so they don't cost index work.
        n = len(texts)
        return {
            key: (np.asarray(v)[:n] if np.ndim(v) > 0 else np.asarray(v))
            for key, v in out.items()
        }

    def _search_payload(self, payload, k: int):
        scores, rows = self.index.search(payload, topk=k)
        return np.asarray(scores), np.asarray(rows)


MAX_QUESTIONS_PER_REQUEST = 1024
MAX_BODY_BYTES = 16 * 1024 * 1024


def make_server(
    retriever: Optional[_CoalescingPipeline],
    host: str = "0.0.0.0",
    port: int = 8080,
    citadel_retriever: Optional[CitadelRetriever] = None,
):
    routes = {}
    if retriever is not None:
        routes["/search"] = retriever
    if citadel_retriever is not None:
        routes["/search_citadel"] = citadel_retriever
    if not routes:
        raise ValueError("at least one retriever required")
    primary = retriever if retriever is not None else citadel_retriever

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(
                    200,
                    {
                        "status": "ok",
                        "corpus_rows": primary.num_rows,
                        "towers": sorted(routes),
                    },
                )
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            target = routes.get(self.path)
            if target is None:
                self._reply(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                if length > MAX_BODY_BYTES:
                    self._reply(413, {"error": "request body too large"})
                    return
                req = json.loads(self.rfile.read(length) or b"{}")
                questions = req.get("questions")
                if not isinstance(questions, list) or not questions:
                    self._reply(400, {"error": "questions must be a non-empty list"})
                    return
                if len(questions) > MAX_QUESTIONS_PER_REQUEST:
                    self._reply(
                        400,
                        {
                            "error": f"at most {MAX_QUESTIONS_PER_REQUEST} "
                            "questions per request"
                        },
                    )
                    return
                k = req.get("k")
                if k is not None and (not isinstance(k, int) or k <= 0):
                    self._reply(400, {"error": "k must be a positive integer"})
                    return
                if k is not None and k > target.max_k:
                    self._reply(
                        400, {"error": f"k must be at most {target.max_k}"}
                    )
                    return
                results = target.search([str(q) for q in questions], k)
                self._reply(200, {"results": results})
            except json.JSONDecodeError:
                self._reply(400, {"error": "invalid JSON body"})
            except Exception:
                import traceback

                traceback.print_exc()  # server log; clients get no internals
                self._reply(500, {"error": "internal error"})

    return ThreadingHTTPServer((host, port), Handler)
