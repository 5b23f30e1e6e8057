"""Online retrieval serving: query text -> encoded -> exact MIPS -> passages.

The reference is train/eval tooling only ("not a serving system",
SURVEY.md); this module adds the deployment surface the TPU build targets:
a thread-safe retriever handle plus a stdlib HTTP server
(``cli/serve.py``). Queries are padded into power-of-two batch buckets so
the jitted encode+search programs are reused across request sizes.

API:
    POST /search  {"questions": ["...", ...], "k": 10}
      -> {"results": [[{"id","title","text","score"}, ...], ...]}
    GET /healthz  -> {"status": "ok", "corpus_rows": N}
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


class Retriever:
    """Encode queries and search the corpus; thread-safe.

    Concurrent callers COALESCE: requests enqueue to a single worker that
    merges everything pending (bounded by ``coalesce_wait_ms`` after the
    first request) into one padded device batch — under load the TPU sees
    large batches instead of a serialized stream of small ones, which is
    where its throughput lives. Passage materialization (host dict/mmap
    lookups) happens on the REQUEST thread, off the device critical path.
    """

    def __init__(
        self,
        encoder,  # CorpusEncoder with use_query_tower=True
        tokenizer,
        index,  # MipsIndex
        passages,  # CSVDataset
        default_k: int = 10,
        max_batch: int = 64,
        max_k: int = 1000,
        coalesce_wait_ms: float = 2.0,
    ):
        self.encoder = encoder
        self.tokenizer = tokenizer
        self.index = index
        self.passages = passages
        self.default_k = default_k
        self.max_batch = max_batch
        self.max_k = max_k
        self.coalesce_wait_ms = coalesce_wait_ms
        self._lock = threading.Lock()  # device pipeline (worker only)
        self._queue: _queue.Queue = _queue.Queue()
        self._worker_started = False
        self._worker_lock = threading.Lock()

    def _pad_batch(self, n: int) -> int:
        return min(self.max_batch, max(8, 1 << (n - 1).bit_length()))

    # ----------------------------------------------------------------- #

    def _run_pipeline(self, texts: List[str], k_searched: int):
        """Tokenize -> encode -> search, chunked by max_batch. Worker-only."""
        all_s, all_r = [], []
        with self._lock:
            for lo in range(0, len(texts), self.max_batch):
                chunk = texts[lo : lo + self.max_batch]
                pad_b = self._pad_batch(len(chunk))
                padded = chunk + [""] * (pad_b - len(chunk))
                ids, mask = self.tokenizer(padded)
                emb = np.asarray(
                    self.encoder._encode(self.encoder.params, ids, mask),
                    dtype=np.float32,
                )
                scores, rows = self.index.search(emb, k_searched)
                all_s.append(scores[: len(chunk)])
                all_r.append(rows[: len(chunk)])
        return np.concatenate(all_s), np.concatenate(all_r)

    def _worker(self):
        while True:
            first = self._queue.get()
            batch = [first]
            n = len(first.texts)
            deadline = time.perf_counter() + self.coalesce_wait_ms / 1e3
            while n < self.max_batch:
                left = deadline - time.perf_counter()
                if left <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=left)
                except _queue.Empty:
                    break
                batch.append(nxt)
                n += len(nxt.texts)
            texts = [t for r in batch for t in r.texts]
            k_s = max(r.k_searched for r in batch)
            try:
                scores, rows = self._run_pipeline(texts, k_s)
                off = 0
                for r in batch:
                    m = len(r.texts)
                    r.scores, r.rows = scores[off : off + m], rows[off : off + m]
                    off += m
            except Exception as e:  # noqa: BLE001 — propagate to callers
                if len(batch) == 1:
                    batch[0].error = e
                else:
                    # isolate the poisoned request: a coalesced neighbor's
                    # bad input must not fail unrelated callers — retry
                    # each request alone (rare path, one pipeline run each)
                    for r in batch:
                        try:
                            r.scores, r.rows = self._run_pipeline(
                                r.texts, r.k_searched
                            )
                        except Exception as e_r:  # noqa: BLE001
                            r.error = e_r
            for r in batch:
                r.event.set()

    def _ensure_worker(self):
        if not self._worker_started:
            with self._worker_lock:
                if not self._worker_started:
                    threading.Thread(target=self._worker, daemon=True).start()
                    self._worker_started = True

    def search(self, questions: List[str], k: Optional[int] = None) -> List[List[dict]]:
        from dpr_scale_tpu.retrieve.retrieval import rows_to_ctxs

        if not questions:
            return []
        k = k or self.default_k
        k = min(k, self.max_k, self.index.num_rows)
        # round the searched k up to a power of two so arbitrary client k
        # values reuse a handful of jitted top-k programs (a novel k would
        # otherwise compile while holding the serving lock)
        k_searched = min(
            1 << max(0, k - 1).bit_length(), self.max_k, self.index.num_rows
        )
        self._ensure_worker()
        req = _Pending(list(questions), k_searched)
        self._queue.put(req)
        req.event.wait()
        if req.error is not None:
            raise req.error
        # passage fetch on the caller's thread, off the device pipeline
        return rows_to_ctxs(self.passages, req.scores[:, :k], req.rows[:, :k])


MAX_QUESTIONS_PER_REQUEST = 1024
MAX_BODY_BYTES = 16 * 1024 * 1024


def make_server(retriever: Retriever, host: str = "0.0.0.0", port: int = 8080):
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
                    {"status": "ok", "corpus_rows": retriever.index.num_rows},
                )
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/search":
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
                if k is not None and k > retriever.max_k:
                    self._reply(
                        400, {"error": f"k must be at most {retriever.max_k}"}
                    )
                    return
                results = retriever.search([str(q) for q in questions], k)
                self._reply(200, {"results": results})
            except json.JSONDecodeError:
                self._reply(400, {"error": "invalid JSON body"})
            except Exception:
                import traceback

                traceback.print_exc()  # server log; clients get no internals
                self._reply(500, {"error": "internal error"})

    return ThreadingHTTPServer((host, port), Handler)
