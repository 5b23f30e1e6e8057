"""End-to-end HTTP serving benchmark: concurrent clients -> cli-style
server -> QPS + latency percentiles.

    python tools/bench_serving_http.py [--rows 2097152] [--clients 16]
                                       [--requests 40] [--qper 4] [--k 10]
                                       [--method fused] [--wait-ms 2.0]

Builds a device-synthesized corpus (no tunnel upload), a real bert_base
query tower, and the production Retriever + ThreadingHTTPServer on a
loopback port; then fires N concurrent clients each issuing sequential
POST /search requests of ``qper`` questions. Reports end-to-end QPS
(questions/s) and per-request latency p50/p95 — the numbers the
index-level menu in docs/STATUS.md could not claim. The request-
coalescing batcher (retrieve/server.py) is what makes concurrency scale:
pending requests merge into one padded device batch.

CPU smoke run: BENCH_SERVE_CPU=1 uses a tiny encoder + small corpus.
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import threading
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=2_097_152)
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--requests", type=int, default=40, help="per client")
    p.add_argument("--qper", type=int, default=4, help="questions per request")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--method", default="fused")
    p.add_argument("--wait-ms", type=float, default=2.0)
    p.add_argument("--max-batch", type=int, default=256)
    p.add_argument(
        "--ab",
        action="store_true",
        help="within-window A/B of the two-stage encode/search overlap: "
        "serialized (the default) -> pipelined -> serialized again on the "
        "same warmed server (retriever.serialized toggled live), so tunnel "
        "bandwidth drift can't masquerade as a pipelining win. Measured at "
        "2.1M rows / 16 clients: pipelined LOSES 38% (147 vs 235 q/s) — "
        "see retrieve/server.py",
    )
    args = p.parse_args()

    cpu = bool(os.environ.get("BENCH_SERVE_CPU"))
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
        args.rows = min(args.rows, 4096)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    import dataclasses

    import jax.numpy as jnp

    from dpr_scale_tpu.data.tokenize import HFTokenizer
    from dpr_scale_tpu.encode.embeddings import CorpusEncoder
    from dpr_scale_tpu.index import MipsIndex
    from dpr_scale_tpu.models import BiEncoder, TransformerConfig
    from dpr_scale_tpu.parallel import get_mesh
    from dpr_scale_tpu.retrieve.server import Retriever, make_server

    # tokenizer from a locally-built vocab (zero egress: no HF cache)
    tokdir = "/tmp/bench_serve_tok"
    os.makedirs(tokdir, exist_ok=True)
    words = [f"w{i}" for i in range(200)]
    with open(os.path.join(tokdir, "vocab.txt"), "w") as f:
        f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words))
    from transformers import BertTokenizerFast

    BertTokenizerFast(
        vocab_file=os.path.join(tokdir, "vocab.txt")
    ).save_pretrained(tokdir)
    tokenizer = HFTokenizer(tokdir, max_seq_len=32)

    cfg = (
        dataclasses.replace(
            TransformerConfig.tiny(vocab_size=205), dtype=jnp.float32
        )
        if cpu
        else dataclasses.replace(TransformerConfig.bert_base(), vocab_size=205)
    )
    model = BiEncoder(cfg, shared=True)
    dummy = jnp.ones((1, 32), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), dummy, dummy, dummy, dummy)[
        "params"
    ]
    mesh = get_mesh()
    encoder = CorpusEncoder(model, params, mesh, use_query_tower=True)
    dim = cfg.hidden_size
    index = MipsIndex(mesh, dtype=jnp.bfloat16, method=args.method)
    CH = 1 << 19
    for i in range(0, args.rows, CH):
        n = min(CH, args.rows - i)
        index.add_device(
            jax.jit(
                lambda key, n=n: jax.random.normal(key, (n, dim), jnp.bfloat16)
            )(jax.random.PRNGKey(i))
        )

    class _Passages:
        def __len__(self):
            return args.rows

        def __getitem__(self, i):
            return {"id": str(i), "title": "", "text": f"passage {i}"}

    retriever = Retriever(
        encoder, tokenizer, index, _Passages(),
        default_k=args.k, max_batch=args.max_batch,
        coalesce_wait_ms=args.wait_ms,
    )
    server = make_server(retriever, host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    import http.client

    def one_request(conn, qs, k):
        body = json.dumps({"questions": qs, "k": k})
        t0 = time.perf_counter()
        conn.request(
            "POST", "/search", body, {"Content-Type": "application/json"}
        )
        resp = conn.getresponse()
        data = json.loads(resp.read())
        assert resp.status == 200, data
        assert len(data["results"]) == len(qs)
        return time.perf_counter() - t0

    # warm up EVERY reachable coalesced batch bucket (pow2 up to
    # max_batch): under load, pending requests merge into large padded
    # batches, and an uncached bert_base encode compile (tens of seconds
    # over the tunnel) landing inside the timed window would deflate QPS
    # and inflate p95. Direct retriever calls hit each bucket exactly.
    b = 8
    while True:
        retriever.search(["warm up query"] * min(b, args.max_batch), args.k)
        if b >= args.max_batch:
            break
        b *= 2
    warm = http.client.HTTPConnection("127.0.0.1", port)
    one_request(warm, ["warm up query"] * args.qper, args.k)

    def timed_phase():
        lat = []
        lat_lock = threading.Lock()

        def client(ci):
            conn = http.client.HTTPConnection("127.0.0.1", port)
            rng = np.random.default_rng(ci)
            mine = []
            for _ in range(args.requests):
                qs = [
                    " ".join(f"w{rng.integers(0, 200)}" for _ in range(8))
                    for _ in range(args.qper)
                ]
                mine.append(one_request(conn, qs, args.k))
            with lat_lock:
                lat.extend(mine)

        threads = [
            threading.Thread(target=client, args=(ci,))
            for ci in range(args.clients)
        ]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        total_q = args.clients * args.requests * args.qper
        lat_ms = np.array(lat) * 1e3
        return {
            "value": round(total_q / wall, 1),
            "requests_per_s": round(len(lat) / wall, 1),
            "lat_ms_p50": round(float(np.percentile(lat_ms, 50)), 1),
            "lat_ms_p95": round(float(np.percentile(lat_ms, 95)), 1),
        }

    out = {
        "metric": f"serving_http_qps_{args.rows}rows_{args.clients}cli",
        "unit": "questions/s",
        "coalesce_wait_ms": args.wait_ms,
        "method": args.method,
    }
    if args.ab:
        # serialized (default) -> pipelined -> serialized again: the
        # bracketing default phases bound tunnel drift across the overlap
        out.update(timed_phase())
        retriever.serialized = False
        out["pipelined"] = timed_phase()
        retriever.serialized = True
        out["serialized_again"] = timed_phase()
        out["overlap_speedup"] = round(
            out["pipelined"]["value"]
            * 2.0
            / (out["value"] + out["serialized_again"]["value"]),
            3,
        )
    else:
        out.update(timed_phase())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
