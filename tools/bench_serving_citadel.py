"""End-to-end HTTP serving benchmark for the MULTI-VECTOR (CITADEL) tower:
concurrent clients -> /search_citadel -> QPS + latency percentiles.

    python tools/bench_serving_citadel.py [--docs 500000] [--clients 16]
        [--requests 30] [--qper 4] [--k 10] [--wait-ms 2.0] [--host-index]

Builds a real bert-base MultiVecEncoder query tower (local vocab, random
init — encode cost is what matters), a synthetic inverted expert index
over ``--docs`` documents (device-resident by default), and the production
CitadelRetriever + ThreadingHTTPServer on a loopback port; then fires N
concurrent clients issuing sequential POST /search_citadel requests.
Companion to tools/bench_serving_http.py (dense tower): together they are
the serving menu's HTTP-level numbers for both towers.

The encode->search pipelining in retrieve/server.py is what this measures
under load: tokenize + encode dispatch + routing fetch of coalesced group
N+1 overlap the device search of group N.

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


def build_host_index(num_docs, num_experts, dim, seed=7, postings_per_expert=2000):
    """Synthetic inverted index: skewed postings over experts (a few hot
    token-experts hold most postings, the CITADEL regime)."""
    from dpr_scale_tpu.index.inverted import InvertedExpertIndex, _ExpertPostings

    rng = np.random.default_rng(seed)
    host = InvertedExpertIndex(dim=dim, num_docs=num_docs)
    # zipf-ish sizes, clipped
    sizes = (postings_per_expert * (1.0 / np.arange(1, num_experts + 1) ** 0.7))
    sizes = np.clip(sizes, 32, None).astype(int)
    for e in range(num_experts):
        n = int(sizes[e])
        ids = np.sort(rng.choice(num_docs, size=n, replace=True)).astype(np.int64)
        host.experts[e] = _ExpertPostings(
            ids,
            rng.random(n).astype(np.float32) + 0.1,
            (rng.standard_normal((n, dim)) * 0.3).astype(np.float32),
        )
    return host


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--docs", type=int, default=500_000)
    p.add_argument("--experts", type=int, default=200)
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--requests", type=int, default=30, help="per client")
    p.add_argument("--qper", type=int, default=4)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--wait-ms", type=float, default=2.0)
    p.add_argument("--max-batch", type=int, default=128)
    p.add_argument("--host-index", action="store_true", help="skip the device index")
    args = p.parse_args()

    cpu = bool(os.environ.get("BENCH_SERVE_CPU"))
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
        args.docs = min(args.docs, 4096)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    import dataclasses

    import jax.numpy as jnp

    from dpr_scale_tpu.data.tokenize import HFTokenizer
    from dpr_scale_tpu.index.inverted_device import DeviceExpertIndex
    from dpr_scale_tpu.models import TransformerConfig
    from dpr_scale_tpu.models.multivec import MultiVecEncoder
    from dpr_scale_tpu.retrieve.server import CitadelRetriever, make_server

    vocab_words = [f"w{i}" for i in range(200)]
    tokdir = "/tmp/bench_serve_mv_tok"
    os.makedirs(tokdir, exist_ok=True)
    with open(os.path.join(tokdir, "vocab.txt"), "w") as f:
        f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + vocab_words))
    from transformers import BertTokenizerFast

    BertTokenizerFast(vocab_file=os.path.join(tokdir, "vocab.txt")).save_pretrained(
        tokdir
    )
    tokenizer = HFTokenizer(tokdir, max_seq_len=32)

    dim = 16 if cpu else 128
    cfg = (
        dataclasses.replace(TransformerConfig.tiny(vocab_size=205), dtype=jnp.float32)
        if cpu
        else dataclasses.replace(TransformerConfig.bert_base(), vocab_size=205)
    )
    model = MultiVecEncoder(cfg, variant="citadel", tok_projection_dim=dim)
    dummy = jnp.ones((1, 32), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), dummy, dummy, topk=1)["params"]

    print(f"[bench] building host index: {args.docs} docs ...", flush=True)
    host = build_host_index(args.docs, args.experts, dim)
    index = host
    if not args.host_index:
        index = DeviceExpertIndex.from_host_index(
            host, dtype=jnp.float32 if cpu else jnp.bfloat16
        )
        print("[bench] device index ready", flush=True)

    class _Passages:
        def __len__(self):
            return args.docs

        def __getitem__(self, i):
            return {"id": str(i), "title": "", "text": f"doc {i}"}

    retriever = CitadelRetriever(
        model,
        params,
        tokenizer,
        index,
        _Passages(),
        topk_route=1,
        default_k=args.k,
        max_batch=args.max_batch,
        coalesce_wait_ms=args.wait_ms,
    )
    server = make_server(None, "127.0.0.1", 0, citadel_retriever=retriever)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    import http.client

    def one_request(conn, qs, k):
        body = json.dumps({"questions": qs, "k": k})
        t0 = time.perf_counter()
        conn.request(
            "POST", "/search_citadel", body, {"Content-Type": "application/json"}
        )
        resp = conn.getresponse()
        data = json.loads(resp.read())
        assert resp.status == 200, data
        assert len(data["results"]) == len(qs)
        return time.perf_counter() - t0

    # warm every reachable coalesced encode bucket (pow2 up to max_batch)
    b = 8
    while True:
        retriever.search(["warm up query"] * min(b, args.max_batch), args.k)
        if b >= args.max_batch:
            break
        b *= 2
    warm = http.client.HTTPConnection("127.0.0.1", port)
    one_request(warm, ["warm up query"] * args.qper, args.k)

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
        threading.Thread(target=client, args=(ci,)) for ci in range(args.clients)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    total_q = args.clients * args.requests * args.qper
    lat_ms = np.array(lat) * 1e3
    print(
        json.dumps(
            {
                "metric": f"serving_http_citadel_qps_docs{args.docs}"
                f"_cl{args.clients}_q{args.qper}",
                "value": round(total_q / wall, 1),
                "unit": "questions/s",
                "wall_s": round(wall, 1),
                "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
                "p95_ms": round(float(np.percentile(lat_ms, 95)), 1),
                "device_index": not args.host_index,
                "latency_breakdown": {
                    k: round(v, 2) for k, v in dict(index.latency).items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
