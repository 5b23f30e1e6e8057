"""Serving-mode MIPS comparison: QPS and recall vs exact, one chip.

Synthesizes the bench corpus on device (same protocol as bench.py),
computes exact ground truth with the verified-exact fused pipeline, then
measures each serving mode's throughput and recall@k against it.

Random-normal embeddings are a pessimistic recall proxy: the top-100 of
2.1M iid scores sit in a dense tail where the int8 dequantization error
(~0.014 sigma per element) can reorder neighbors; real encoder
embeddings have much larger top-score margins.

Run: python tools/bench_mips_serving.py [--rows 2097152] [--k 100]
"""
import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=2_097_152)
    parser.add_argument("--dim", type=int, default=768)
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--iters", type=int, default=16)
    parser.add_argument("--k", type=int, default=100)
    parser.add_argument("--methods", nargs="*", default=["approx", "int8"])
    args = parser.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from jax.sharding import NamedSharding, PartitionSpec as P

    from dpr_scale_tpu.index import MipsIndex
    from dpr_scale_tpu.parallel import get_mesh

    mesh = get_mesh()
    row_sharded = NamedSharding(mesh, P("data", None))
    corpus_dev = jax.jit(
        lambda key: jax.random.normal(key, (args.rows, args.dim), jnp.bfloat16),
        out_shardings=row_sharded,
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(corpus_dev)
    rng = np.random.default_rng(0)
    queries = rng.standard_normal(
        (args.iters, args.batch, args.dim), dtype=np.float32
    )

    # ground truth: verified-exact fused pipeline over the same corpus
    exact = MipsIndex(mesh, dtype=jnp.bfloat16, method="fused")
    exact.add_device(corpus_dev)
    truth = []
    for it in range(args.iters):
        _s, i = exact.search(queries[it], k=args.k)
        truth.append(i)
    print("ground truth done", file=sys.stderr)

    out = {}
    for method in args.methods:
        index = MipsIndex(mesh, dtype=jnp.bfloat16, method=method)
        index.add_device(corpus_dev)
        res = index.benchmark(queries, k=args.k)  # device-resident timing
        hits = total = 0
        for it in range(args.iters):
            _s, i = index.search(queries[it], k=args.k)
            for b in range(args.batch):
                hits += len(set(i[b].tolist()) & set(truth[it][b].tolist()))
                total += args.k
        out[method] = {
            "qps": round(res["qps"], 1),
            f"recall@{args.k}": round(hits / total, 5),
        }
        print(f"{method}: {out[method]}", file=sys.stderr)
    print(json.dumps({"rows": args.rows, "k": args.k, **out}))


if __name__ == "__main__":
    main()
