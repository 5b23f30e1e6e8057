"""Benchmark harness: exact top-100 MIPS over an HBM-resident corpus.

Prints ONE JSON line. The reference publishes no speed numbers
(BASELINE.md); the north-star is exact top-100 over 21M passages at
>10k QPS on a v5e-8. This harness measures per-chip row-throughput on
whatever chips are present and normalizes:

  vs_baseline = (QPS * corpus_rows / n_chips) / (10_000 * 21M / 8)

i.e. 1.0 == on-track for the 8-chip north-star at equal per-chip work.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

CORPUS_ROWS = 2_000_000
DIM = 768
QUERY_BATCH = 512
K = 100
NORTH_STAR_ROWSCORES_PER_CHIP = 10_000 * 21_000_000 / 8


def main():
    from dpr_scale_tpu.index import MipsIndex
    from dpr_scale_tpu.parallel import get_mesh

    mesh = get_mesh()
    n_chips = mesh.devices.size
    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(CORPUS_ROWS, DIM)).astype(np.float32)
    queries = rng.normal(size=(QUERY_BATCH, DIM)).astype(np.float32)

    index = MipsIndex(mesh, dtype=jnp.bfloat16)
    index.add(corpus)

    # warmup / compile
    s, i = index.search(queries, k=K)
    jax.block_until_ready(s)

    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        s, i = index.search(queries, k=K)
    np.asarray(s)  # host sync
    dt = time.perf_counter() - t0

    qps = QUERY_BATCH * iters / dt
    row_scores_per_chip = qps * CORPUS_ROWS / n_chips
    print(
        json.dumps(
            {
                "metric": f"exact_top{K}_qps_{CORPUS_ROWS//1_000_000}M_d{DIM}",
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(
                    row_scores_per_chip / NORTH_STAR_ROWSCORES_PER_CHIP, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
