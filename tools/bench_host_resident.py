"""Benchmark: exact MIPS over a corpus LARGER than device HBM.

Streams an 11M x 768 bf16 corpus (16.9 GB > 16 GB v5e HBM) through
``MipsIndex(host_resident=True)`` in 6 blocks, with the next block's
host->device upload pipelined against the current block's fused search.
Reports per-sweep seconds, effective QPS, upload bandwidth, and the
overlap efficiency (sweep time vs pure-upload time).

The axon tunnel caps host->device bandwidth at ~0.05-0.13 GB/s, so the
absolute QPS here is tunnel-bound; the interesting numbers are the
overlap ratio (how much of the upload hides behind compute) and the
projected QPS at PCIe-class bandwidth.

Usage: python tools/bench_host_resident.py [n_blocks]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from dpr_scale_tpu.index import MipsIndex
from dpr_scale_tpu.parallel import get_mesh

BLOCK_ROWS = 14 * 131072  # 1,835,008 rows -> 2.81 GB bf16 per block
DIM = 768
B, K = 512, 100


def log(msg, _t=[time.perf_counter()]):
    now = time.perf_counter()
    print(f"[hostres +{now - _t[0]:.1f}s] {msg}", file=sys.stderr, flush=True)
    _t[0] = now


def main():
    import os

    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    method = os.environ.get("BENCH_MIPS_METHOD", "fused")
    mesh = get_mesh()
    rng = np.random.default_rng(0)
    # one host block reused n times: identical timing, 6x less host RAM/gen
    block_f32 = rng.standard_normal((BLOCK_ROWS, DIM), dtype=np.float32)
    log("block generated")

    index = MipsIndex(mesh, dtype=jnp.bfloat16, method=method, host_resident=True)
    for _ in range(n_blocks):
        index.add(block_f32)
    del block_f32
    bytes_per = 1 if method == "int8" else 2
    total_gb = n_blocks * BLOCK_ROWS * DIM * bytes_per / 1e9
    log(f"index built: {index.num_rows:,} rows, {total_gb:.1f} GB {method if method == 'int8' else 'bf16'} host-resident")

    queries = rng.standard_normal((B, DIM), dtype=np.float32)

    # pure upload bandwidth (one block, forced to completion via tiny fetch)
    emb0 = index._blocks[0][0]
    t0 = time.perf_counter()
    dev = index._materialize(emb0, index._blocks[0][1])
    float(jnp.sum(dev[0][0, :1]))  # force transfer completion (scalar fetch)
    t_upload_block = time.perf_counter() - t0
    del dev
    upload_gbps = emb0.nbytes / 1e9 / t_upload_block
    log(f"pure upload: {t_upload_block:.1f}s/block = {upload_gbps:.3f} GB/s")

    log("sweep 1 (compile + warm)...")
    s, i = index.search(queries, k=K)
    log("sweep 1 done")

    t0 = time.perf_counter()
    s, i = index.search(queries, k=K)
    sweep = time.perf_counter() - t0
    assert s.shape == (B, K) and np.isfinite(s).all()

    upload_total = t_upload_block * n_blocks
    overlap = 1.0 - max(sweep - upload_total, 0.0) / max(upload_total, 1e-9)
    qps = B / sweep
    # projection: at PCIe-class 10 GB/s the upload takes total_gb/10 s,
    # compute ~n_blocks * 34ms (fused search at measured 2.1M-row rate)
    proj_sweep = max(total_gb / 10.0, n_blocks * 0.034)
    result = {
        "metric": f"hostres_exact_top{K}_qps_{index.num_rows // 1_000_000}M_d{DIM}",
        "value": round(qps, 2),
        "unit": "qps",
        "corpus_gb": round(total_gb, 1),
        "sweep_seconds": round(sweep, 1),
        "upload_gbps": round(upload_gbps, 3),
        "upload_share": round(min(upload_total / sweep, 1.0), 3),
        "overlap_efficiency": round(overlap, 3),
        "projected_qps_at_10gbps": round(B / proj_sweep, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
