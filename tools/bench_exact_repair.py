"""Exact-mode (fused, verified) retrieval at the 21M north-star scale:
repair-path statistics + recall vs host fp32 ground truth.

The serving rehearsal (tools/bench_21m_rehearsal.py) runs the int8 hybrid
tier; this harness answers the EXACT-mode question at the same scale: the
21M x 768 corpus does not fit HBM as bf16 (32 GB vs 16), so the fused
verified-exact search streams host-resident bf16 blocks through the chip
(MipsIndex(host_resident=True), one upload per block per search, pipelined
against compute) and each block's verification-failure flags route only the
failing queries through the host exact fallback. Reference protocol match:
exact FAISS IndexFlatIP top-100 over the full corpus,
/root/reference/dpr_scale/run_retrieval.py:48-57,97.

Reported: ONE timed 21M sweep (tunnel-bound in this environment; the
projected PCIe-class number models a production host), repair counts
(MipsIndex.last_repair), and top-100 recall / top-1 agreement vs a host
fp32-of-bf16 BLAS ground truth folded while the corpus was generated.

    python tools/bench_exact_repair.py [--rows 20971520]
        [--block-rows 2097152] [--queries 512]
        [--out docs/EXACT_REPAIR_r04.json]
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

DIM = 768


def log(msg, _t=[time.perf_counter()]):
    now = time.perf_counter()
    print(f"[exact +{now - _t[0]:.1f}s] {msg}", file=sys.stderr, flush=True)
    _t[0] = now


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rows", type=int, default=20_971_520)
    ap.add_argument("--block-rows", type=int, default=2_097_152)
    ap.add_argument("--queries", type=int, default=512)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--out", default="docs/EXACT_REPAIR_r04.json")
    args = ap.parse_args()
    assert args.rows % args.block_rows == 0

    from dpr_scale_tpu.index import MipsIndex
    from dpr_scale_tpu.parallel import get_mesh

    mesh = get_mesh()
    B, K = args.queries, args.k
    rng = np.random.default_rng(7)
    queries = rng.standard_normal((B, DIM), dtype=np.float32)

    index = MipsIndex(mesh, method="fused", host_resident=True)

    # ---- build: host bf16 blocks + fp32-of-bf16 BLAS ground truth ----
    t0 = time.perf_counter()
    gt_s = np.full((B, K), -np.inf, np.float32)
    gt_i = np.full((B, K), -1, np.int64)
    n_blocks = args.rows // args.block_rows
    for b in range(n_blocks):
        chunk = rng.standard_normal((args.block_rows, DIM), dtype=np.float32)
        index.add(chunk)  # stores the bf16 copy the device will score
        # GT on the SAME values the index holds: fp32 BLAS over the
        # bf16-rounded block (the device kernel's operands)
        chunk_b = index._blocks[-1][0][: args.block_rows].astype(np.float32)
        s = queries @ chunk_b.T
        part = np.argpartition(-s, K - 1, axis=1)[:, :K]
        ps = np.take_along_axis(s, part, axis=1)
        cat_s = np.concatenate([gt_s, ps], axis=1)
        cat_i = np.concatenate(
            [gt_i, b * args.block_rows + part.astype(np.int64)], axis=1
        )
        top = np.argpartition(-cat_s, K - 1, axis=1)[:, :K]
        gt_s = np.take_along_axis(cat_s, top, axis=1)
        gt_i = np.take_along_axis(cat_i, top, axis=1)
        log(f"block {b + 1}/{n_blocks} built + GT folded")
    t_build = time.perf_counter() - t0

    # ---- one timed exact sweep (block uploads pipelined) ----
    log("exact sweep (includes first-shape compile; tunnel-bound here) ...")
    t0 = time.perf_counter()
    s, i = index.search(queries, k=K)
    t_sweep = time.perf_counter() - t0
    repair = dict(index.last_repair)
    log(f"sweep {t_sweep:.1f}s, repair {repair}")

    # ---- quality vs ground truth ----
    inter = np.array(
        [len(np.intersect1d(i[b, :K], gt_i[b, :K])) for b in range(B)]
    )
    recall = float(inter.mean()) / K
    top1 = float(np.mean(i[:, 0] == gt_i[:, 0]))
    corpus_gb = args.rows * DIM * 2 / 1e9
    upload_gbps = corpus_gb / t_sweep
    # PCIe-class projection: upload at 10 GB/s overlapped with compute;
    # the compute share is the device-resident fused rate (bench.py:
    # ~0.006 s per 2.1M-row block at B=512)
    proj = max(corpus_gb / 10.0, 0.006 * n_blocks)
    out = {
        "metric": f"exact_repair_{args.rows // 1_000_000}M_top{K}",
        "value": round(B / t_sweep, 2),
        "unit": "qps",
        "rows": args.rows,
        "n_blocks": n_blocks,
        "block_rows": args.block_rows,
        "queries": B,
        "t_build_s": round(t_build, 1),
        "t_sweep_s": round(t_sweep, 1),
        "host_upload_gbps": round(upload_gbps, 3),
        "projected_qps_at_10gbps": round(B / proj, 1),
        "repair_block_fail_events": repair["block_fail_events"],
        "repair_queries": repair["queries_repaired"],
        "repair_rate_per_query_block": round(
            repair["block_fail_events"] / (B * n_blocks), 6
        ),
        "recall_at_100_vs_host_fp32": round(recall, 6),
        "top1_agreement_vs_host_fp32": round(top1, 6),
        "note": "sweep is tunnel-bound in this environment (one bf16 "
        "upload per block per search); projected_qps models PCIe hosts",
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
