"""21M passages DEVICE-RESIDENT on ONE chip: the int4 capacity rehearsal.

The round-4 hybrid rehearsal (tools/bench_21m_rehearsal.py) needs a host
tier for 21M x 768 because int8 (16.1 GB) exceeds one v5e's HBM — and the
host tier is tunnel/PCIe-bound. method="int4" packs the corpus at 4 bits
(8.05 GB), so the ENTIRE north-star corpus (reference protocol:
run_retrieval.py:48-57,97) serves from HBM in one dispatched program with
no host traffic at all.

Measures, one JSON line:
  build      synthesize bf16 chunks on device, fold the exact bf16
             ground truth for a fixed query batch, quantize+pack int4
             into one donated (N, D/2) buffer.
  search     whole-corpus int4 sweep QPS (device-resident timing via
             MipsIndex.benchmark + wall-clock search() incl. dispatch).
  quality    int4 recall@100 vs exact; candidate recall@100 inside the
             top-{4k, 8k} pools — i.e. the recall an exact rerank tier
             (MipsIndex.set_rerank) recovers at 4x / 8x oversampling;
             exact-top1-in-int4-top10; MRR@10 through the TREC writer +
             eval/msmarco.py.

Corpus is random-normal (no data/weights in this environment); for
trained-encoder deltas see tools/bench_lossy_recall.py --methods int4.

Env: I4_ROWS (default 20971520), I4_ITERS (4).
Usage: python tools/bench_21m_int4.py
"""
from __future__ import annotations

import functools
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

DIM = 768
CH = 1_048_576
B, K = 512, 100


def log(msg, _t=[time.perf_counter()]):
    now = time.perf_counter()
    print(f"[i4 +{now - _t[0]:.1f}s] {msg}", file=sys.stderr, flush=True)
    _t[0] = now


def main():
    rows = int(os.environ.get("I4_ROWS", 20_971_520))
    iters = int(os.environ.get("I4_ITERS", 4))
    assert rows % CH == 0

    from dpr_scale_tpu.eval.msmarco import compute_metrics_from_files
    from dpr_scale_tpu.index import MipsIndex
    from dpr_scale_tpu.parallel import get_mesh
    from dpr_scale_tpu.retrieve.writers import write_trec_run

    mesh = get_mesh()
    ndev = mesh.devices.size
    row_sharded = NamedSharding(mesh, P("data", None))
    rng = np.random.default_rng(7)
    queries = rng.standard_normal((B, DIM), dtype=np.float32)
    q_dev = jax.device_put(jnp.asarray(queries), NamedSharding(mesh, P(None, None)))
    stages = {}

    # ---------------- build: one packed block + exact ground truth ------
    t0 = time.perf_counter()
    best_s = jax.device_put(
        jnp.full((B, K), -jnp.inf, jnp.float32), NamedSharding(mesh, P(None, None))
    )
    best_i = jax.device_put(
        jnp.full((B, K), -1, jnp.int32), NamedSharding(mesh, P(None, None))
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def fold_chunk(best_s, best_i, q, chunk, lo):
        s = jax.lax.dot_general(
            q.astype(jnp.bfloat16), chunk,
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        ids = lo + jnp.arange(CH, dtype=jnp.int32)
        s_cat = jnp.concatenate([best_s, s], axis=1)
        i_cat = jnp.concatenate([best_i, jnp.broadcast_to(ids, (B, CH))], axis=1)
        ts, ti = jax.lax.top_k(s_cat, K)
        return ts, jnp.take_along_axis(i_cat, ti, axis=1)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def fill_pack4(q4, sc, chunk, lo):
        cf = chunk.astype(jnp.float32)
        s = jnp.max(jnp.abs(cf), axis=1) / 7.0
        s = jnp.where(s == 0.0, 1.0, s)
        q = jnp.clip(jnp.rint(cf / s[:, None]), -7, 7).astype(jnp.int8)
        half = DIM // 2
        packed = jnp.bitwise_or(
            jnp.left_shift(q[:, half:], 4), jnp.bitwise_and(q[:, :half], 0xF)
        )
        q4 = jax.lax.dynamic_update_slice(q4, packed, (lo, 0))
        sc = jax.lax.dynamic_update_slice(sc, s, (lo,))
        return q4, sc

    synth = jax.jit(
        lambda key: jax.random.normal(key, (CH, DIM), jnp.bfloat16),
        out_shardings=row_sharded,
    )
    q4 = jax.jit(
        lambda: jnp.zeros((rows, DIM // 2), jnp.int8), out_shardings=row_sharded
    )()
    sc = jax.jit(
        lambda: jnp.ones((rows,), jnp.float32),
        out_shardings=NamedSharding(mesh, P("data")),
    )()
    for ci, lo in enumerate(range(0, rows, CH)):
        chunk = synth(jax.random.PRNGKey(ci))
        best_s, best_i = fold_chunk(best_s, best_i, q_dev, chunk, jnp.int32(lo))
        q4, sc = fill_pack4(q4, sc, chunk, jnp.int32(lo))
        if ci % 4 == 3:
            jax.block_until_ready(q4)
            log(f"built {lo + CH:,}/{rows:,} rows")
    jax.block_until_ready(q4)
    index = MipsIndex(mesh, method="int4")
    index.add_device_packed4(q4, sc)
    gt_s = np.asarray(best_s)
    gt_i = np.asarray(best_i).astype(np.int64)
    stages["t_build_s"] = round(time.perf_counter() - t0, 1)
    stages["packed_gb"] = round(rows * (DIM // 2) / 1e9, 2)
    log(f"packed block built: {rows:,} rows = {stages['packed_gb']} GB int4")

    # ---------------- search QPS ----------------
    qbatches = rng.standard_normal((iters, B, DIM), dtype=np.float32)
    qbatches[0] = queries
    res = index.benchmark(qbatches, k=K)  # device-resident timing
    stages["qps_device_resident"] = round(res["qps"], 1)
    stages["sweep_s_per_batch"] = round(res["seconds"] / iters, 3)
    log(f"int4 sweep: {stages['qps_device_resident']} QPS device-resident")
    index.search(queries, k=K)  # warm the search() shape
    t0 = time.perf_counter()
    s4, i4 = index.search(queries, k=K)
    t_wall = time.perf_counter() - t0
    stages["qps_e2e_dispatch"] = round(B / t_wall, 1)

    # ---------------- quality ----------------
    inter = np.array(
        [len(np.intersect1d(i4[b], gt_i[b])) for b in range(B)]
    )
    stages["int4_recall_at_100"] = round(float(inter.mean()) / K, 4)
    top1_kept = np.array([gt_i[b, 0] in i4[b, :10] for b in range(B)])
    stages["exact_top1_in_int4_top10"] = round(float(top1_kept.mean()), 4)
    # rerank ceiling: candidate recall of the deeper pools (== the recall
    # an exact rerank recovers at that oversample, MipsIndex.set_rerank)
    for mult in (4, 8):
        _sd, ideep = index.search(queries, k=mult * K)
        hit = np.array(
            [len(np.intersect1d(ideep[b], gt_i[b])) for b in range(B)]
        )
        stages[f"rerank_recall_at_100_x{mult}"] = round(float(hit.mean()) / K, 4)
        log(f"rerank x{mult}: {stages[f'rerank_recall_at_100_x{mult}']}")

    # ---------------- TREC + eval ----------------
    out_dir = pathlib.Path("/tmp/rehearsal21m_int4")
    out_dir.mkdir(exist_ok=True)
    qids = [f"Q{b}" for b in range(B)]
    write_trec_run(
        str(out_dir / "run.trec"),
        qids,
        [[f"D{d}" for d in i4[b]] for b in range(B)],
        [[float(x) for x in s4[b]] for b in range(B)],
    )
    with open(out_dir / "qrels.tsv", "w") as f:
        for b in range(B):
            f.write(f"Q{b}\t0\tD{gt_i[b, 0]}\t1\n")
    metrics = compute_metrics_from_files(
        str(out_dir / "qrels.tsv"), str(out_dir / "run.trec")
    )
    stages["mrr_at_10_vs_exact_top1"] = round(metrics["MRR @10"], 4)

    result = {
        "metric": f"int4_{rows // 1_000_000}M_device_resident_top{K}_qps",
        "value": stages["qps_device_resident"],
        "unit": "qps",
        "rows": rows,
        "n_chips": ndev,
        **stages,
    }
    print(json.dumps(result))
    # artifact discipline: every headline number gets a docs/ JSON
    # (VERDICT r4 weak #3 — the r04 21M int4 run lived only in prose)
    out_path = os.environ.get("I4_OUT")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
