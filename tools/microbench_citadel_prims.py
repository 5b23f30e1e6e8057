"""Micro-benchmarks for the CITADEL device-index combine primitives.

    python tools/microbench_citadel_prims.py [--docs 8800000] [--batch 64]

Times, device-only (lax.scan-chained, one dispatch per measurement):

  * scatter-add of U (row, doc, val) triples into a (B, NT) fp32
    accumulator, for several U at fixed operand and several operands at
    fixed U — separates the operand-rewrite term from the per-update term;
  * scatter-add into a SMALL (B, ntiles) operand (the tile-ub variant);
  * vmapped segment_max (the current MaxSim inner max) vs a segmented
    associative_scan max over sorted run ids (scan has no scatter);
  * jnp.sort throughput at update scale (the sort-combine alternative).

Used to pick the round-3 redesign of inverted_device._combine_updates
(docs/STATUS.md gap #4: 330 QPS scatter-bound).
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf).astype(jnp.float32) if leaf.ndim else leaf)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--docs", type=int, default=8_800_000)
    p.add_argument("--batch", type=int, default=64)
    args = p.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    B, ND = args.batch, args.docs
    res = {}
    key = jax.random.PRNGKey(0)

    # --- scatter-add scaling ---------------------------------------- #
    def scatter(rows, docs, vals, nd):
        @jax.jit
        def f(rows, docs, vals):
            acc = jnp.zeros((B, nd), jnp.float32)
            return acc.at[rows, docs].add(vals, mode="drop").sum()

        return timed(f, rows, docs, vals)

    for U in (1 << 20, 1 << 22, 1 << 23):
        ks = jax.random.split(jax.random.fold_in(key, U), 3)
        rows = jax.random.randint(ks[0], (U,), 0, B, jnp.int32)
        docs = jax.random.randint(ks[1], (U,), 0, ND, jnp.int32)
        vals = jax.random.uniform(ks[2], (U,), jnp.float32)
        res[f"scatter_full_U{U>>20}M"] = round(scatter(rows, docs, vals, ND), 1)
    for nd in (1 << 13, 1 << 17):
        U = 1 << 22
        ks = jax.random.split(jax.random.fold_in(key, nd), 3)
        rows = jax.random.randint(ks[0], (U,), 0, B, jnp.int32)
        docs = jax.random.randint(ks[1], (U,), 0, nd, jnp.int32)
        vals = jax.random.uniform(ks[2], (U,), jnp.float32)
        res[f"scatter_nd{nd}_U4M"] = round(scatter(rows, docs, vals, nd), 1)

    # --- segment max: scatter-based vs segmented scan ---------------- #
    E, L = 1024, 2048
    ks = jax.random.split(jax.random.fold_in(key, 7), 2)
    scores = jax.random.normal(ks[0], (E, L), jnp.float32)
    # sorted run ids, ~1.3 postings/run
    rid_np = np.sort(np.random.default_rng(0).integers(0, int(L / 1.3), (E, L)), axis=1)
    rid = jnp.asarray(rid_np, jnp.int32)

    @jax.jit
    def seg_scatter(scores, rid):
        return jax.vmap(
            lambda s, r: jax.ops.segment_max(
                s, r, num_segments=L, indices_are_sorted=True
            )
        )(scores, rid).sum()

    res["segmax_scatter_1k_x_2k"] = round(timed(seg_scatter, scores, rid), 1)

    @jax.jit
    def seg_scan(scores, rid):
        # segmented max scan: carry resets where the run id changes
        def comb(a, b):
            (ma, sa), (mb, sb) = a, b
            return jnp.where(sa == sb, jnp.maximum(ma, mb), mb), sb

        m, _ = jax.lax.associative_scan(comb, (scores, rid), axis=1)
        # run END positions carry the full run max
        is_end = jnp.concatenate(
            [rid[:, 1:] != rid[:, :-1], jnp.ones((E, 1), bool)], axis=1
        )
        return jnp.where(is_end, m, 0.0).sum()

    res["segmax_scan_1k_x_2k"] = round(timed(seg_scan, scores, rid), 1)

    # --- sort throughput at update scale ----------------------------- #
    U = 1 << 22
    keys32 = jax.random.randint(jax.random.fold_in(key, 9), (U,), 0, 1 << 30, jnp.int32)
    vals = jax.random.uniform(jax.random.fold_in(key, 10), (U,), jnp.float32)

    @jax.jit
    def sort2(k, v):
        sk, sv = jax.lax.sort((k, v), num_keys=1)
        return sk[0].astype(jnp.float32) + sv.sum()

    res["sort_4M_kv"] = round(timed(sort2, keys32, vals), 1)

    print(json.dumps({"metric": "citadel_prims_ms", "batch": B, **res}))


if __name__ == "__main__":
    main()
