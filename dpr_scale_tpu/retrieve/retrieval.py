"""End-to-end retrieval: query embeddings + embedding shards -> top-k results.

The pipeline of reference run_retrieval.py:60-114 / run_retrieval_fb.py /
run_retrieval_pytorch.py: build the exact-MIPS index over all ``reps_*``
shards, search queries, map global row indices to passages, and emit
DPR JSON and/or TREC runs.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from dpr_scale_tpu.data.datasets import CSVDataset
from dpr_scale_tpu.encode.embeddings import load_embedding_shards
from dpr_scale_tpu.index import MipsIndex
from dpr_scale_tpu.retrieve.writers import write_dpr_json, write_trec_run


def rows_to_ctxs(passages, scores, indices) -> List[List[Dict]]:
    """Join (B, k) scores/global-row-indices with the passage TSV into the
    DPR ctx dicts (shared by retrieve() and the serving Retriever)."""
    results: List[List[Dict]] = []
    for qi in range(scores.shape[0]):
        ctxs = []
        for score, row in zip(scores[qi], indices[qi]):
            if row < 0:
                continue
            p = passages[int(row)]
            ctxs.append(
                {
                    "id": p.get("id", str(int(row))),
                    "title": p.get("title", ""),
                    "text": p.get("text", ""),
                    "score": float(score),
                }
            )
        results.append(ctxs)
    return results


def build_index(
    ctx_embeddings_dir: str,
    mesh,
    dtype=None,
    max_block_rows: int = 2_000_000,
    host_resident: bool = False,
    method: str = "fused",
    index_store: Optional[str] = None,
    device_rows: Optional[int] = None,
) -> MipsIndex:
    """Load every reps_* shard into one MipsIndex (global row order =
    shard order = corpus order, as the reference relies on,
    run_retrieval.py:48-57). ``host_resident`` streams blocks from host
    RAM for corpora larger than total HBM. ``method`` must be passed at
    build time for ``"int8"`` (blocks quantize on add).

    ``index_store`` (int8 only): directory holding the prequantized
    store (see index/store.py). A current store is loaded directly —
    no fp32 pickle read, no requantization, host tiers mmap'd; a stale
    or absent store is (re)built from the shards first. ``device_rows``
    optionally caps the HBM-resident tier; the rest streams from host
    (hybrid >HBM layout)."""
    import jax.numpy as jnp

    index = MipsIndex(
        mesh, dtype=dtype or jnp.bfloat16, host_resident=host_resident,
        method=method,
    )
    if index_store is not None:
        if method != "int8":
            raise ValueError("index_store requires mips_method=int8")
        from dpr_scale_tpu.index.store import (
            build_int8_store,
            load_int8_store,
            store_is_current,
        )

        if not store_is_current(index_store, ctx_embeddings_dir):
            print(f"Building int8 index store at {index_store}")
            build_int8_store(
                ctx_embeddings_dir, index_store, max_block_rows=max_block_rows
            )
        load_int8_store(index, index_store, device_rows=device_rows)
        return index
    shards = load_embedding_shards(ctx_embeddings_dir)
    if not shards:
        raise FileNotFoundError(f"no reps_* shards in {ctx_embeddings_dir}")
    for _name, emb in shards:
        # split oversized shards so device blocks stay HBM-friendly
        for lo in range(0, emb.shape[0], max_block_rows):
            index.add(emb[lo : lo + max_block_rows])
    return index


def retrieve(
    query_embeddings: np.ndarray,  # (B, D)
    questions: Sequence[dict],  # rows with "question"/"answers" or "id"
    passages_path: str,
    ctx_embeddings_dir: str,
    mesh,
    k: int = 100,
    output_json_path: Optional[str] = None,
    output_trec_path: Optional[str] = None,
    query_batch: int = 512,
    ignore_identical_ids: bool = False,
    index: Optional[MipsIndex] = None,
    host_resident: bool = False,
    method: str = "fused",
    int8_query_planes: Optional[int] = None,
    index_store: Optional[str] = None,
    device_rows: Optional[int] = None,
    rerank_oversample: Optional[int] = None,
) -> List[List[Dict]]:
    """Returns per-question context lists; optionally writes output files.

    ``rerank_oversample`` (lossy methods int8/int4/approx only): attach a
    host exact-rerank tier over the original fp32 shard rows — the device
    sweep fetches ``rerank_oversample*k`` candidates and the host rescores
    them exactly (MipsIndex.set_rerank). Rows come from a memmap over the
    shards (ShardRowReader) — no in-RAM fp32 corpus copy."""
    if index is None:
        index = build_index(
            ctx_embeddings_dir, mesh, host_resident=host_resident, method=method,
            index_store=index_store, device_rows=device_rows,
        )
    if rerank_oversample:
        # validate against the INDEX actually searched (a prebuilt index
        # ignores the ``method`` argument entirely)
        if index.method not in ("int8", "int4", "approx"):
            raise ValueError(
                "rerank_oversample requires a lossy mips_method "
                f"(index.method={index.method!r})"
            )
        from dpr_scale_tpu.encode.embeddings import ShardRowReader

        index.set_rerank(
            ShardRowReader(ctx_embeddings_dir), oversample=int(rerank_oversample)
        )
    # applies to prebuilt indexes too (multiset flows reuse one index
    # across query sets); None leaves a prebuilt index's setting alone.
    # A static jit arg, so mutation is safe.
    if int8_query_planes is not None:
        index.int8_query_planes = int(int8_query_planes)
    passages = CSVDataset(passages_path)

    all_scores, all_indices = [], []
    nq = query_embeddings.shape[0]
    if nq == 0:  # empty query set: empty outputs, not a concat crash
        if output_json_path:
            with open(output_json_path, "w") as f:
                json.dump([], f)
        if output_trec_path:
            open(output_trec_path, "w").close()
        return []
    for lo in range(0, nq, query_batch):
        q = query_embeddings[lo : lo + query_batch]
        if q.shape[0] < query_batch:  # keep shapes static for jit reuse
            pad = query_batch - q.shape[0]
            q = np.pad(q, ((0, pad), (0, 0)))
            s, i = index.search(q, k)
            s, i = s[:-pad], i[:-pad]
        else:
            s, i = index.search(q, k)
        all_scores.append(s)
        all_indices.append(i)
    scores = np.concatenate(all_scores, 0)
    indices = np.concatenate(all_indices, 0)

    results = rows_to_ctxs(passages, scores, indices)

    if output_json_path:
        write_dpr_json(output_json_path, questions, results)
    if output_trec_path:
        qids = [str(q.get("id", i)) for i, q in enumerate(questions)]
        write_trec_run(
            output_trec_path,
            qids,
            [[c["id"] for c in ctxs] for ctxs in results],
            [[c["score"] for c in ctxs] for ctxs in results],
            ignore_identical_ids=ignore_identical_ids,
        )
    return results
