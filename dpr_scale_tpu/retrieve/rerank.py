"""Reranking: rescore TREC candidate lists with a trained model.

Parity targets:
  * ``RerankDenseRetrieverTask`` (dpr_scale/task/dpr_rerank_task.py:37-71) —
    rowwise q.ctx dot product over (query, passage) pairs;
  * ``RerankMultiVecRetrieverTask`` (task/citadel_eval_task.py:215-313) —
    pairwise late-interaction scoring;
  * ``RerankCrossEncoderTask`` (task/cross_encoder_eval_task.py:21-57) —
    cross-encoder max-logit scoring of concatenated text.

Outputs: per-shard pickles (``scores/qids/ctx_ids_{shard:04}.pkl``, the
reference's format) and/or a re-sorted TREC run.
"""
from __future__ import annotations

import os
import pickle
from collections import defaultdict
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dpr_scale_tpu.data.tokenize import HFTokenizer
from dpr_scale_tpu.retrieve.writers import write_trec_run
from dpr_scale_tpu.utils.prefetch import prefetch


def _pair_batches(
    dataset, tokenizer: HFTokenizer, batch_size: int, concat: bool, use_title: bool,
    sep: Optional[str] = None,
):
    """Fixed-size batches of candidate pairs; the tail is padded."""
    sep = sep if sep is not None else tokenizer.sep_token

    def ctx_text(item):
        ctx = item["ctx"]
        text = ctx.get("text", "")
        if use_title and ctx.get("title"):
            return f"{ctx['title']} {sep} {text}"
        return text

    def gen():
        buf = []
        for idx in range(len(dataset)):
            buf.append(dataset[idx])
            if len(buf) == batch_size:
                yield buf, 0
                buf = []
        if buf:
            pad = batch_size - len(buf)
            yield buf + [buf[-1]] * pad, pad

    for items, pad in prefetch(gen(), 2):
        questions = [it["question"] for it in items]
        ctxs = [ctx_text(it) for it in items]
        if concat:
            ids, mask = tokenizer(questions, text_pairs=ctxs)
            batch = {"pair_ids": ids, "pair_mask": mask}
        else:
            q_ids, q_mask = tokenizer(questions)
            c_ids, c_mask = tokenizer(ctxs)
            batch = {
                "query_ids": q_ids,
                "query_mask": q_mask,
                "contexts_ids": c_ids,
                "contexts_mask": c_mask,
            }
        yield items, pad, batch


def _run_rerank(
    dataset,
    tokenizer: HFTokenizer,
    score_batch: Callable[[Dict[str, np.ndarray]], jnp.ndarray],
    batch_size: int,
    concat: bool,
    use_title: bool,
    output_trec_path: Optional[str] = None,
    output_pickle_dir: Optional[str] = None,
    shard_id: int = 0,
    run_name: str = "dpr_scale_tpu_rerank",
) -> Dict[str, List]:
    qids: List[str] = []
    docids: List[str] = []
    scores: List[float] = []
    for items, pad, batch in _pair_batches(dataset, tokenizer, batch_size, concat, use_title):
        s = np.asarray(score_batch(batch), dtype=np.float32)
        n = len(items) - pad
        for it, sc in zip(items[:n], s[:n]):
            qids.append(it["qid"])
            docids.append(it["docid"])
            scores.append(float(sc))

    if output_pickle_dir:
        os.makedirs(output_pickle_dir, exist_ok=True)
        for name, payload in (
            ("scores", scores),
            ("qids", qids),
            ("ctx_ids", docids),
        ):
            with open(
                os.path.join(output_pickle_dir, f"{name}_{shard_id:04}.pkl"), "wb"
            ) as f:
                pickle.dump(payload, f, protocol=4)

    if output_trec_path:
        by_qid: Dict[str, List] = defaultdict(list)
        for qid, docid, sc in zip(qids, docids, scores):
            by_qid[qid].append((sc, docid))
        out_qids, out_docs, out_scores = [], [], []
        for qid, entries in by_qid.items():
            entries.sort(key=lambda x: -x[0])
            out_qids.append(qid)
            out_docs.append([d for _s, d in entries])
            out_scores.append([s for s, _d in entries])
        write_trec_run(output_trec_path, out_qids, out_docs, out_scores, run_name)
    return {"qids": qids, "ctx_ids": docids, "scores": scores}


def rerank_dense(model, params, tokenizer, dataset, batch_size=64, use_title=True, **kw):
    """Rowwise dot(q, ctx) (dpr_rerank_task.py:37-42)."""

    @jax.jit
    def score(q_ids, q_mask, c_ids, c_mask):
        q = model.apply({"params": params}, q_ids, q_mask, method=model.encode_query)
        c = model.apply({"params": params}, c_ids, c_mask, method=model.encode_context)
        return jnp.sum(q * c, axis=-1)

    return _run_rerank(
        dataset,
        tokenizer,
        lambda b: score(
            b["query_ids"], b["query_mask"], b["contexts_ids"], b["contexts_mask"]
        ),
        batch_size,
        concat=False,
        use_title=use_title,
        **kw,
    )


def rerank_multivec(
    model, params, tokenizer, dataset, batch_size=16, use_title=True,
    query_topk=1, context_topk=1, add_cls=False, query_pool="sum", **kw,
):
    """Pairwise late-interaction rerank (citadel_eval_task.py:234-265)."""
    from dpr_scale_tpu.train.multivec import dot_score, expert_sim_score

    @jax.jit
    def score(q_ids, q_mask, c_ids, c_mask):
        q_repr = model.apply(
            {"params": params}, q_ids, q_mask, topk=query_topk,
            add_cls=add_cls, routing_stats=False,
        )
        c_repr = model.apply(
            {"params": params}, c_ids, c_mask, topk=context_topk,
            add_cls=add_cls, routing_stats=False,
        )
        s = expert_sim_score(q_repr, c_repr, pairwise=True, query_pool=query_pool)
        if add_cls:
            s = s + dot_score(q_repr["cls_repr"], c_repr["cls_repr"], pairwise=True)
        return s[:, 0]  # M == 1 context per query row

    return _run_rerank(
        dataset,
        tokenizer,
        lambda b: score(
            b["query_ids"], b["query_mask"], b["contexts_ids"], b["contexts_mask"]
        ),
        batch_size,
        concat=False,
        use_title=use_title,
        **kw,
    )


def rerank_cross_encoder(model, params, tokenizer, dataset, batch_size=64, use_title=True, **kw):
    """Concatenated-text scoring, max over class logits
    (cross_encoder_eval_task.py:21-26)."""

    @jax.jit
    def score(ids, mask):
        logits = model.apply({"params": params}, ids, mask)
        return jnp.max(logits, axis=-1)

    return _run_rerank(
        dataset,
        tokenizer,
        lambda b: score(b["pair_ids"], b["pair_mask"]),
        batch_size,
        concat=True,
        use_title=use_title,
        **kw,
    )
