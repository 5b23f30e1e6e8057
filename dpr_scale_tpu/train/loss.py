"""Contrastive in-batch-negative loss + ranking metrics, fully vectorized.

Math parity with the reference task (dpr_scale/task/dpr_task.py):

  * ``similarity_scores`` — dot product ``Q @ C^T`` with masked contexts
    driven to -inf (sim_score, :98-105);
  * ``contrastive_loss`` — temperature-scaled softmax cross-entropy against
    the positive-context index (:209-212). When this runs under jit over a
    batch whose leading axes are sharded on the ``data`` mesh axis, the
    matmul spans the GLOBAL batch and XLA inserts the collectives — the
    explicit all_gather + label-offset + splice-local-tensors dance at
    :163-196 is not needed: labels here are always global positions because
    the batcher lays contexts out question-major and GSPMD keeps the
    logical (global) view;
  * the non-in-batch-negatives path (:198-207) restricts each query to its
    own context block;
  * ``rank_metrics`` — per-query gold rank / MRR / accuracy@k (:235-246)
    as a scores>gold count instead of a sort (O(BC) on the VPU, no sort).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-finite stand-in for -inf: keeps softmax/grad NaN-free


def similarity_scores(
    query_repr: jnp.ndarray,  # (B, D) fp32
    context_repr: jnp.ndarray,  # (C, D) fp32
    ctx_mask: Optional[jnp.ndarray] = None,  # (C,) bool, True = dummy
) -> jnp.ndarray:
    scores = jnp.dot(
        query_repr, context_repr.T, preferred_element_type=jnp.float32
    )  # (B, C)
    if ctx_mask is not None:
        scores = jnp.where(ctx_mask[None, :], NEG_INF, scores)
    return scores


def _block_mask(
    n_query: int, n_ctx: int, pos_ctx_indices: jnp.ndarray, ctx_mask: jnp.ndarray
) -> jnp.ndarray:
    """(B, C) True=masked: everything outside each query's own ctx block,
    plus dummies inside it (reference :198-207)."""
    ctx_per_query = n_ctx // n_query
    ctx_ids = jnp.arange(n_ctx)[None, :]  # (1, C)
    block_lo = pos_ctx_indices[:, None]  # (B, 1)
    in_block = (ctx_ids >= block_lo) & (ctx_ids < block_lo + ctx_per_query)
    return ~in_block | ctx_mask[None, :]


def contrastive_loss(
    query_repr: jnp.ndarray,  # (B, D)
    context_repr: jnp.ndarray,  # (C, D)
    pos_ctx_indices: jnp.ndarray,  # (B,) int — global positive positions
    ctx_mask: jnp.ndarray,  # (C,) bool, True = dummy
    softmax_temperature: float = 1.0,
    in_batch_negatives: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (mean CE loss over queries, the (B, C) score matrix)."""
    if in_batch_negatives:
        masked = similarity_scores(query_repr, context_repr, ctx_mask)
    else:
        scores = similarity_scores(query_repr, context_repr)
        qc_mask = _block_mask(
            query_repr.shape[0], context_repr.shape[0], pos_ctx_indices, ctx_mask
        )
        masked = jnp.where(qc_mask, NEG_INF, scores)
    masked = masked / softmax_temperature
    log_probs = jax.nn.log_softmax(masked, axis=-1)
    gold = jnp.take_along_axis(log_probs, pos_ctx_indices[:, None], axis=1)[:, 0]
    return -jnp.mean(gold), masked


def rank_metrics(
    scores: jnp.ndarray,  # (B, C) masked scores
    pos_ctx_indices: jnp.ndarray,  # (B,)
    k: int = 1,
) -> Dict[str, jnp.ndarray]:
    """Summed (not averaged) rank / mrr / accuracy@k, as the reference
    accumulates them (:248-262); divide by query count at epoch end."""
    gold = jnp.take_along_axis(scores, pos_ctx_indices[:, None], axis=1)  # (B,1)
    # descending rank of the gold context with STABLE-SORT tie semantics:
    # 1 + #strictly-higher + #ties at earlier positions. Strictly-greater
    # alone resolves every tie in the gold's favor — with exact ties
    # (e.g. DPR-output rows whose fallback positive duplicates a
    # negative, identical embeddings) that systematically inflates
    # MRR/accuracy vs the reference's sort-position rank (:235-246).
    pos = jnp.arange(scores.shape[1])[None, :]
    earlier_tie = (scores == gold) & (pos < pos_ctx_indices[:, None])
    rank = 1 + jnp.sum(scores > gold, axis=1) + jnp.sum(earlier_tie, axis=1)
    return {
        "rank_sum": jnp.sum(rank).astype(jnp.float32),
        "mrr_sum": jnp.sum(1.0 / rank.astype(jnp.float32)),
        "hits_at_k": jnp.sum(rank <= k).astype(jnp.float32),
        "query_count": jnp.asarray(scores.shape[0], jnp.float32),
    }
