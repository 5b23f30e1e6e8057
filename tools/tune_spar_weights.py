#!/usr/bin/env python3
"""SPAR concat-weight grid search via joint-pool reranking.

Parity: reference spar/spar_weight_tuning.py / dpr_scale/utils/
tune_spar_weights.py — for each candidate weight, rescore the union of the
two models' top-k with the combined score and judge with answer recall@k
(evaluate_retrieval semantics).

Usage:
    python tools/tune_spar_weights.py \
        --queries nq-dev.csv \
        --tsv_passages_path psgs.tsv \
        --ctx_embeddings_dir_1 base/ --ctx_embeddings_dir_2 lambda/ \
        [--weights 0.3 0.5 0.7 1.0 1.43] [--topk 100] [--judge_k 20]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dpr_scale_tpu.data.datasets import CSVDataset, QueryCSVDataset
from dpr_scale_tpu.eval.qa_eval import SimpleTokenizer, has_answers
from dpr_scale_tpu.retrieve.spar import (
    load_dir_embeddings,
    load_query_embeddings,
    tune_spar_weight,
)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--queries", required=True, help="query CSV with answers")
    parser.add_argument("--tsv_passages_path", required=True)
    parser.add_argument("--ctx_embeddings_dir_1", required=True)
    parser.add_argument("--ctx_embeddings_dir_2", required=True)
    parser.add_argument("--query_emb_name", default="query_reps.pkl")
    parser.add_argument(
        "--weights", nargs="+", type=float,
        default=[0.1, 0.3, 0.5, 0.7, 0.9, 1.0, 1.25, 1.43, 2.0],
    )
    parser.add_argument("--topk", type=int, default=100)
    parser.add_argument("--judge_k", type=int, default=20)
    args = parser.parse_args()

    queries = QueryCSVDataset(args.queries)
    questions = [queries[i] for i in range(len(queries))]
    passages = CSVDataset(args.tsv_passages_path)
    tokenizer = SimpleTokenizer()

    q1 = load_query_embeddings(args.ctx_embeddings_dir_1, args.query_emb_name)
    q2 = load_query_embeddings(args.ctx_embeddings_dir_2, args.query_emb_name)
    p1 = load_dir_embeddings(args.ctx_embeddings_dir_1)
    p2 = load_dir_embeddings(args.ctx_embeddings_dir_2)

    def judge(weight, per_query_indices):
        hits = 0
        for qi, rows in enumerate(per_query_indices):
            answers = questions[qi]["answers"]
            for row in rows[: args.judge_k]:
                if has_answers(passages[int(row)]["text"], answers, tokenizer):
                    hits += 1
                    break
        recall = hits / len(per_query_indices)
        print(f"weight={weight}: recall@{args.judge_k}={recall:.4f}")
        return recall

    out = tune_spar_weight(q1, q2, p1, p2, judge, weights=args.weights, topk=args.topk)
    print(f"Best weight: {out['best_weight']}")
    return out


if __name__ == "__main__":
    main()
