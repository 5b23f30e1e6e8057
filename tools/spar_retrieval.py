#!/usr/bin/env python3
"""SPAR retrieval CLI: combine base + lexical embedding dirs and search.

Parity: reference spar/spar_retrieval.py:101-222 (see
dpr_scale_tpu.retrieve.spar for the combination semantics).

Usage:
    python tools/spar_retrieval.py \
        --jsonl_dataset_paths nq-test.csv \
        --tsv_passages_path psgs.tsv \
        --ctx_embeddings_dir_1 base_embs/ --ctx_embeddings_dir_2 lambda_embs/ \
        --output_dir out/ --output_filenames nq.json \
        --weights 0.7 [--pooling concat] [--save_embeddings]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dpr_scale_tpu.data.datasets import QueryCSVDataset, QueryTSVDataset
from dpr_scale_tpu.parallel import get_mesh
from dpr_scale_tpu.retrieve.spar import run_spar_retrieval


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--jsonl_dataset_paths", nargs="+", required=True)
    parser.add_argument("--tsv_passages_path", required=True)
    parser.add_argument("--ctx_embeddings_dir_1", required=True)
    parser.add_argument("--ctx_embeddings_dir_2", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--output_filenames", nargs="+", required=True)
    parser.add_argument("--query_emb_names", nargs="+", default=["query_reps.pkl"])
    parser.add_argument("--weights", nargs="+", type=float, default=None)
    parser.add_argument("--pooling", default="concat", choices=["concat", "mean", "sum"])
    parser.add_argument("--save_embeddings", action="store_true")
    parser.add_argument("--topk", type=int, default=100)
    parser.add_argument("--trec_format", action="store_true")
    args = parser.parse_args()

    assert len(args.jsonl_dataset_paths) == len(args.output_filenames) == len(
        args.query_emb_names
    ), "dataset/query-emb/output lists must be the same length"
    if args.weights is not None:
        assert len(args.weights) == len(args.jsonl_dataset_paths), (
            "--weights must give one weight per dataset"
        )

    questions_list = []
    for path in args.jsonl_dataset_paths:
        ds = QueryTSVDataset(path) if args.trec_format else QueryCSVDataset(path)
        questions_list.append([ds[i] for i in range(len(ds))])

    paths = run_spar_retrieval(
        questions_list,
        args.tsv_passages_path,
        args.ctx_embeddings_dir_1,
        args.ctx_embeddings_dir_2,
        args.output_dir,
        args.output_filenames,
        mesh=get_mesh(),
        query_emb_names=args.query_emb_names,
        weights=args.weights,
        save_embeddings=args.save_embeddings,
        topk=args.topk,
        pooling=args.pooling,
    )
    for p in paths:
        print(f"Wrote {p}")


if __name__ == "__main__":
    main()
