#!/usr/bin/env python3
"""TREC run -> relevance-weighted docidx training JSONL.

Parity: reference dragon/data_prep/convert_trec_to_train.py:48-60 — the
top-10 ranked passages become positives, ranks 46-50 hard negatives, run
scores stored as ``relevance`` (for relevance-weighted sampling,
rel_sample); queries without positives are dropped.

Usage:
    python tools/convert_trec_to_train.py --query_tsv_path queries.tsv \
        --trec_in_path run.trec --json_out_path train.jsonl
"""
from __future__ import annotations

import argparse
import collections
import json


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--query_tsv_path", required=True)
    parser.add_argument("--trec_in_path", required=True)
    parser.add_argument("--json_out_path", required=True)
    parser.add_argument("--num_positive", type=int, default=10)
    parser.add_argument("--neg_rank_start", type=int, default=45)
    parser.add_argument("--neg_rank_end", type=int, default=50)
    args = parser.parse_args()

    qid2query = {}
    with open(args.query_tsv_path) as f:
        for line in f:
            qid, query = line.rstrip("\n").split("\t", 1)
            qid2query[qid] = query

    qid2entries = collections.defaultdict(list)
    with open(args.trec_in_path) as f:
        for line in f:
            qid, _, pid, rank, score, _ = line.split()
            if int(rank) > args.neg_rank_end:
                continue
            qid2entries[qid].append((int(rank), pid, float(score)))

    n = 0
    with open(args.json_out_path, "w") as fout:
        for qid, entries in qid2entries.items():
            entries.sort()
            pos = [
                {"docidx": pid, "relevance": score}
                for rank, pid, score in entries[: args.num_positive]
            ]
            neg = [
                {"docidx": pid, "relevance": score}
                for rank, pid, score in entries[args.neg_rank_start : args.neg_rank_end]
            ]
            if not pos:
                continue
            fout.write(
                json.dumps(
                    {
                        "query_id": qid,
                        "question": qid2query[qid],
                        "positive_ctxs": pos,
                        "hard_negative_ctxs": neg,
                    }
                )
                + "\n"
            )
            n += 1
    print(f"Wrote {n} training rows to {args.json_out_path}")


if __name__ == "__main__":
    main()
