#!/usr/bin/env python3
"""MS MARCO qidpidtriples -> docidx-format train/dev JSONL.

Parity: reference dragon/data_prep/prep_msmarco_train.py:22-66 — queries
TSV (``qid \\t query``) + triples (``qid \\t pos_pid \\t neg_pid``) become
rows ``{query_id, question, positive_ctxs: [{docidx}], hard_negative_ctxs}``
(MS MARCO pid == corpus row), first ``ratio_of_dev`` of queries to dev.

Usage:
    python tools/prep_msmarco_train.py --query_file_path queries.train.tsv \
        --qidpidtriples_path triples.tsv --json_output_dir out/
"""
from __future__ import annotations

import argparse
import collections
import json
import os


def read_query_tsv(path):
    out = {}
    with open(path) as f:
        for line in f:
            qid, query = line.rstrip("\n").split("\t", 1)
            out[int(qid)] = query
    return out


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--query_file_path", required=True)
    parser.add_argument("--qidpidtriples_path", required=True)
    parser.add_argument("--json_output_dir", required=True)
    parser.add_argument("--ratio_of_dev", type=float, default=0.01)
    args = parser.parse_args()

    qid2query = read_query_tsv(args.query_file_path)
    qid2pos = collections.defaultdict(set)
    qid2neg = collections.defaultdict(set)
    with open(args.qidpidtriples_path) as f:
        for line in f:
            qid, pos_pid, neg_pid = (int(x) for x in line.split("\t"))
            qid2pos[qid].add(pos_pid)
            qid2neg[qid].add(neg_pid)

    os.makedirs(args.json_output_dir, exist_ok=True)
    train_path = os.path.join(args.json_output_dir, "official_train.jsonl")
    dev_path = os.path.join(args.json_output_dir, "dev.jsonl")
    n_dev = int(len(qid2pos) * args.ratio_of_dev)
    with open(train_path, "w") as ftrain, open(dev_path, "w") as fdev:
        for i, qid in enumerate(qid2pos):
            row = {
                "query_id": qid,
                "question": qid2query[qid],
                "positive_ctxs": [{"docidx": p} for p in sorted(qid2pos[qid])],
                "hard_negative_ctxs": [{"docidx": p} for p in sorted(qid2neg[qid])],
            }
            (fdev if i < n_dev else ftrain).write(json.dumps(row) + "\n")
    print(f"Wrote {len(qid2pos) - n_dev} train / {n_dev} dev rows")


if __name__ == "__main__":
    main()
