#!/usr/bin/env python3
"""MS MARCO (tevatron-style) JSONL -> framework training JSONL.

Parity: reference dpr_scale/utils/prep_msmarco_exp.py — rows with
``query_id/query/positive_passages/negative_passages`` become DPR training
rows (score 1000 / title_score 1 markers preserved), split train/dev by
``--dev_pct``.

Usage:
    python tools/prep_msmarco_jsonl.py --doc_path msmarco_train.jsonl \
        --output_dir_path out/ [--dev_pct 0.01]
"""
from __future__ import annotations

import argparse
import json
import os
import random


def convert_passages(psgs):
    return [
        {
            "text": p["text"],
            "title": p.get("title", ""),
            "score": 1000,
            "title_score": 1,
            "passage_id": p["docid"],
        }
        for p in psgs
    ]


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--doc_path", required=True)
    parser.add_argument("--output_dir_path", required=True)
    parser.add_argument("--dev_pct", type=float, default=0.01)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args()

    rng = random.Random(args.seed)
    os.makedirs(args.output_dir_path, exist_ok=True)
    train_path = os.path.join(args.output_dir_path, "msmarco_exp_train.jsonl")
    dev_path = os.path.join(args.output_dir_path, "msmarco_exp_dev.jsonl")
    n = 0
    with open(args.doc_path) as fin, open(train_path, "w") as ftrain, open(
        dev_path, "w"
    ) as fdev:
        for line in fin:
            item = json.loads(line)
            row = {
                "dataset": "msmarco_passages",
                "question_id": item["query_id"],
                "question": item["query"],
                "answers": [],
                "positive_ctxs": convert_passages(item["positive_passages"]),
                "hard_negative_ctxs": convert_passages(item["negative_passages"]),
            }
            out = ftrain if rng.random() > args.dev_pct else fdev
            out.write(json.dumps(row) + "\n")
            n += 1
            if args.debug and n >= 20:
                break
    print(f"Wrote {n} rows to {args.output_dir_path}")


if __name__ == "__main__":
    main()
