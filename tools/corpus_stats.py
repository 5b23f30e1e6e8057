#!/usr/bin/env python3
"""Corpus / training-data statistics (reference ccnews_stats.py's role):
row counts, text/title token-length percentiles, positives/negatives per
question — the numbers that drive max_seq_len and negative-count choices.

Usage:
    python tools/corpus_stats.py --path collection.tsv [--format tsv]
    python tools/corpus_stats.py --path train.jsonl --format jsonl
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools._text import iter_tsv_rows


def pct(values):
    if not values:
        return {}
    arr = np.asarray(values)
    return {
        "mean": round(float(arr.mean()), 1),
        "p50": int(np.percentile(arr, 50)),
        "p95": int(np.percentile(arr, 95)),
        "p99": int(np.percentile(arr, 99)),
        "max": int(arr.max()),
    }


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--path", required=True)
    parser.add_argument("--format", choices=["tsv", "jsonl"], default=None)
    parser.add_argument("--limit", type=int, default=0, help="sample first N rows")
    args = parser.parse_args()
    fmt = args.format or ("jsonl" if args.path.endswith(".jsonl") else "tsv")

    stats = {"rows": 0}
    if fmt == "tsv":
        text_lens, title_lens = [], []
        for i, parts in iter_tsv_rows(args.path):
            if args.limit and i >= args.limit:
                break
            stats["rows"] += 1
            if len(parts) > 1:
                text_lens.append(len(parts[1].split()))
            if len(parts) > 2:
                title_lens.append(len(parts[2].split()))
        stats["text_words"] = pct(text_lens)
        stats["title_words"] = pct(title_lens)
    else:
        q_lens, n_pos, n_neg = [], [], []
        with open(args.path) as f:
            for i, line in enumerate(f):
                if args.limit and i >= args.limit:
                    break
                row = json.loads(line)
                stats["rows"] += 1
                q_lens.append(len(str(row.get("question", "")).split()))
                n_pos.append(len(row.get("positive_ctxs", [])))
                n_neg.append(len(row.get("hard_negative_ctxs", [])))
        stats["question_words"] = pct(q_lens)
        stats["positives_per_q"] = pct(n_pos)
        stats["hard_negatives_per_q"] = pct(n_neg)

    print(json.dumps(stats, indent=2))
    return stats


if __name__ == "__main__":
    main()
