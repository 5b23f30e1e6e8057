#!/usr/bin/env python3
"""ICT data with per-document exponentially-decaying query counts.

Behavior parity with reference dpr_scale/utils/prep_wiki_exp.py:95-112:
passages are grouped by document title in corpus order; the i-th passage of
a document yields ``max(1, round(num_sentences / (base * (i + 1))))``
queries — early passages get more queries (domain-matched pretraining).

Usage:
    python tools/prep_wiki_ict_exp.py --file_path psgs_w100.tsv \
        --output_dir_path out/ [--base 2.0] [--dev_pct 0.01]
"""
from __future__ import annotations

import argparse
import collections
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools._text import clean_field, iter_tsv_rows, split_sentences


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--file_path", required=True)
    parser.add_argument("--output_dir_path", required=True)
    parser.add_argument("--base", type=float, default=2.0)
    parser.add_argument("--dev_pct", type=float, default=0.01)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args()

    rng = random.Random(args.seed)
    doc_passages = collections.defaultdict(list)  # title -> [(text, id)]
    # csv-quoting-aware reader: psgs_w100 quotes its text fields
    for i, parts in iter_tsv_rows(args.file_path):
        if len(parts) < 3:
            continue
        doc_passages[clean_field(parts[2])].append((parts[1], parts[0]))
        if args.debug and i > 2000:
            break

    os.makedirs(args.output_dir_path, exist_ok=True)
    train_path = os.path.join(args.output_dir_path, "wiki_ict_exp_train.jsonl")
    dev_path = os.path.join(args.output_dir_path, "wiki_ict_exp_dev.jsonl")
    n = 0
    with open(train_path, "w") as ftrain, open(dev_path, "w") as fdev:
        for title, passages in doc_passages.items():
            for i, (text, pid) in enumerate(passages):
                sents = split_sentences(text)
                if not sents:
                    continue
                num_queries = max(1, round(len(sents) / (args.base * (i + 1))))
                picks = rng.sample(range(len(sents)), min(num_queries, len(sents)))
                for pos in picks:
                    row = {
                        "question": sents[pos],
                        "question_pos": pos,
                        "answers": [],
                        "positive_ctxs": [
                            {
                                "text": " ".join(
                                    s for j, s in enumerate(sents) if j != pos
                                ),
                                "title": title,
                                "score": 1000,
                                "title_score": 1,
                                "passage_id": pid,
                            }
                        ],
                        "hard_negative_ctxs": [],
                    }
                    out = ftrain if rng.random() > args.dev_pct else fdev
                    out.write(json.dumps(row) + "\n")
                    n += 1
    print(f"Wrote {n} ICT-exp examples to {args.output_dir_path}")
    return n


if __name__ == "__main__":
    main()
