#!/usr/bin/env python3
"""Wikipedia ICT (inverse cloze task) data prep.

Behavior parity with reference dpr_scale/utils/prep_wiki.py:44-125: from a
psgs_w100-style TSV (``id \\t text \\t title``), pick a random sentence of
each passage as the query and the remaining sentences as the positive
context; split rows into train/dev jsonl by ``--dev_pct``.

Usage:
    python tools/prep_wiki_ict.py --file_path psgs_w100.tsv \
        --output_dir_path out/ [--dev_pct 0.01] [--seed 0] [--debug]
"""
from __future__ import annotations

import argparse
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools._text import clean_field, iter_tsv_rows, split_sentences


def ict_example(passage: str, rng: random.Random):
    sentences = split_sentences(passage)
    if not sentences:
        return None
    pos = rng.randrange(len(sentences))
    query = sentences[pos]
    rest = " ".join(s for i, s in enumerate(sentences) if i != pos)
    return pos, query, rest


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--file_path", required=True)
    parser.add_argument("--output_dir_path", required=True)
    parser.add_argument("--dev_pct", type=float, default=0.01)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args()

    rng = random.Random(args.seed)
    os.makedirs(args.output_dir_path, exist_ok=True)
    train_path = os.path.join(args.output_dir_path, "wiki_ict_train.jsonl")
    dev_path = os.path.join(args.output_dir_path, "wiki_ict_dev.jsonl")
    n = 0
    with open(train_path, "w") as ftrain, open(dev_path, "w") as fdev:
        # csv-quoting-aware reader: psgs_w100 quotes its text fields
        for _i, parts in iter_tsv_rows(args.file_path):
            if len(parts) < 3:
                continue
            passage_id, text, title = parts[0], parts[1], clean_field(parts[2])
            ex = ict_example(text, rng)
            if ex is None:
                continue
            query_pos, query, rest = ex
            row = {
                "question": query,
                "question_pos": query_pos,
                "answers": [],
                "positive_ctxs": [
                    {
                        "text": rest,
                        "title": title,
                        "score": 1000,
                        "title_score": 1,
                        "passage_id": passage_id,
                    }
                ],
                "hard_negative_ctxs": [],
            }
            out = ftrain if rng.random() > args.dev_pct else fdev
            out.write(json.dumps(row) + "\n")
            n += 1
            if args.debug and n >= 20:
                break
    print(f"Wrote {n} ICT examples to {args.output_dir_path}")
    return n


if __name__ == "__main__":
    main()
