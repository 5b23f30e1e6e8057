#!/usr/bin/env python3
"""Cropped-sentence query augmentation (DRAGON).

Parity: reference dragon/data_prep/crop_sentence.py — sample random
sentences from corpus passages as synthetic queries; each query's source
passage is its positive (docidx format). Used to build DRAGON's 28.5M
augmented queries.

Usage:
    python tools/crop_sentence.py --corpus_tsv_path collection.tsv \
        --json_out_path cropped.jsonl [--queries_per_doc 1]
"""
from __future__ import annotations

import argparse
import json
import random
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools._text import iter_tsv_rows, split_sentences


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--corpus_tsv_path", required=True)
    parser.add_argument("--json_out_path", required=True)
    parser.add_argument("--queries_per_doc", type=int, default=1)
    parser.add_argument("--min_words", type=int, default=3)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    rng = random.Random(args.seed)
    n = 0
    with open(args.json_out_path, "w") as fout:
        # docidx counts DATA rows from 0 whether or not a header exists
        for docidx, parts in iter_tsv_rows(args.corpus_tsv_path):
            if len(parts) < 2:
                continue
            sents = [
                s for s in split_sentences(parts[1]) if len(s.split()) >= args.min_words
            ]
            if not sents:
                continue
            for s in rng.sample(sents, min(args.queries_per_doc, len(sents))):
                fout.write(
                    json.dumps(
                        {
                            "question": s,
                            "positive_ctxs": [{"docidx": docidx}],
                            "hard_negative_ctxs": [],
                        }
                    )
                    + "\n"
                )
                n += 1
    print(f"Wrote {n} cropped-sentence queries to {args.json_out_path}")


if __name__ == "__main__":
    main()
