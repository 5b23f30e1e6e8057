#!/usr/bin/env python3
"""CC-NEWS ICT data prep.

Parity: reference dpr_scale/utils/prep_ccnews.py — news articles (JSONL
with ``text``/``title`` or ``maintext``) become ICT pairs: a random
sentence is the query, the remaining sentences the positive. ``--bfs``
(body-first-sentence variant, reference get_bfs_data :83-93): the query is
a random sentence of the FIRST chunk, the positive is a random LATER chunk.

Usage:
    python tools/prep_ccnews_ict.py --file_path ccnews.jsonl \
        --output_dir_path out/ [--bfs] [--max_sents 10] [--chunk_sents 5]
"""
from __future__ import annotations

import argparse
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools._text import clean_field, split_sentences


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--file_path", required=True)
    parser.add_argument("--output_dir_path", required=True)
    parser.add_argument(
        "--bfs", action="store_true",
        help="query from the first chunk, a random later chunk as positive",
    )
    parser.add_argument("--max_sents", type=int, default=10)
    parser.add_argument("--chunk_sents", type=int, default=5)
    parser.add_argument("--dev_pct", type=float, default=0.01)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args()

    rng = random.Random(args.seed)
    os.makedirs(args.output_dir_path, exist_ok=True)
    suffix = "bfs" if args.bfs else "ict"
    train_path = os.path.join(args.output_dir_path, f"ccnews_{suffix}_train.jsonl")
    dev_path = os.path.join(args.output_dir_path, f"ccnews_{suffix}_dev.jsonl")
    n = 0
    with open(args.file_path) as fin, open(train_path, "w") as ftrain, open(
        dev_path, "w"
    ) as fdev:
        for line in fin:
            row = json.loads(line)
            text = row.get("text") or row.get("maintext") or ""
            title = clean_field(row.get("title", ""))
            if args.bfs:
                # reference get_bfs_data: chunk the article; the query is a
                # random sentence of chunk 0, the positive a random chunk>=1
                sents = split_sentences(text)
                chunks = [
                    sents[i : i + args.chunk_sents]
                    for i in range(0, len(sents), args.chunk_sents)
                ]
                if len(chunks) <= 1 or not chunks[0]:
                    continue
                query = chunks[0][rng.randrange(len(chunks[0]))]
                passage = " ".join(chunks[rng.randrange(1, len(chunks))])
            else:
                sents = split_sentences(text)[: args.max_sents]
                if len(sents) < 2:
                    continue
                pos = rng.randrange(len(sents))
                query = sents[pos]
                passage = " ".join(s for i, s in enumerate(sents) if i != pos)
            out_row = {
                "question": query,
                "answers": [],
                "positive_ctxs": [{"text": passage, "title": title, "score": 1000}],
                "hard_negative_ctxs": [],
            }
            out = ftrain if rng.random() > args.dev_pct else fdev
            out.write(json.dumps(out_row) + "\n")
            n += 1
            if args.debug and n >= 20:
                break
    print(f"Wrote {n} CC-NEWS {suffix} examples to {args.output_dir_path}")


if __name__ == "__main__":
    main()
