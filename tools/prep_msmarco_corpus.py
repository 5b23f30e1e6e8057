#!/usr/bin/env python3
"""MS MARCO corpus JSONL -> framework corpus TSV with header.

Parity: reference dpr_scale/utils/prep_msmarco_corpus.py:29-44 — rows
``{docid, text, title}`` become ``id \\t text \\t title`` lines under a
header.

Usage:
    python tools/prep_msmarco_corpus.py --doc_path corpus.jsonl \
        --output_dir_path out/
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools._text import clean_field


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--doc_path", required=True)
    parser.add_argument("--output_dir_path", required=True)
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args()

    os.makedirs(args.output_dir_path, exist_ok=True)
    out_path = os.path.join(args.output_dir_path, "msmarco_corpus.tsv")
    n = 0
    with open(args.doc_path) as fin, open(out_path, "w") as fout:
        fout.write("id\ttext\ttitle\n")
        for line in fin:
            item = json.loads(line)
            fout.write(
                f"{item['docid']}\t{clean_field(item['text'])}\t"
                f"{clean_field(item.get('title', ''))}\n"
            )
            n += 1
            if args.debug and n >= 20:
                break
    print(f"Wrote {n} passages to {out_path}")
    return n


if __name__ == "__main__":
    main()
