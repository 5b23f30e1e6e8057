#!/usr/bin/env python3
"""BEIR dataset dir -> framework TSV + TREC qrels.

Parity: reference dragon/data_prep/prep_beir_eval.py:13-62 —
``corpus.jsonl`` -> ``collection.tsv`` (id/text/title + header),
``queries.jsonl`` -> ``queries.test.tsv`` (qid \\t text, no header),
``qrels/test.tsv`` -> space-separated ``qid 0 pid rel``.

Usage:
    python tools/prep_beir_eval.py --data_dir beir/scifact/
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools._text import clean_field


def json_to_tsv(in_path, out_path, fields, header=None):
    n = 0
    with open(in_path) as fin, open(out_path, "w") as fout:
        if header is not None:
            fout.write("\t".join(header) + "\n")
        for line in fin:
            row = json.loads(line)
            vals = [
                clean_field(row.get(f, "")) if f in ("text", "title") else str(row.get(f, ""))
                for f in fields
            ]
            fout.write("\t".join(vals) + "\n")
            n += 1
    return n


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data_dir", required=True)
    args = parser.parse_args()
    d = args.data_dir

    n_corpus = json_to_tsv(
        os.path.join(d, "corpus.jsonl"),
        os.path.join(d, "collection.tsv"),
        ["_id", "text", "title"],
        ["id", "text", "title"],
    )
    n_queries = json_to_tsv(
        os.path.join(d, "queries.jsonl"),
        os.path.join(d, "queries.test.tsv"),
        ["_id", "text"],
    )
    out_qrels = os.path.join(d, "qrels.test.tsv")
    with open(os.path.join(d, "qrels", "test.tsv")) as fin, open(out_qrels, "w") as fout:
        for i, line in enumerate(fin):
            if i == 0 or not line.strip():
                continue  # header / trailing blank
            qid, pid, rel = line.rstrip("\r\n").split("\t")[:3]
            fout.write(f"{qid} 0 {pid} {rel}\n")
    print(f"Wrote {n_corpus} passages, {n_queries} queries, qrels -> {d}")


if __name__ == "__main__":
    main()
