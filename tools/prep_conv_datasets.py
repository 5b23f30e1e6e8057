#!/usr/bin/env python3
"""Dialog datasets (DSTC7 / UbuntuV2 / ConvAI2-style) -> DPR training JSONL.

Parity: reference dpr_scale/data_prep/prep_conv_datasets.py:25-60 — the
dialog history becomes the question (speaker-prefixed utterances joined
with newlines), options-for-correct-answers the positives, remaining
next-utterance options the hard negatives.

Usage:
    python tools/prep_conv_datasets.py --in_file_path dstc7.json \
        --out_file_path train.jsonl
"""
from __future__ import annotations

import argparse
import json


def get_question(messages_so_far):
    return " ".join(
        m["speaker"].lstrip("participant_") + ": " + m["utterance"] + "\n"
        for m in messages_so_far
    )


def convert(rows):
    out = []
    skipped = 0
    for row in rows:
        if "options-for-correct-answers" not in row:
            skipped += 1
            continue
        pos_ids = set()
        pos_ctxs = []
        for m in row["options-for-correct-answers"]:
            pos_ctxs.append({"text": m["utterance"], "title": ""})
            pos_ids.add(m["candidate-id"])
        if not pos_ctxs:
            skipped += 1
            continue
        neg_ctxs = [
            {"text": m["utterance"], "title": ""}
            for m in row.get("options-for-next", [])
            if m["candidate-id"] not in pos_ids
        ]
        out.append(
            {
                "question": get_question(row["messages-so-far"]),
                "answers": [],
                "positive_ctxs": pos_ctxs,
                "hard_negative_ctxs": neg_ctxs,
            }
        )
    return out, skipped


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--in_file_path", required=True)
    parser.add_argument("--out_file_path", required=True)
    args = parser.parse_args()

    with open(args.in_file_path) as f:
        rows = json.load(f)
    converted, skipped = convert(rows)
    with open(args.out_file_path, "w") as f:
        for row in converted:
            f.write(json.dumps(row) + "\n")
    print(f"Wrote {len(converted)} rows ({skipped} skipped) to {args.out_file_path}")


if __name__ == "__main__":
    main()
