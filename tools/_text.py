"""Shared text helpers for data-prep tools."""
from __future__ import annotations

import re
from typing import List

try:  # pragma: no cover - optional dep (reference uses sentence_splitter)
    from sentence_splitter import split_text_into_sentences as _split

    def split_sentences(text: str) -> List[str]:
        return _split(text, language="en")

except ImportError:
    _SENT_RE = re.compile(r"(?<=[.!?])\s+(?=[A-Z0-9\"'])")

    def split_sentences(text: str) -> List[str]:
        """Regex sentence split (fallback when sentence_splitter is absent):
        break after ./!/? followed by whitespace and an upper-case start."""
        text = text.strip()
        if not text:
            return []
        return [s for s in _SENT_RE.split(text) if s.strip()]


def clean_field(text: str) -> str:
    """Collapse whitespace so text/title never break TSV rows
    (reference prep_beir_eval.py json_to_tsv)."""
    return " ".join(str(text).split())


def iter_tsv_rows(path: str, header_cols=("id",)):
    """Yield (data_row_index, fields) from a TSV, handling csv-style
    quoting (psgs_w100 quotes text fields — reference prep scripts load it
    with pandas read_csv) and an optional header row whose first column is
    in ``header_cols``. data_row_index counts data rows from 0 regardless
    of whether a header exists."""
    import csv

    with open(path, newline="") as f:
        reader = csv.reader(f, delimiter="\t", quotechar='"')
        idx = 0
        for i, fields in enumerate(reader):
            if not fields:
                continue
            if i == 0 and fields[0] in header_cols:
                continue
            yield idx, fields
            idx += 1
