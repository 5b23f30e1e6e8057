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
