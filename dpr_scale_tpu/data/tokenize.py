"""Host-side tokenization (HF fast tokenizers stay on CPU; SURVEY.md §2.9).

Unlike the reference's ``HFTransform`` (dpr_scale/transforms/hf_transform.py:11-37),
which pads to the longest sequence in each batch, we pad to a *fixed*
``max_seq_len`` so every device batch has a static shape — XLA compiles the
encoder exactly once. (Optional length bucketing can be layered on top via
``pad_to_multiple``.)
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


class HFTokenizer:
    """Thin wrapper over a HuggingFace fast tokenizer producing numpy batches."""

    def __init__(
        self,
        model_path: str,
        max_seq_len: int = 256,
        add_special_tokens: bool = True,
    ):
        from transformers import AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(model_path, use_fast=True)
        self.max_seq_len = max_seq_len
        self.add_special_tokens = add_special_tokens

    @property
    def sep_token(self) -> str:
        return self.tokenizer.sep_token or "[SEP]"

    @property
    def pad_token_id(self) -> int:
        return self.tokenizer.pad_token_id or 0

    def __call__(
        self,
        texts: Sequence[str],
        text_pairs: Optional[Sequence[str]] = None,
        max_seq_len: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Tokenize to fixed-shape (ids, attention_mask) int32 arrays."""
        msl = max_seq_len or self.max_seq_len
        enc = self.tokenizer(
            list(texts),
            text_pair=list(text_pairs) if text_pairs is not None else None,
            add_special_tokens=self.add_special_tokens,
            truncation=True,
            max_length=msl,
            padding="max_length",
            return_attention_mask=True,
            return_token_type_ids=False,
            return_tensors="np",
        )
        return (
            enc["input_ids"].astype(np.int32),
            enc["attention_mask"].astype(np.int32),
        )

    def token_ids(self, text: str, max_seq_len: Optional[int] = None) -> List[int]:
        msl = max_seq_len or self.max_seq_len
        return self.tokenizer.encode(
            text,
            add_special_tokens=self.add_special_tokens,
            truncation=True,
            max_length=msl,
        )
