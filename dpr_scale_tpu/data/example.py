"""DPR training-example assembly: positive/negative sampling, dummy padding,
context masking, title concatenation.

Behavior parity with the reference's ``DPRTransform``
(dpr_scale/transforms/dpr_transform.py:61-187):

  * rows are DPR-training JSONL (``positive_ctxs`` / ``hard_negative_ctxs``)
    or DPR-output JSONL (``ctxs`` with ``has_answer`` — split on the fly,
    first ctx used as positive if none has the answer);
  * one positive per question (sampled relevance-weighted when
    ``pos_ctx_sample`` and ``rel_sample``), ``num_negative`` hard negatives
    (sampled when ``neg_ctx_sample`` and more are available, else truncated);
  * per-stage negative counts (train / eval / test);
  * rows short on negatives are padded with dummy contexts
    (``{"text": "0", "title": "0"}`` or ``{"docidx": "0"}`` in docidx mode)
    and ``ctx_mask`` marks the dummies True so the loss ignores them;
  * optional lightweight "docidx" rows resolved against an mmap'd corpus TSV
    (``id \\t text \\t title``);
  * ``scores`` carries per-context teacher scores for distillation.

Differences (deliberate): sampling uses a seeded ``np.random.Generator``
(the reference uses the global numpy RNG, which is irreproducible across
worker processes), and outputs are plain Python lists handed to the
batcher — tokenization is a separate stage so it can be parallelized.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from dpr_scale_tpu.data.datasets import parse_tsv_line
from dpr_scale_tpu.utils.jsonl import json_loads


def maybe_add_title(text: str, title: Optional[str], use_title: bool, sep: str) -> str:
    """``"{title} {sep} {text}"`` concat (reference utils/utils.py:24-28)."""
    if use_title and title is not None:
        return f"{title} {sep} {text}"
    return text


@dataclass
class DPRExample:
    """One assembled question with its context block (positive first)."""

    question: str
    ctx_texts: List[str]
    ctx_is_dummy: List[bool]
    scores: List[float]


class DPRExampleBuilder:
    def __init__(
        self,
        num_positive: int = 1,
        num_negative: int = 7,
        neg_ctx_sample: bool = True,
        pos_ctx_sample: bool = False,
        num_val_negative: int = 7,
        num_test_negative: Optional[int] = None,
        use_title: bool = False,
        sep_token: str = " ",
        rel_sample: bool = False,
        corpus=None,  # MemoryMappedDataset over `id \t text \t title` rows
        seed: int = 0,
    ):
        if num_positive != 1:
            raise ValueError("Only 1 positive per question is supported (loss assumes it).")
        self.num_positive = num_positive
        self.num_negative = num_negative
        self.neg_ctx_sample = neg_ctx_sample
        self.pos_ctx_sample = pos_ctx_sample
        self.num_val_negative = num_val_negative
        self.num_test_negative = (
            num_test_negative if num_test_negative is not None else num_val_negative
        )
        self.use_title = use_title
        self.sep_token = sep_token
        self.rel_sample = rel_sample
        self.corpus = corpus
        self._rng = np.random.default_rng(seed)

    def reseed(self, entropy) -> None:
        """Reset the sampling RNG from an entropy sequence. The
        datamodule calls this with a per-batch key (seed, epoch, stage,
        batch index) so batch content is a pure function of the key —
        fork workers then sample IDENTICALLY to the serial path no
        matter which worker handles which batch (a shared stream would
        be scheduling-dependent and correlated across workers)."""
        self._rng = np.random.default_rng(np.random.SeedSequence(entropy))

    # ------------------------------------------------------------------ #

    def negatives_for_stage(self, stage: str) -> int:
        if stage == "train":
            return self.num_negative
        if stage == "eval":
            return self.num_val_negative
        if stage == "test":
            return self.num_test_negative
        raise ValueError(f"unknown stage {stage!r}")

    def _normalize_row(self, row) -> dict:
        if isinstance(row, (bytes, bytearray, str)):
            row = json_loads(row)
        if "positive_ctxs" not in row and "ctxs" in row:
            pos, neg = [], []
            for ctx in row["ctxs"]:
                (pos if ctx.get("has_answer") else neg).append(ctx)
            if not pos:
                pos.append(row["ctxs"][0])
            row = dict(row, positive_ctxs=pos, hard_negative_ctxs=neg)
        return row

    def _weighted_sample(self, ctxs: List[dict], k: int) -> List[dict]:
        if self.rel_sample:
            rel = np.asarray(
                [float(c.get("relevance", 1.0)) for c in ctxs], dtype=np.float64
            )
            proba = rel / rel.sum()
        else:
            proba = None
        idx = self._rng.choice(len(ctxs), size=k, replace=False, p=proba)
        return [ctxs[i] for i in idx]

    def _ctx_text(self, ctx: dict) -> str:
        if self.corpus is not None and "docidx" in ctx:
            line = self.corpus[int(ctx["docidx"])]
            if isinstance(line, (bytes, bytearray)):
                line = line.decode("utf-8")
            # quote-aware parse: psgs_w100 quotes text fields, which may
            # contain escaped quotes and embedded tabs (reference
            # dpr_transform.py:175 plain-splits and silently mis-shifts)
            fields = parse_tsv_line(line)
            _docid, text, title = fields[0], fields[1], fields[2]
            return maybe_add_title(text, title, self.use_title, self.sep_token)
        text = ctx["text"]
        if not isinstance(text, str):  # token-list form in some corpora
            text = " ".join(text)
        return maybe_add_title(
            text, ctx.get("title"), self.use_title, self.sep_token
        )

    # ------------------------------------------------------------------ #

    def build(self, row, stage: str = "train") -> DPRExample:
        row = self._normalize_row(row)
        num_neg = self.negatives_for_stage(stage)

        pos = row["positive_ctxs"]
        if stage == "train" and self.pos_ctx_sample and len(pos) > self.num_positive:
            pos = self._weighted_sample(pos, self.num_positive)
        else:
            pos = pos[: self.num_positive]
        if len(pos) < self.num_positive:
            raise ValueError(f"Row has no positive context: {row.get('question')!r}")

        neg = row.get("hard_negative_ctxs", [])
        if num_neg > 0:
            if stage == "train" and self.neg_ctx_sample and len(neg) > num_neg:
                neg = self._weighted_sample(neg, num_neg)
            else:
                neg = neg[:num_neg]
        else:
            neg = []

        ctxs = list(pos) + list(neg)
        is_dummy = [False] * len(ctxs)
        n_pad = num_neg - len(neg)
        if n_pad > 0:
            dummy = {"docidx": "0"} if self.corpus is not None else {"text": "0", "title": "0"}
            ctxs.extend([dict(dummy, score=0.0)] * n_pad)
            is_dummy.extend([True] * n_pad)
        assert len(ctxs) == self.num_positive + num_neg

        return DPRExample(
            question=row["question"],
            ctx_texts=[self._ctx_text(c) for c in ctxs],
            ctx_is_dummy=is_dummy,
            scores=[float(c.get("score", 0.0) or 0.0) for c in ctxs],
        )

    def build_batch(self, rows: Sequence, stage: str = "train") -> List[DPRExample]:
        return [self.build(r, stage) for r in rows]
