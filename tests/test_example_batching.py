"""Example-assembly + batching contract tests.

Parity model: reference transform tests (transforms/tests/test_transforms.py)
plus the datamodule batch-shape invariants (test_datamodule.py:82-125).
"""
import numpy as np
import pytest

from dpr_scale_tpu.data import (
    DPRBatcher,
    DPRExampleBuilder,
    HFTokenizer,
    MemoryMappedDataset,
    TextBatcher,
    CSVDataset,
)


@pytest.fixture(scope="module")
def tokenizer(tiny_bert_dir):
    return HFTokenizer(tiny_bert_dir, max_seq_len=16)


def test_builder_pads_and_masks(dpr10_jsonl):
    ds = MemoryMappedDataset(dpr10_jsonl)
    builder = DPRExampleBuilder(num_negative=3, seed=0)
    for i in range(len(ds)):
        ex = builder.build(ds[i], stage="train")
        assert len(ex.ctx_texts) == 4  # 1 pos + 3 neg slots
        assert ex.ctx_is_dummy[0] is False  # positive is first and real
        n_real_neg = min(i % 5, 3)
        assert sum(ex.ctx_is_dummy) == 3 - n_real_neg
        # dummies are all trailing
        assert ex.ctx_is_dummy == sorted(ex.ctx_is_dummy)
        assert len(ex.scores) == 4


def test_builder_stage_negative_counts(dpr10_jsonl):
    ds = MemoryMappedDataset(dpr10_jsonl)
    b = DPRExampleBuilder(num_negative=5, num_val_negative=2, num_test_negative=1)
    assert len(b.build(ds[0], "train").ctx_texts) == 6
    assert len(b.build(ds[0], "eval").ctx_texts) == 3
    assert len(b.build(ds[0], "test").ctx_texts) == 2


def test_builder_dpr_output_format():
    row = {
        "question": "who",
        "ctxs": [
            {"title": "a", "text": "t a", "has_answer": False, "score": 1},
            {"title": "b", "text": "t b", "has_answer": True, "score": 2},
        ],
    }
    ex = DPRExampleBuilder(num_negative=2).build(row, "train")
    assert ex.ctx_texts[0] == "t b"  # has_answer ctx becomes the positive
    assert ex.ctx_is_dummy == [False, False, True]

    # no has_answer at all -> first ctx is used as positive
    for c in row["ctxs"]:
        c["has_answer"] = False
    ex = DPRExampleBuilder(num_negative=2).build(row, "train")
    assert ex.ctx_texts[0] == "t a"


def test_builder_title_concat():
    row = {
        "question": "who",
        "positive_ctxs": [{"title": "Ti", "text": "Tx"}],
        "hard_negative_ctxs": [],
    }
    ex = DPRExampleBuilder(num_negative=0, use_title=True, sep_token="[SEP]").build(
        row, "train"
    )
    assert ex.ctx_texts[0] == "Ti [SEP] Tx"


def test_builder_relevance_sampling_prefers_high_relevance():
    row = {
        "question": "who",
        "positive_ctxs": [
            {"title": "lo", "text": "lo", "relevance": 0.001},
            {"title": "hi", "text": "hi", "relevance": 1000.0},
        ],
        "hard_negative_ctxs": [],
    }
    b = DPRExampleBuilder(
        num_negative=0, pos_ctx_sample=True, rel_sample=True, seed=0
    )
    picks = [b.build(row, "train").ctx_texts[0] for _ in range(25)]
    assert picks.count("hi") >= 24


def test_builder_docidx_corpus(dpr10_tsv):
    corpus = MemoryMappedDataset(dpr10_tsv, header=True)
    row = {
        "question": "who",
        "positive_ctxs": [{"docidx": 2}],
        "hard_negative_ctxs": [{"docidx": 5}],
    }
    b = DPRExampleBuilder(num_negative=2, corpus=corpus, use_title=True, sep_token="|")
    ex = b.build(row, "train")
    assert ex.ctx_texts[0] == "passage title 2 | passage text 2"
    assert ex.ctx_texts[1] == "passage title 5 | passage text 5"
    # dummy fetched docidx 0
    assert ex.ctx_texts[2] == "passage title 0 | passage text 0"
    assert ex.ctx_is_dummy == [False, False, True]


@pytest.mark.parametrize("batch_size", [1, 3, 5, 10])
def test_batch_shapes(dpr10_jsonl, tokenizer, batch_size):
    ds = MemoryMappedDataset(dpr10_jsonl)
    builder = DPRExampleBuilder(num_negative=3)
    batcher = DPRBatcher(tokenizer)
    rows = [ds[i] for i in range(batch_size)]
    batch = batcher(builder.build_batch(rows, "train"))
    C = 4
    L = 16
    assert batch["query_ids"].shape == (batch_size, L)
    assert batch["query_mask"].shape == (batch_size, L)
    assert batch["contexts_ids"].shape == (batch_size * C, L)
    assert batch["contexts_mask"].shape == (batch_size * C, L)
    assert batch["pos_ctx_indices"].shape == (batch_size,)
    assert batch["scores"].shape == (batch_size, C)
    assert batch["ctx_mask"].shape == (batch_size * C,)
    # positives are at the head of each question's block
    assert batch["pos_ctx_indices"].tolist() == [i * C for i in range(batch_size)]
    # positives are never masked
    assert not batch["ctx_mask"][batch["pos_ctx_indices"]].any()
    assert batch["query_ids"].dtype == np.int32


def test_tokenizer_fixed_shapes(tokenizer):
    ids, mask = tokenizer(["a b c", "a"])
    assert ids.shape == (2, 16)
    assert mask.shape == (2, 16)
    assert mask[1].sum() < mask[0].sum()
    # deterministic + includes CLS/SEP
    ids2, _ = tokenizer(["a b c", "a"])
    assert np.array_equal(ids, ids2)


def test_text_batcher(dpr10_tsv, tokenizer):
    ds = CSVDataset(dpr10_tsv, cache_index=False)
    tb = TextBatcher(tokenizer, use_title=True)
    rows = [ds[i] for i in range(4)]
    out = tb.passages(rows)
    assert out["input_ids"].shape == (4, 16)
    assert out["corpus_ids"].tolist() == ["0", "1", "2", "3"]


def test_passages_datamodule_workers_match_serial(dpr10_tsv, tokenizer):
    """Fork-worker batch building is bit-identical to serial assembly
    (deterministic path: no sampling)."""
    from dpr_scale_tpu.data.datamodule import PassagesDataModule

    serial = PassagesDataModule(tokenizer, dpr10_tsv, batch_size=4)
    par = PassagesDataModule(tokenizer, dpr10_tsv, batch_size=4, num_workers=2)
    bs = list(serial.batches())
    bp = list(par.batches())
    par.close()
    assert len(bs) == len(bp) == 3
    for a, b in zip(bs, bp):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_dense_datamodule_workers_eval_match_serial(dpr10_jsonl, tokenizer):
    """Eval batches (no sampling) from fork workers match serial exactly;
    train batches keep shape/count invariants."""
    from dpr_scale_tpu.data.datamodule import DenseRetrieverDataModule

    kwargs = dict(
        train_path=dpr10_jsonl, val_path=dpr10_jsonl, batch_size=5,
        num_negative=2, num_val_negative=1, neg_ctx_sample=False, seed=0,
    )
    serial = DenseRetrieverDataModule(tokenizer, **kwargs)
    par = DenseRetrieverDataModule(tokenizer, num_workers=2, **kwargs)
    es = list(serial.val_batches())
    ep = list(par.val_batches())
    assert len(es) == len(ep) == 2
    for a, b in zip(es, ep):
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    ts = list(par.train_batches(epoch=0))
    par.close()
    assert len(ts) == 2
    for t in ts:
        assert t["query_ids"].shape[0] == 5
        assert t["contexts_ids"].shape[0] == 5 * 3  # 1 pos + 2 neg
    # per-batch RNG keys make TRAIN batches (sampling included) identical
    # between fork workers and the serial path — identically-seeded
    # worker streams used to be scheduling-dependent and correlated
    ss = list(serial.train_batches(epoch=0))
    assert len(ss) == len(ts)
    for a, b in zip(ss, ts):
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    # ...and distinct epochs still draw distinct samples
    s1 = list(serial.train_batches(epoch=1))
    assert any(
        not np.array_equal(a["contexts_ids"], b["contexts_ids"])
        for a, b in zip(ss, s1)
    )


def test_prefetch_zero_is_synchronous_passthrough():
    """prefetch(gen, 0) must DISABLE prefetching — queue.Queue(maxsize=0)
    would be an UNBOUNDED queue, buffering the whole epoch in host RAM."""
    from dpr_scale_tpu.utils.prefetch import prefetch

    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield i

    it = prefetch(gen(), 0)
    assert next(it) == 0
    # a background producer would have raced ahead by now; the
    # passthrough produces strictly on demand
    assert len(produced) == 1
    assert list(it) == list(range(1, 100))


def test_tokenizer_length_bucketing(tiny_bert_dir):
    """pad_to_multiple buckets batch length to the next multiple (capped at
    max_seq_len), with token content identical to the fixed-shape prefix —
    the bounded-recompile version of the reference's longest-in-batch
    padding (hf_transform.py:33)."""
    from dpr_scale_tpu.data.tokenize import HFTokenizer

    fixed = HFTokenizer(tiny_bert_dir, max_seq_len=16)
    buck = HFTokenizer(tiny_bert_dir, max_seq_len=16, pad_to_multiple=4)

    short = ["a b", "c d e"]
    ids_f, mask_f = fixed(short)
    ids_b, mask_b = buck(short)
    assert ids_f.shape == (2, 16)
    assert ids_b.shape[1] % 4 == 0 and ids_b.shape[1] < 16
    L = ids_b.shape[1]
    np.testing.assert_array_equal(ids_f[:, :L], ids_b)
    np.testing.assert_array_equal(mask_f[:, :L], mask_b)
    assert (ids_f[:, L:] == fixed.pad_token_id).all()

    # long inputs still cap at max_seq_len
    long = ["a b c d e f g h i j k l m n o p q r s t" * 3]
    ids_long, _ = buck(long)
    assert ids_long.shape[1] == 16

    # worker spec round-trips the bucketing config
    assert HFTokenizer(**buck.spec).pad_to_multiple == 4
