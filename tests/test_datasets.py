"""Storage-layer tests (parity model: reference test_datamodule.py:20-57)."""
import json

import numpy as np
import pytest

from dpr_scale_tpu.data import (
    CSVDataset,
    MemoryMappedDataset,
    MultiSourceDataset,
    QueryCSVDataset,
    QueryTSVDataset,
    IDCSVDataset,
    QueryTRECDataset,
    TRECCandidateDataset,
)
from dpr_scale_tpu.utils.native import merge_topk, scan_line_offsets


def test_mmap_lines_match_file(dpr10_jsonl):
    ds = MemoryMappedDataset(dpr10_jsonl)
    with open(dpr10_jsonl, "rb") as f:
        expected = [l.rstrip(b"\n") for l in f]
    assert len(ds) == len(expected) == 10
    for i in range(len(ds)):
        assert ds[i] == expected[i]
    # negative indexing
    assert ds[-1] == expected[-1]
    with pytest.raises(IndexError):
        ds[10]


def test_mmap_no_trailing_newline(tmp_path):
    p = tmp_path / "x.txt"
    p.write_bytes(b"a\nb\nc")  # no trailing newline
    ds = MemoryMappedDataset(str(p), cache_index=False)
    assert len(ds) == 3
    assert ds[2] == b"c"


def test_mmap_offset_cache(dpr10_jsonl, tmp_path):
    import shutil

    p = tmp_path / "copy.jsonl"
    shutil.copy(dpr10_jsonl, p)
    ds1 = MemoryMappedDataset(str(p))
    assert (tmp_path / "copy.jsonl.offsets.npy").exists()
    ds2 = MemoryMappedDataset(str(p))  # loads from cache
    assert np.array_equal(ds1.offsets, ds2.offsets)


def test_scan_offsets_fallback_equivalence(tmp_path):
    data = b"".join(b"line %d\n" % i for i in range(1000)) + b"tail"
    offs = scan_line_offsets(data, len(data))
    # recompute with pure python
    expected = [0]
    for i, ch in enumerate(data):
        if ch == 0x0A and i + 1 < len(data):
            expected.append(i + 1)
    assert offs.tolist() == expected


def test_csv_dataset(dpr10_tsv):
    ds = CSVDataset(dpr10_tsv, cache_index=False)
    assert ds.columns == ["id", "text", "title"]
    assert len(ds) == 10
    row = ds[3]
    assert row == {"id": "3", "text": "passage text 3", "title": "passage title 3"}


def test_query_csv_dataset(tmp_path):
    p = tmp_path / "q.tsv"
    p.write_text("what city\t['NYC', 'Boston']\nwho wrote\t['Me']\n")
    ds = QueryCSVDataset(str(p))
    assert len(ds) == 2
    assert ds[0] == {"question": "what city", "answers": ["NYC", "Boston"]}
    assert ds[1]["answers"] == ["Me"]


def test_query_tsv_dataset(tmp_path):
    p = tmp_path / "q.tsv"
    p.write_text("q1\twhat city\nq2\twho wrote\n")
    ds = QueryTSVDataset(str(p))
    assert ds[1] == {"id": "q2", "question": "who wrote"}


def test_multi_source_dataset(dpr10_jsonl, dpr10_tsv):
    a = MemoryMappedDataset(dpr10_jsonl)
    b = MemoryMappedDataset(dpr10_tsv)
    ms = MultiSourceDataset([a, b], seed=0)
    assert len(ms) == min(len(a), len(b))
    got = {ms[0] for _ in range(20)}
    assert len(got) == 2  # both sources get sampled


def test_id_csv_and_trec_join(tmp_path, dpr10_tsv):
    passages = IDCSVDataset(dpr10_tsv)
    assert passages["4"]["text"] == "passage text 4"

    qp = tmp_path / "queries.tsv"
    qp.write_text("q1\twhat city\nq2\twho wrote\n")
    queries = QueryTRECDataset(str(qp))
    assert queries["q2"]["question"] == "who wrote"

    run = tmp_path / "run.trec"
    run.write_text("q1 Q0 3 1 12.5 run\nq2 Q0 7 2 11.0 run\n")
    ds = TRECCandidateDataset(str(run), queries, passages)
    assert len(ds) == 2
    item = ds[0]
    assert item["qid"] == "q1" and item["docid"] == "3"
    assert item["question"] == "what city"
    assert item["ctx"]["text"] == "passage text 3"
    assert item["rank"] == 1 and item["score"] == 12.5


def test_merge_topk():
    # 3 shards, k=4, descending rows
    s = np.array(
        [[9.0, 7.0, 1.0, 0.5], [8.0, 6.5, 6.0, 0.1], [9.5, 2.0, 1.5, 1.0]],
        dtype=np.float32,
    )
    ids = np.arange(12, dtype=np.int64).reshape(3, 4) * 10
    out_s, out_i = merge_topk(s, ids, 4)
    assert out_s.tolist() == [9.5, 9.0, 8.0, 7.0]
    assert out_i.tolist() == [80, 0, 40, 10]


def test_merge_topk_native_matches_numpy_on_ties():
    """The C++ heap and the numpy stable-sort fallback must agree on TIE
    ordering (equal scores -> smaller shard-major position first), so
    results do not depend on whether the native lib compiled."""
    from dpr_scale_tpu.utils import native as native_mod

    s = np.array(
        [[5.0, 5.0, 1.0], [5.0, 4.0, 2.0], [6.0, 5.0, 0.5]], dtype=np.float32
    )
    ids = (np.arange(9, dtype=np.int64) + 1).reshape(3, 3) * 10
    got_s, got_i = merge_topk(s, ids, 3)

    flat_s = s.reshape(-1)
    flat_i = ids.reshape(-1)
    order = np.argsort(-flat_s, kind="stable")[:3]
    np.testing.assert_array_equal(got_s, flat_s[order])
    np.testing.assert_array_equal(got_i, flat_i[order])
    if native_mod._load() is None:
        import pytest

        pytest.skip("native lib unavailable: only the fallback was exercised")


def test_csv_quoting_runtime_datasets(tmp_path):
    """Runtime TSV datasets must unescape csv-style quoting like the
    reference (dpr.py:94-100) AND survive embedded tabs in quoted fields
    (psgs_w100 is written with QUOTE_MINIMAL)."""
    p = tmp_path / "corpus.tsv"
    p.write_text(
        "id\ttext\ttitle\n"
        '1\t"He said ""hi"" to me"\tplain title\n'
        '2\t"tab\there"\t"quoted ""title"""\n'
        "3\tno quotes\tok\n"
    )
    ds = CSVDataset(str(p), cache_index=False)
    assert ds[0] == {"id": "1", "text": 'He said "hi" to me', "title": "plain title"}
    assert ds[1] == {"id": "2", "text": "tab\there", "title": 'quoted "title"'}
    assert ds[2]["text"] == "no quotes"

    idds = IDCSVDataset(str(p))
    assert idds["2"]["text"] == "tab\there"

    q = tmp_path / "q.tsv"
    q.write_text('"what ""city"""\t[\'NYC\']\n')
    qds = QueryCSVDataset(str(q))
    assert qds[0] == {"question": 'what "city"', "answers": ["NYC"]}


def test_docidx_fetch_quote_safe(tmp_path):
    """Docidx corpus fetch must parse quoted rows with embedded tabs
    (fixes the reference's plain split at dpr_transform.py:175)."""
    from dpr_scale_tpu.data import DPRExampleBuilder

    p = tmp_path / "corpus.tsv"
    p.write_text(
        "id\ttext\ttitle\n"
        '0\t"dummy\ttext"\tdummy title\n'
        '1\t"He said ""hi""\tloudly"\tquoted title\n'
    )
    corpus = MemoryMappedDataset(str(p), header=True)
    row = {"question": "who", "positive_ctxs": [{"docidx": 1}]}
    b = DPRExampleBuilder(num_negative=1, corpus=corpus, use_title=True, sep_token="|")
    ex = b.build(row, "train")
    assert ex.ctx_texts[0] == 'quoted title | He said "hi"\tloudly'
    assert ex.ctx_texts[1] == "dummy title | dummy\ttext"  # dummy docidx 0
