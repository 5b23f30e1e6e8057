"""Exact-MIPS index, embedding shard IO, retrieval pipeline, eval harnesses."""
import json
import os
import pickle

import jax.numpy as jnp
import numpy as np
import pytest

from dpr_scale_tpu.encode.embeddings import (
    load_embedding_shard,
    load_embedding_shards,
    save_embedding_shard,
)
from dpr_scale_tpu.eval.msmarco import (
    compute_metrics_from_files,
    load_candidates,
    load_qrels,
    mrr_at_10,
    trec_metrics,
)
from dpr_scale_tpu.eval.qa_eval import SimpleTokenizer, evaluate_retrieval, has_answers
from dpr_scale_tpu.index import MipsIndex, merge_topk_batched
from dpr_scale_tpu.parallel import get_mesh
from dpr_scale_tpu.retrieve.retrieval import retrieve
from dpr_scale_tpu.retrieve.writers import write_dpr_json, write_trec_run


def _np_topk(corpus, queries, k):
    scores = queries @ corpus.T
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


def test_mips_exact_matches_numpy():
    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(1000, 32)).astype(np.float32)
    queries = rng.normal(size=(17, 32)).astype(np.float32)
    index = MipsIndex(get_mesh(8), dtype=jnp.float32)
    index.add(corpus)
    s, i = index.search(queries, k=10)
    es, ei = _np_topk(corpus, queries, 10)
    np.testing.assert_array_equal(i, ei)
    np.testing.assert_allclose(s, es, rtol=1e-5)


def test_mips_multi_block_global_indices():
    rng = np.random.default_rng(1)
    blocks = [rng.normal(size=(n, 16)).astype(np.float32) for n in (300, 150, 500)]
    corpus = np.concatenate(blocks, 0)
    queries = rng.normal(size=(5, 16)).astype(np.float32)
    index = MipsIndex(get_mesh(8), dtype=jnp.float32)
    for b in blocks:
        index.add(b)
    assert index.num_rows == 950
    s, i = index.search(queries, k=25)
    es, ei = _np_topk(corpus, queries, 25)
    np.testing.assert_array_equal(i, ei)
    np.testing.assert_allclose(s, es, rtol=1e-5)


@pytest.mark.parametrize("method", ["groupmax", "fused", "auto", "approx", "exact_sort"])
def test_mips_methods_agree(method):
    rng = np.random.default_rng(3)
    corpus = rng.normal(size=(2000, 16)).astype(np.float32)
    queries = rng.normal(size=(7, 16)).astype(np.float32)
    index = MipsIndex(get_mesh(8), dtype=jnp.float32, method=method)
    index.add(corpus)
    s, i = index.search(queries, k=13)
    es, ei = _np_topk(corpus, queries, 13)
    np.testing.assert_array_equal(i, ei)


def test_mips_verification_counts():
    """The auto-mode exactness check: count_above(tau) == found-above-tau."""
    rng = np.random.default_rng(4)
    corpus = rng.normal(size=(512, 8)).astype(np.float32)
    queries = rng.normal(size=(3, 8)).astype(np.float32)
    index = MipsIndex(get_mesh(8), dtype=jnp.float32)
    index.add(corpus)
    s, i = index.search(queries, k=9)
    tau = s[:, -1]
    scores = queries @ corpus.T
    true_cnt = (scores > tau[:, None]).sum(1)
    cnt = np.asarray(
        index._count_above(*index._blocks[0][:2], jnp.asarray(queries), jnp.asarray(tau))
    )
    np.testing.assert_array_equal(cnt, true_cnt)


def test_mips_pallas_count_matches_scan():
    """auto-mode with the fused Pallas count kernel returns identical
    results to the default XLA-scan verification pass."""
    rng = np.random.default_rng(6)
    corpus = rng.normal(size=(8 * 4096, 16)).astype(np.float32)  # tile-aligned
    queries = rng.normal(size=(8, 16)).astype(np.float32)
    base = MipsIndex(get_mesh(8), dtype=jnp.float32)
    pall = MipsIndex(get_mesh(8), dtype=jnp.float32, use_pallas_count=True)
    base.add(corpus)
    pall.add(corpus)
    assert pall._pallas_count_ok(corpus.shape[0] // 8, 8)
    sb, ib = base.search(queries, k=9)
    sp, ip = pall.search(queries, k=9)
    np.testing.assert_allclose(sb, sp, rtol=1e-6)
    np.testing.assert_array_equal(ib, ip)
    # direct count comparison at an aggressive threshold
    tau = jnp.asarray(sb[:, 4].copy())
    cb = np.asarray(base._count_above(*base._blocks[0][:2], jnp.asarray(queries), tau))
    cp = np.asarray(pall._count_above(*pall._blocks[0][:2], jnp.asarray(queries), tau))
    np.testing.assert_array_equal(cb, cp)


def test_mips_host_resident_matches_device():
    """Host-resident streaming blocks (for corpora > total HBM) return the
    same results as device-resident blocks."""
    rng = np.random.default_rng(5)
    blocks = [rng.normal(size=(n, 16)).astype(np.float32) for n in (400, 300)]
    queries = rng.normal(size=(6, 16)).astype(np.float32)
    dev = MipsIndex(get_mesh(8), dtype=jnp.float32)
    host = MipsIndex(get_mesh(8), dtype=jnp.float32, host_resident=True)
    for b in blocks:
        dev.add(b)
        host.add(b)
    assert isinstance(host._blocks[0][0], np.ndarray)  # stayed on host
    sd, idd = dev.search(queries, k=15)
    sh, ih = host.search(queries, k=15)
    np.testing.assert_allclose(sd, sh, rtol=1e-5)
    np.testing.assert_array_equal(idd, ih)


def test_mips_k_larger_than_corpus():
    rng = np.random.default_rng(2)
    corpus = rng.normal(size=(10, 8)).astype(np.float32)
    index = MipsIndex(get_mesh(8), dtype=jnp.float32)
    index.add(corpus)
    s, i = index.search(rng.normal(size=(3, 8)).astype(np.float32), k=100)
    assert s.shape[1] <= 10  # clamped to corpus size
    assert (i >= 0).all() and (i < 10).all()
    assert len(set(i[0].tolist())) == s.shape[1]  # no duplicates


def test_merge_topk_batched():
    s = np.asarray([[[9, 7], [5, 4]], [[8, 6], [9, 1]]], np.float32)  # (2 shards, 2 q, 2)
    i = np.asarray([[[0, 1], [2, 3]], [[10, 11], [12, 13]]], np.int64)
    ms, mi = merge_topk_batched(s, i, 2)
    assert ms[0].tolist() == [9, 8] and mi[0].tolist() == [0, 10]
    assert ms[1].tolist() == [9, 5] and mi[1].tolist() == [12, 2]


def test_shard_roundtrip_and_torch_interop(tmp_path):
    emb = np.random.default_rng(0).normal(size=(7, 4)).astype(np.float32)
    p1 = save_embedding_shard(str(tmp_path / "reps_0000"), emb, "pickle")
    p2 = save_embedding_shard(str(tmp_path / "reps_0001"), emb + 1, "npy")
    np.testing.assert_array_equal(load_embedding_shard(p1), emb)
    np.testing.assert_array_equal(load_embedding_shard(p2), emb + 1)
    # reference-style torch tensor pickle loads too (dpr_eval_task.py:44-49)
    import torch

    with open(tmp_path / "reps_0002.pkl", "wb") as f:
        torch.save(torch.tensor(emb * 2), f)
    np.testing.assert_allclose(
        load_embedding_shard(str(tmp_path / "reps_0002.pkl")), emb * 2
    )
    shards = load_embedding_shards(str(tmp_path))
    assert [n for n, _ in shards] == ["reps_0000.pkl", "reps_0001.npy", "reps_0002.pkl"]


def test_retrieval_end_to_end(tmp_path):
    """Embedding shards + query vectors -> top-k -> DPR JSON -> QA eval."""
    rng = np.random.default_rng(0)
    n, d = 50, 16
    corpus_emb = rng.normal(size=(n, d)).astype(np.float32)
    # passages TSV
    passages = tmp_path / "passages.tsv"
    with open(passages, "w") as f:
        f.write("id\ttext\ttitle\n")
        for i in range(n):
            f.write(f"{i}\tunique answer {i} text\ttitle {i}\n")
    # two embedding shards
    emb_dir = tmp_path / "emb"
    emb_dir.mkdir()
    save_embedding_shard(str(emb_dir / "reps_0000"), corpus_emb[:30], "pickle")
    save_embedding_shard(str(emb_dir / "reps_0001"), corpus_emb[30:], "npy")

    # queries = exact copies of corpus rows 5, 35, 49
    target = [5, 35, 49]
    q_emb = corpus_emb[target]
    questions = [
        {"question": f"find {t}", "answers": [f"unique answer {t}"], "id": t}
        for t in target
    ]
    out_json = tmp_path / "retrieval.json"
    out_trec = tmp_path / "run.trec"
    results = retrieve(
        q_emb,
        questions,
        str(passages),
        str(emb_dir),
        mesh=get_mesh(8),
        k=10,
        output_json_path=str(out_json),
        output_trec_path=str(out_trec),
        query_batch=2,  # force the padded-tail query path
    )
    assert [r[0]["id"] for r in results] == ["5", "35", "49"]

    # DPR JSON format contract
    data = json.loads(out_json.read_text())
    assert data[0]["question"] == "find 5"
    assert set(data[0]["ctxs"][0]) == {"id", "title", "text", "score"}
    # TREC run contract
    lines = out_trec.read_text().splitlines()
    assert lines[0].split()[:4] == ["5", "Q0", "5", "1"]

    # QA eval harness: top-1 accuracy must be 1.0
    acc = evaluate_retrieval(str(out_json), topk=[1, 5])
    assert np.mean(acc[1]) == 1.0


def test_has_answers_semantics():
    tok = SimpleTokenizer()
    assert has_answers("The Eiffel Tower is in Paris.", ["paris"], tok)
    assert has_answers("The Eiffel Tower is in Paris.", ["eiffel tower"], tok)
    assert not has_answers("The Eiffel Tower is in Paris.", ["London"], tok)
    # accent normalization via NFD
    assert has_answers("Beyoncé sang", ["Beyoncé"], tok)
    # token containment, not substring: "is" inside "Paris" must not match
    assert not has_answers("Paris", ["is"], tok)
    # regex mode
    assert has_answers("born in 1923", [r"19\d\d"], tok, regex=True)


def test_msmarco_eval_metrics(tmp_path):
    qrels = tmp_path / "qrels.tsv"
    qrels.write_text("1\t0\t101\t1\n2\t0\t202\t1\n3\t0\t303\t1\n")
    # candidate TSV qid pid rank
    cand = tmp_path / "cand.tsv"
    cand.write_text(
        "1\t101\t1\n1\t999\t2\n"  # hit at rank 1
        "2\t998\t1\n2\t202\t2\n"  # hit at rank 2
        "3\t997\t1\n3\t996\t2\n"  # miss
    )
    m = compute_metrics_from_files(str(qrels), str(cand))
    np.testing.assert_allclose(m["MRR @10"], (1.0 + 0.5 + 0.0) / 3)
    assert m["QueriesRanked"] == 3
    np.testing.assert_allclose(m["recall_20"], 2 / 3)
    np.testing.assert_allclose(m["recip_rank"], (1.0 + 0.5 + 0.0) / 3)

    # TREC-run candidates load identically
    run = tmp_path / "cand.trec"
    run.write_text(
        "1 Q0 101 1 9.0 x\n1 Q0 999 2 8.0 x\n"
        "2 Q0 998 1 9.0 x\n2 Q0 202 2 8.0 x\n"
        "3 Q0 997 1 9.0 x\n3 Q0 996 2 8.0 x\n"
    )
    assert load_candidates(str(run)) == load_candidates(str(cand))


def test_trec_metrics_ndcg():
    qrels = {"q": {"a": 3, "b": 1}}
    cands = {"q": ["b", "a", "c"]}
    m = trec_metrics(qrels, cands, ndcg_cuts=(3,))
    dcg = 1 / np.log2(2) + 3 / np.log2(3)
    idcg = 3 / np.log2(2) + 1 / np.log2(3)
    np.testing.assert_allclose(m["ndcg_cut_3"], dcg / idcg)


# --------------------------------------------------------------------- #
# fused pipeline (method="fused")


def test_fused_matches_numpy_and_blocks():
    rng = np.random.default_rng(10)
    corpus = rng.normal(size=(5000, 32)).astype(np.float32)
    queries = rng.normal(size=(16, 32)).astype(np.float32)
    index = MipsIndex(get_mesh(8), dtype=jnp.float32, method="fused")
    index.add(corpus)
    s, i = index.search(queries, k=20)
    es, ei = _np_topk(corpus, queries, 20)
    np.testing.assert_array_equal(i, ei)
    np.testing.assert_allclose(s, es, rtol=1e-5)


def test_fused_negative_scores_exclude_pads():
    """All-negative score case: zero-vector pad rows (score 0) must not
    leak into the results (the analytic pad-count correction + candidate
    index mask)."""
    rng = np.random.default_rng(11)
    corpus = -np.abs(rng.normal(size=(1000, 16))).astype(np.float32)
    queries = np.abs(rng.normal(size=(8, 16))).astype(np.float32)
    index = MipsIndex(get_mesh(8), dtype=jnp.float32, method="fused")
    index.add(corpus)
    s, i = index.search(queries, k=15)
    assert (s < 0).all() and (i < 1000).all()
    es, ei = _np_topk(corpus, queries, 15)
    np.testing.assert_allclose(s, es, rtol=1e-5)


def _drop_best_approx(n_drop):
    """A degraded approx_max_k that drops the n_drop best entries —
    simulates the TPU PartialReduce boundary misses deterministically."""
    import jax

    def fake(operand, k, **kwargs):
        kk = min(k + n_drop, operand.shape[-1])
        ts, ti = jax.lax.top_k(operand, kk)
        return ts[..., kk - k:], ti[..., kk - k:]

    return fake


def test_fused_rescue_recovers_missed_candidates(monkeypatch):
    """Force pass-1 to miss each query's true best element; the per-group
    count diff must locate it and the on-device rescue must restore exact
    results without the host fallback."""
    import jax

    rng = np.random.default_rng(12)
    corpus = rng.normal(size=(4096, 16)).astype(np.float32)
    queries = rng.normal(size=(8, 16)).astype(np.float32)
    # 1-device mesh: the degraded approx drops exactly one element per
    # query (the pass runs per shard), landing in at most one group
    index = MipsIndex(get_mesh(1), dtype=jnp.float32, method="fused")
    index.add(corpus)
    monkeypatch.setattr(jax.lax, "approx_max_k", _drop_best_approx(1))
    s, i, not_exact = index._fused_search(*index._blocks[0][:1],
                                          jnp.asarray(queries), 10, 4096)
    assert not np.asarray(not_exact).any()
    es, ei = _np_topk(corpus, queries, 10)
    np.testing.assert_array_equal(np.asarray(i), ei)
    np.testing.assert_allclose(np.asarray(s), es, rtol=1e-5)


def test_fused_rescue_deep_group_recovered(monkeypatch):
    """A group missing MANY elements is rescued whole — no fallback needed
    (whole-group replacement has no per-group depth budget)."""
    import jax

    rng = np.random.default_rng(13)
    # strong cluster: the true top-50 all live in rows 0..63 (one group)
    corpus = rng.normal(size=(2048, 16)).astype(np.float32)
    v = rng.normal(size=(16,)).astype(np.float32)
    corpus[:64] = v[None, :] * np.linspace(20, 10, 64)[:, None]
    queries = np.tile(v, (4, 1)).astype(np.float32)
    index = MipsIndex(get_mesh(8), dtype=jnp.float32, method="fused")
    index.add(corpus)
    monkeypatch.setattr(jax.lax, "approx_max_k", _drop_best_approx(40))
    s, i, not_exact = index._fused_search(*index._blocks[0][:1],
                                          jnp.asarray(queries), 8, 2048)
    assert not np.asarray(not_exact).any()
    es, ei = _np_topk(corpus, queries, 8)
    np.testing.assert_array_equal(np.asarray(i), ei)
    np.testing.assert_allclose(np.asarray(s), es, rtol=2e-5)


def test_fused_too_many_groups_falls_back(monkeypatch):
    """A query with more discrepant groups than the per-query rescue
    budget (RESCUE_GROUPS) is flagged not_exact; search() repairs it with
    the host exact fallback."""
    import jax

    from dpr_scale_tpu.index.mips import RESCUE_GROUPS
    from dpr_scale_tpu.ops.mips_kernels import GROUP_ROWS

    rng = np.random.default_rng(14)
    n_planted = RESCUE_GROUPS + 2
    corpus = rng.normal(size=(8 * 1024, 16)).astype(np.float32)
    v = rng.normal(size=(16,)).astype(np.float32)
    # plant the true top rows one per corpus group
    for j in range(n_planted + 4):
        corpus[j * GROUP_ROWS] = v * (30 - j)
    queries = np.tile(v, (4, 1)).astype(np.float32)
    index = MipsIndex(get_mesh(8), dtype=jnp.float32, method="fused")
    index.add(corpus)
    monkeypatch.setattr(jax.lax, "approx_max_k", _drop_best_approx(n_planted))
    s, i = index.search(queries, k=4)
    es, ei = _np_topk(corpus, queries, 4)
    np.testing.assert_array_equal(i, ei)
    np.testing.assert_allclose(s, es, rtol=2e-5)


def test_fused_group_count_kernel_matches_numpy():
    from dpr_scale_tpu.ops.mips_kernels import GROUP_ROWS, count_above_groups_kernel

    rng = np.random.default_rng(14)
    corpus = rng.normal(size=(8192, 16)).astype(np.float32)
    queries = rng.normal(size=(8, 16)).astype(np.float32)
    tau = rng.normal(size=(8,)).astype(np.float32)
    cnt = np.asarray(
        count_above_groups_kernel(
            jnp.asarray(queries), jnp.asarray(corpus), jnp.asarray(tau),
            interpret=True,
        )
    )
    scores = queries @ corpus.T
    true_cnt = (scores > tau[:, None]).reshape(8, -1, GROUP_ROWS).sum(2)
    np.testing.assert_array_equal(cnt, true_cnt)


def test_groupmax_matches_numpy_and_blocks():
    rng = np.random.default_rng(20)
    blocks = [rng.normal(size=(n, 32)).astype(np.float32) for n in (5000, 700)]
    corpus = np.concatenate(blocks, 0)
    queries = rng.normal(size=(16, 32)).astype(np.float32)
    index = MipsIndex(get_mesh(8), dtype=jnp.float32, method="groupmax")
    for b in blocks:
        index.add(b)
    s, i = index.search(queries, k=20)
    es, ei = _np_topk(corpus, queries, 20)
    np.testing.assert_array_equal(i, ei)
    np.testing.assert_allclose(s, es, rtol=1e-5)


def test_groupmax_negative_scores_exclude_pads():
    """All-negative score regime: zero pad rows outrank every real score
    in the sweep maxima; the tail-group mask plus the rescore's row-range
    mask must keep them out of the results."""
    rng = np.random.default_rng(21)
    corpus = -np.abs(rng.normal(size=(1000, 16))).astype(np.float32)
    queries = np.abs(rng.normal(size=(8, 16))).astype(np.float32)
    index = MipsIndex(get_mesh(8), dtype=jnp.float32, method="groupmax")
    index.add(corpus)
    s, i = index.search(queries, k=15)
    assert (s < 0).all() and (i < 1000).all()
    es, ei = _np_topk(corpus, queries, 15)
    np.testing.assert_allclose(s, es, rtol=1e-5)


def test_groupmax_clustered_top_k_single_group():
    """The whole true top-k inside ONE 8-row group (worst case for
    max-based selection diversity): whole-group rescore recovers all."""
    rng = np.random.default_rng(22)
    corpus = rng.normal(size=(2048, 16)).astype(np.float32)
    v = rng.normal(size=(16,)).astype(np.float32)
    corpus[:8] = v[None, :] * np.linspace(20, 10, 8)[:, None]
    queries = np.tile(v, (4, 1)).astype(np.float32)
    index = MipsIndex(get_mesh(8), dtype=jnp.float32, method="groupmax")
    index.add(corpus)
    s, i = index.search(queries, k=8)
    es, ei = _np_topk(corpus, queries, 8)
    np.testing.assert_array_equal(i, ei)
    np.testing.assert_allclose(s, es, rtol=2e-5)


def test_groupmax_selection_miss_falls_back(monkeypatch):
    """An undersized selection (forced via a negative tier-1 slack) must
    be caught by the full-matrix soundness check and repaired by the
    host exact fallback inside search()."""
    import dpr_scale_tpu.index.mips as mips_mod

    rng = np.random.default_rng(23)
    corpus = rng.normal(size=(2000, 16)).astype(np.float32)
    queries = rng.normal(size=(8, 16)).astype(np.float32)
    monkeypatch.setattr(mips_mod, "GMAX_T1_SLACK", -15)
    index = MipsIndex(get_mesh(8), dtype=jnp.float32, method="groupmax")
    index.add(corpus)
    _s, _i, not_exact = index._groupmax_search(
        index._blocks[0][0], jnp.asarray(queries), 20, 2000
    )
    assert np.asarray(not_exact).any()  # the check fires...
    s, i = index.search(queries, k=20)  # ...and search() repairs exactly
    es, ei = _np_topk(corpus, queries, 20)
    np.testing.assert_array_equal(i, ei)
    np.testing.assert_allclose(s, es, rtol=1e-5)


# --------------------------------------------------------------------- #
# int8 serving mode (method="int8")


def _grid_embeddings(rng, n, d):
    """Rows exactly representable under column-equalized per-row
    symmetric int8: int8-grid integers times a per-row scale, one entry
    pinned to +127 per row (quantizer row scale = generating scale), and
    row 0 pinned to all-(127 * max_scale) so every COLUMN shares the same
    max — the column-equalization scale is then uniform and recovery
    stays lossless."""
    ints = rng.integers(-127, 128, size=(n, d)).astype(np.float32)
    ints[np.arange(n), rng.integers(0, d, size=n)] = 127.0
    scales = rng.uniform(0.005, 0.05, size=(n, 1)).astype(np.float32)
    ints[0] = 127.0
    scales[0] = scales.max()
    return ints * scales


def _dense_rows(scores, idx, n):
    out = np.zeros((scores.shape[0], n), np.float32)
    np.put_along_axis(out, idx.astype(np.int64), scores, axis=1)
    return out


def test_int8_lossless_grid_matches_exact():
    """On int8-grid data the quantization is lossless, so the serving mode
    must reproduce exact search (dense compare — int ties are legal)."""
    rng = np.random.default_rng(30)
    corpus = _grid_embeddings(rng, 3000, 32)
    queries = _grid_embeddings(rng, 9, 32)
    index = MipsIndex(get_mesh(8), method="int8")
    index.add(corpus)
    s, i = index.search(queries, k=11)
    es, ei = _np_topk(corpus, queries, 11)
    np.testing.assert_allclose(
        _dense_rows(s, i, 3000), _dense_rows(es, ei, 3000), rtol=1e-4, atol=1e-6
    )


def test_int8_mesh_parity():
    """mesh(8) and mesh(1) must agree with exact search on grid data
    (SPMD convention: every sharded path is simulated-mesh tested)."""
    rng = np.random.default_rng(31)
    corpus = _grid_embeddings(rng, 2048, 16)
    queries = _grid_embeddings(rng, 8, 16)
    es, ei = _np_topk(corpus, queries, 10)
    dense_e = _dense_rows(es, ei, 2048)
    for ndev in (1, 8):
        index = MipsIndex(get_mesh(ndev), method="int8")
        index.add(corpus)
        s, i = index.search(queries, k=10)
        np.testing.assert_allclose(
            _dense_rows(s, i, 2048), dense_e, rtol=1e-4, atol=1e-6
        )


def test_int8_multi_block_and_recall():
    """Random (non-grid) data: quantization error is real, so assert high
    top-k overlap with exact search and per-score error within the
    per-row quantization bound, across multiple blocks."""
    rng = np.random.default_rng(32)
    blocks = [rng.normal(size=(n, 64)).astype(np.float32) for n in (3000, 1500)]
    corpus = np.concatenate(blocks, 0)
    queries = rng.normal(size=(16, 64)).astype(np.float32)
    index = MipsIndex(get_mesh(8), method="int8")
    for b in blocks:
        index.add(b)
    s, i = index.search(queries, k=10)
    es, ei = _np_topk(corpus, queries, 10)
    overlap = np.mean(
        [len(set(i[b]) & set(ei[b])) / 10.0 for b in range(len(queries))]
    )
    assert overlap >= 0.9, overlap
    # dequantized score error bound: 0.5*(|q| . sc_row) + 0.5*(|row| . qsc)
    exact_at_i = np.take_along_axis(queries @ corpus.T, i.astype(np.int64), 1)
    sc = np.abs(corpus).max(axis=1) / 127.0
    qsc = np.abs(queries).max(axis=1) / 127.0
    bound = (
        0.5 * np.abs(queries).sum(1, keepdims=True) * sc[i]
        + 0.5 * np.abs(corpus[i]).sum(-1) * qsc[:, None]
        + 0.25 * corpus.shape[1] * sc[i] * qsc[:, None]
    )
    assert (np.abs(s - exact_at_i) <= bound + 1e-4).all()


def test_int8_add_device_quantized_matches_add():
    """Chunked pre-quantized blocks == host-quantized add() (the >HBM
    int8 capacity path used by bench.py)."""
    rng = np.random.default_rng(33)
    corpus = _grid_embeddings(rng, 1024, 16)
    queries = _grid_embeddings(rng, 4, 16)
    mesh = get_mesh(8)
    a = MipsIndex(mesh, method="int8")
    a.add(corpus)
    b = MipsIndex(mesh, method="int8")
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    row_sharded = NamedSharding(mesh, P("data", None))
    q8, sc, col = MipsIndex._quantize_int8_host(corpus)
    b.add_device_quantized(
        jax.device_put(jnp.asarray(q8), row_sharded),
        jax.device_put(jnp.asarray(sc, jnp.float32), NamedSharding(mesh, P("data"))),
        col_scales=jax.device_put(
            jnp.asarray(col, jnp.float32), NamedSharding(mesh, P(None))
        ),
    )
    sa, ia = a.search(queries, k=7)
    sb, ib = b.search(queries, k=7)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(sa, sb, rtol=1e-6)


def test_int8_host_resident_matches_device():
    """int8 + host_resident (streamed int8 blocks, half the upload bytes)
    must match the device-resident int8 index exactly."""
    rng = np.random.default_rng(34)
    blocks = [_grid_embeddings(rng, n, 16) for n in (1024, 512)]
    queries = _grid_embeddings(rng, 5, 16)
    dev = MipsIndex(get_mesh(8), method="int8")
    host = MipsIndex(get_mesh(8), method="int8", host_resident=True)
    for b in blocks:
        dev.add(b)
        host.add(b)
    sd, idd = dev.search(queries, k=9)
    sh, ih = host.search(queries, k=9)
    np.testing.assert_array_equal(idd, ih)
    np.testing.assert_allclose(sd, sh, rtol=1e-6)


def test_int8_two_plane_queries_beat_one_plane():
    """int8_query_planes=2 (int16-precision queries over the int8 corpus)
    must not lose to the 1-plane path, and should recover query-side
    quantization error on an anisotropic corpus."""
    rng = np.random.default_rng(35)
    # anisotropic: per-column ranges span 100x (trained-encoder-like)
    col_spread = np.exp(rng.uniform(-2.5, 2.5, size=64)).astype(np.float32)
    corpus = (rng.normal(size=(4096, 64)) * col_spread[None, :]).astype(
        np.float32
    )
    queries = (rng.normal(size=(32, 64)) * col_spread[None, :]).astype(
        np.float32
    )
    es, ei = _np_topk(corpus, queries, 10)

    # deliberately ONE index mutated between searches: the planes flag is
    # a static jit arg, so flipping it on a live index must recompile
    # rather than silently reuse the planes=1 program (regression for the
    # identity-hashed-self jit cache trap)
    index = MipsIndex(get_mesh(8), method="int8")
    index.add(corpus)

    def run(planes):
        index.int8_query_planes = planes
        s, i = index.search(queries, k=10)
        return np.mean(
            [len(set(a) & set(b)) / 10.0 for a, b in zip(i, ei)]
        )

    r1, r2 = run(1), run(2)
    assert r2 > r1, (r1, r2)
    assert r2 >= 0.9, r2


# ---------------------------------------------------------------------- #
# prequantized int8 index store (index/store.py)


def _store_fixture(tmp_path, n_shards=3, rows=900, d=32, seed=11):
    from dpr_scale_tpu.encode.embeddings import save_embedding_shard

    rng = np.random.default_rng(seed)
    emb_dir = tmp_path / "embs"
    emb_dir.mkdir()
    shards = []
    for s in range(n_shards):
        emb = rng.normal(size=(rows, d)).astype(np.float32)
        save_embedding_shard(str(emb_dir / f"reps_{s:04}"), emb, "pickle")
        shards.append(emb)
    return str(emb_dir), np.concatenate(shards)


def test_int8_store_roundtrip_matches_direct_add(tmp_path):
    from dpr_scale_tpu.index import build_int8_store, load_int8_store, store_is_current
    from dpr_scale_tpu.retrieve.retrieval import build_index

    emb_dir, corpus = _store_fixture(tmp_path)
    store = str(tmp_path / "store")
    assert not store_is_current(store, emb_dir)
    manifest = build_int8_store(
        emb_dir, store, max_block_rows=1024, pad_multiple=1024
    )
    # 2700 rows re-chunked at 1024: blocks preserve corpus order + count
    assert [b["n_valid"] for b in manifest["blocks"]] == [1024, 1024, 652]
    assert store_is_current(store, emb_dir)

    mesh = get_mesh(8)
    direct = MipsIndex(mesh, method="int8")
    # same block structure as the store (quantization is per-block:
    # col/row scales and rounding noise differ across block layouts)
    for lo in range(0, corpus.shape[0], 1024):
        direct.add(corpus[lo : lo + 1024])
    queries = np.asarray(corpus[200:232] + 0.01, np.float32)
    sd, idd = direct.search(queries, k=10)

    loaded = MipsIndex(mesh, method="int8")
    load_int8_store(loaded, store)
    assert loaded.num_rows == corpus.shape[0]
    sl, il = loaded.search(queries, k=10)
    np.testing.assert_array_equal(idd, il)
    np.testing.assert_allclose(sd, sl, rtol=1e-5)


def test_multiblock_pad_rows_never_alias_real_ids():
    """Regression: masked pad candidates kept their raw row index, and the
    multi-block offset add mapped block b's pad indices into block b+1's
    REAL id range. With all-negative scores in a sparse block, pad rows
    (pre-mask score 0) crowd the per-device approx pool, so the merged
    result surfaces NEG_INF entries — which must carry index -1 (the
    rows_to_ctxs skip convention), never another block's doc ids."""
    mesh = get_mesh(8)
    rng = np.random.default_rng(3)
    D = 16
    u = rng.normal(size=(D,)).astype(np.float32)
    u /= np.linalg.norm(u)

    def block(sign, n_valid):
        rows = np.zeros((n_valid, D), np.float32)
        mags = 1.0 + rng.random(n_valid).astype(np.float32)
        rows += sign * mags[:, None] * u[None, :]
        rows += 0.01 * rng.normal(size=(n_valid, D)).astype(np.float32)
        pad = np.zeros((2048, D), np.float32)  # 256 rows/device > kc=128
        pad[:n_valid] = rows
        return pad

    # block 0: 100 negative-scoring rows on device 0 alongside 156 pads —
    # the kc=128 approx pool (pre-mask pad score 0 > negatives) fills with
    # pads, so block 0 surfaces ZERO real candidates; block 1 holds only
    # 20 rows, fewer than k, so the merged top-k MUST surface masked pads
    index = MipsIndex(mesh, method="approx")
    index.add_device(jnp.asarray(block(-1.0, 100), jnp.bfloat16), n_valid=100)
    index.add_device(jnp.asarray(block(+1.0, 20), jnp.bfloat16), n_valid=20)
    assert index.num_rows == 120
    s, i = index.search(np.tile(u, (4, 1)).astype(np.float32), k=32)
    surfaced_pads = s <= -1e29
    assert surfaced_pads.any()
    np.testing.assert_array_equal(i[surfaced_pads], -1)
    real = ~surfaced_pads
    assert (i[real] >= 0).all() and (i[real] < 120).all()
    # block 1's positive rows must rank first (global ids 100..119)
    assert (i[:, :20] >= 100).all()


def test_int8_store_chunked_quantization_bit_exact(tmp_path):
    """The store's memory-bounded chunked quantizer (column-max pre-pass
    + row chunks) must produce BIT-identical planes to
    MipsIndex._quantize_int8_host on the padded block."""
    from dpr_scale_tpu.index import build_int8_store

    emb_dir, corpus = _store_fixture(tmp_path)
    store = str(tmp_path / "store")
    manifest = build_int8_store(
        emb_dir, store, max_block_rows=1024, pad_multiple=512
    )
    lo = 0
    for bi, b in enumerate(manifest["blocks"]):
        n, n_pad = b["n_valid"], b["n_pad"]
        padded = np.zeros((n_pad, corpus.shape[1]), np.float32)
        padded[:n] = corpus[lo : lo + n]
        q8_ref, sc_ref, col_ref = MipsIndex._quantize_int8_host(padded)
        q8 = np.load(os.path.join(store, f"block_{bi:04}.q8.npy"))
        sc = np.load(os.path.join(store, f"block_{bi:04}.sc.npy"))
        col = np.load(os.path.join(store, f"block_{bi:04}.col.npy"))
        np.testing.assert_array_equal(q8, q8_ref)
        np.testing.assert_array_equal(sc, sc_ref)
        np.testing.assert_array_equal(col, col_ref)
        lo += n


def test_int8_store_staleness_detection(tmp_path):
    from dpr_scale_tpu.index import build_int8_store, store_is_current

    emb_dir, _ = _store_fixture(tmp_path)
    store = str(tmp_path / "store")
    build_int8_store(emb_dir, store, pad_multiple=1024)
    assert store_is_current(store, emb_dir)
    # touching a shard (mtime/size change) must invalidate the store
    shard = os.path.join(emb_dir, "reps_0001.pkl")
    with open(shard, "ab") as f:
        f.write(b" ")
    assert not store_is_current(store, emb_dir)


def test_int8_store_hybrid_device_host_tiers(tmp_path):
    """device_rows budget splits blocks into an HBM tier + a host-mmap
    tier; search over the hybrid must equal the all-device result."""
    from dpr_scale_tpu.index import build_int8_store, load_int8_store

    emb_dir, corpus = _store_fixture(tmp_path)
    store = str(tmp_path / "store")
    build_int8_store(emb_dir, store, max_block_rows=1024, pad_multiple=1024)
    mesh = get_mesh(8)
    queries = np.asarray(corpus[5:21] - 0.02, np.float32)

    all_dev = MipsIndex(mesh, method="int8")
    load_int8_store(all_dev, store)
    s0, i0 = all_dev.search(queries, k=7)

    hybrid = MipsIndex(mesh, method="int8")
    load_int8_store(hybrid, store, device_rows=1024)  # 1 dev + 2 host blocks
    import numpy as _np

    host_blocks = [b for b in hybrid._blocks if isinstance(b[0], _np.ndarray)]
    assert len(host_blocks) == 2
    s1, i1 = hybrid.search(queries, k=7)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, rtol=1e-5)

    host_only = MipsIndex(mesh, method="int8", host_resident=True)
    load_int8_store(host_only, store)
    s2, i2 = host_only.search(queries, k=7)
    np.testing.assert_array_equal(i0, i2)


def test_build_index_uses_and_rebuilds_store(tmp_path, capsys):
    from dpr_scale_tpu.retrieve.retrieval import build_index

    emb_dir, corpus = _store_fixture(tmp_path)
    store = str(tmp_path / "store")
    mesh = get_mesh(8)
    ix1 = build_index(emb_dir, mesh, method="int8", index_store=store)
    assert "Building int8 index store" in capsys.readouterr().out
    queries = np.asarray(corpus[40:56], np.float32)
    s1, i1 = ix1.search(queries, k=5)
    # second build: loads the existing store without rebuilding
    ix2 = build_index(emb_dir, mesh, method="int8", index_store=store)
    assert "Building" not in capsys.readouterr().out
    s2, i2 = ix2.search(queries, k=5)
    np.testing.assert_array_equal(i1, i2)
    with pytest.raises(ValueError):
        build_index(emb_dir, mesh, method="fused", index_store=store)


def test_serving_multi_block_fused_dispatch_matches_host_merge():
    """Multi-block device-resident int8/approx searches route through ONE
    jitted dispatch (device merge). Must equal the per-block host-merge
    path (exercised via an identical host-resident index)."""
    rng = np.random.default_rng(42)
    blocks = [rng.normal(size=(n, 32)).astype(np.float32) for n in (1500, 900, 2100)]
    queries = rng.normal(size=(19, 32)).astype(np.float32)
    for method in ("int8", "approx"):
        dev = MipsIndex(get_mesh(8), method=method)
        host = MipsIndex(get_mesh(8), method=method, host_resident=True)
        for b in blocks:
            dev.add(b)
            host.add(b)
        # the fused path requires every block on device
        assert not any(isinstance(b[0], np.ndarray) for b in dev._blocks)
        sd, idd = dev.search(queries, k=12)
        sh, ih = host.search(queries, k=12)
        np.testing.assert_allclose(sd, sh, rtol=1e-5)
        np.testing.assert_array_equal(idd, ih)


def test_serving_multi_block_fused_dispatch_two_planes():
    """int8_query_planes rides the fused multi-block dispatch: flipping it
    on a live index recompiles (results change) and the fused device
    merge agrees with the per-block host-merge path at both settings."""
    rng = np.random.default_rng(43)
    col_spread = np.exp(rng.uniform(-2.5, 2.5, size=64)).astype(np.float32)
    blocks = [
        (rng.normal(size=(2048, 64)) * col_spread[None, :]).astype(np.float32)
        for _ in range(2)
    ]
    queries = (rng.normal(size=(16, 64)) * col_spread[None, :]).astype(np.float32)
    dev = MipsIndex(get_mesh(8), method="int8")
    host = MipsIndex(get_mesh(8), method="int8", host_resident=True)
    for b in blocks:
        dev.add(b)
        host.add(b)
    outs = {}
    for planes in (1, 2):
        dev.int8_query_planes = planes
        host.int8_query_planes = planes
        sd, idd = dev.search(queries, k=10)
        sh, ih = host.search(queries, k=10)
        np.testing.assert_allclose(sd, sh, rtol=1e-5)
        np.testing.assert_array_equal(idd, ih)
        outs[planes] = sd
    # the second plane must actually change the scores (recompilation
    # happened; query-side rounding error removed)
    assert not np.allclose(outs[1], outs[2])


def test_exact_multi_block_fused_dispatch_with_repair(monkeypatch):
    """Multi-block device-resident exact modes route through ONE dispatch;
    queries whose verification fails in any block are repaired through the
    per-block host path. Inject an overload (more discrepant groups than
    the rescue budget) so the repair genuinely runs, and require exact
    numpy results."""
    import jax

    from dpr_scale_tpu.index.mips import RESCUE_GROUPS
    from dpr_scale_tpu.ops.mips_kernels import GROUP_ROWS

    rng = np.random.default_rng(15)
    n_planted = RESCUE_GROUPS + 2
    b0 = rng.normal(size=(8 * 1024, 16)).astype(np.float32)
    b1 = rng.normal(size=(8 * 1024, 16)).astype(np.float32)
    v = rng.normal(size=(16,)).astype(np.float32)
    for j in range(n_planted + 4):  # plant the overload in block 1
        b1[j * GROUP_ROWS] = v * (30 - j)
    corpus = np.concatenate([b0, b1])
    queries = np.tile(v, (4, 1)).astype(np.float32)

    index = MipsIndex(get_mesh(8), dtype=jnp.float32, method="fused")
    index.add(b0)
    index.add(b1)

    calls = []
    orig = MipsIndex._per_block_host_merge
    monkeypatch.setattr(
        MipsIndex,
        "_per_block_host_merge",
        lambda self, q, k_eff: calls.append(q.shape) or orig(self, q, k_eff),
    )
    monkeypatch.setattr(jax.lax, "approx_max_k", _drop_best_approx(n_planted))
    s, i = index.search(queries, k=4)
    es, ei = _np_topk(corpus, queries, 4)
    np.testing.assert_array_equal(i, ei)
    np.testing.assert_allclose(s, es, rtol=2e-5)
    # the host path ran ONLY as the repair pass (padded failing batch),
    # not as the primary search
    assert len(calls) == 1 and calls[0][0] == 64, calls


def test_exact_multi_block_fused_dispatch_no_failures(monkeypatch):
    """Happy path: no verification failures -> zero host-merge calls, one
    device dispatch, exact results (fused + groupmax)."""
    rng = np.random.default_rng(16)
    blocks = [rng.normal(size=(8 * 1024, 16)).astype(np.float32) for _ in range(3)]
    corpus = np.concatenate(blocks)
    queries = rng.normal(size=(9, 16)).astype(np.float32)
    es, ei = _np_topk(corpus, queries, 11)
    for method in ("fused", "groupmax"):
        index = MipsIndex(get_mesh(8), dtype=jnp.float32, method=method)
        for b in blocks:
            index.add(b)
        calls = []
        orig = MipsIndex._per_block_host_merge
        monkeypatch.setattr(
            MipsIndex,
            "_per_block_host_merge",
            lambda self, q, k_eff: calls.append(1) or orig(self, q, k_eff),
        )
        s, i = index.search(queries, k=11)
        np.testing.assert_array_equal(i, ei)
        np.testing.assert_allclose(s, es, rtol=2e-5)
        assert not calls, f"{method}: host merge ran on the happy path"
