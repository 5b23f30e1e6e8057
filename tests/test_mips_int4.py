"""int4 capacity serving mode (method="int4") + host exact-rerank tier.

The int4 tier packs two column-equalized 4-bit values per int8 byte
(QUARTER the HBM of bf16 — the whole 21M x 768 north-star corpus fits one
16 GB chip) and sweeps with the same int8 MXU dot as method="int8",
unpacking chunk-by-chunk under a lax.scan. set_rerank() attaches a host
fp32 rescoring tier over the device candidate pool (the FAISS
candidate-then-rerank shape, the reference's intended CITADEL index
family, citadel_retrieval_task.py:12).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dpr_scale_tpu.index import MipsIndex
from dpr_scale_tpu.index import mips as mips_mod
from dpr_scale_tpu.parallel import get_mesh


def _np_topk(corpus, queries, k):
    s = queries @ corpus.T
    idx = np.argsort(-s, kind="stable", axis=1)[:, :k]
    return np.take_along_axis(s, idx, axis=1), idx


def _dense_rows(scores, idx, n):
    out = np.zeros((scores.shape[0], n), np.float32)
    np.put_along_axis(out, idx.astype(np.int64), scores, axis=1)
    return out


def _grid4_embeddings(rng, n, d):
    """Rows exactly representable under column-equalized per-row symmetric
    int4: integers in [-7, 7] times a per-row scale, one +7 pin per row,
    and row 0 pinned to all-(7 * max_scale) so the column-equalization
    scale is uniform and recovery stays lossless."""
    ints = rng.integers(-7, 8, size=(n, d)).astype(np.float32)
    ints[np.arange(n), rng.integers(0, d, size=n)] = 7.0
    scales = rng.uniform(0.005, 0.05, size=(n, 1)).astype(np.float32)
    ints[0] = 7.0
    scales[0] = scales.max()
    return ints * scales


def _grid8_queries(rng, n, d):
    """Queries exactly representable under the int8 query quantizer."""
    ints = rng.integers(-127, 128, size=(n, d)).astype(np.float32)
    ints[np.arange(n), rng.integers(0, d, size=n)] = 127.0
    scales = rng.uniform(0.005, 0.05, size=(n, 1)).astype(np.float32)
    return ints * scales


def test_int4_pack_unpack_roundtrip():
    """Host pack -> device unpack recovers the signed 4-bit values for the
    full [-7, 7] range in both nibbles (column-block layout)."""
    rng = np.random.default_rng(0)
    emb = _grid4_embeddings(rng, 64, 16)
    packed, sc, col = MipsIndex._quantize_int4_host(emb)
    assert packed.shape == (64, 8) and packed.dtype == np.int8
    x8 = np.asarray(MipsIndex._unpack_int4(jnp.asarray(packed)))
    expected = np.rint(emb / col[None, :] / sc[:, None])
    np.testing.assert_array_equal(x8, expected.astype(np.int8))
    # reconstruction is exact on grid data
    np.testing.assert_allclose(
        x8 * sc[:, None] * col[None, :], emb, rtol=1e-5, atol=1e-7
    )


def test_int4_lossless_grid_matches_exact():
    """On int4-grid data the quantization is lossless, so the serving mode
    must reproduce exact search (dense compare — int ties are legal)."""
    rng = np.random.default_rng(40)
    corpus = _grid4_embeddings(rng, 3000, 32)
    queries = _grid8_queries(rng, 9, 32)
    index = MipsIndex(get_mesh(8), method="int4")
    index.add(corpus)
    s, i = index.search(queries, k=11)
    es, ei = _np_topk(corpus, queries, 11)
    np.testing.assert_allclose(
        _dense_rows(s, i, 3000), _dense_rows(es, ei, 3000), rtol=1e-4, atol=1e-6
    )


def test_int4_mesh_parity():
    """mesh(8) == mesh(1) == exact on grid data (SPMD convention)."""
    rng = np.random.default_rng(41)
    corpus = _grid4_embeddings(rng, 2048, 16)
    queries = _grid8_queries(rng, 8, 16)
    es, ei = _np_topk(corpus, queries, 10)
    dense_e = _dense_rows(es, ei, 2048)
    for ndev in (1, 8):
        index = MipsIndex(get_mesh(ndev), method="int4")
        index.add(corpus)
        s, i = index.search(queries, k=10)
        np.testing.assert_allclose(
            _dense_rows(s, i, 2048), dense_e, rtol=1e-4, atol=1e-6
        )


def test_int4_chunked_scan_matches_whole(monkeypatch):
    """Small INT4_CHUNK_ROWS forces the multi-chunk scan (including the
    virtual pad tail) — results must match the whole-block sweep."""
    rng = np.random.default_rng(42)
    corpus = _grid4_embeddings(rng, 3072, 16)  # 384 rows/device on mesh(8)
    queries = _grid8_queries(rng, 8, 16)
    whole = MipsIndex(get_mesh(8), method="int4")
    whole.add(corpus)
    sw, iw = whole.search(queries, k=10)
    for ch in (128, 256):  # 256 pads the tail chunk (384 = 256 + 128)
        monkeypatch.setattr(mips_mod, "INT4_CHUNK_ROWS", ch)
        idx = MipsIndex(get_mesh(8), method="int4")
        idx.add(corpus)
        s, i = idx.search(queries, k=10)
        np.testing.assert_allclose(
            _dense_rows(s, i, 3072), _dense_rows(sw, iw, 3072),
            rtol=1e-4, atol=1e-6,
        )


def test_int4_multi_block_recall_and_device_merge():
    """Random (non-grid) data: real 4-bit quantization error. Assert decent
    top-k overlap with exact search across multiple device-resident blocks
    (exercising the fused multi-block dispatch) and that int8 beats int4
    (sanity: more bits, better ranking)."""
    rng = np.random.default_rng(43)
    blocks = [rng.normal(size=(n, 64)).astype(np.float32) for n in (3000, 1500)]
    corpus = np.concatenate(blocks, 0)
    queries = rng.normal(size=(16, 64)).astype(np.float32)

    def overlap(method):
        index = MipsIndex(get_mesh(8), method=method)
        for b in blocks:
            index.add(b)
        s, i = index.search(queries, k=10)
        es, ei = _np_topk(corpus, queries, 10)
        return np.mean(
            [len(set(i[b]) & set(ei[b])) / 10.0 for b in range(len(queries))]
        )

    o4, o8 = overlap("int4"), overlap("int8")
    assert o4 >= 0.5, o4
    assert o8 >= o4 - 0.05, (o8, o4)  # int8 should not lose to int4


def test_int4_packed_builders_match_add():
    """add_device_packed4 / add_host_packed4 (pre-packed chunks, the >HBM
    capacity path) == host-quantized add()."""
    rng = np.random.default_rng(44)
    corpus = _grid4_embeddings(rng, 1024, 16)
    queries = _grid8_queries(rng, 4, 16)
    mesh = get_mesh(8)
    a = MipsIndex(mesh, method="int4")
    a.add(corpus)
    packed, sc, col = MipsIndex._quantize_int4_host(
        np.pad(corpus, ((0, 0), (0, 0)))
    )
    row_sharded = NamedSharding(mesh, P("data", None))
    b = MipsIndex(mesh, method="int4")
    b.add_device_packed4(
        jax.device_put(jnp.asarray(packed), row_sharded),
        jax.device_put(jnp.asarray(sc), NamedSharding(mesh, P("data"))),
        n_valid=1024,
        col_scales=jax.device_put(jnp.asarray(col), NamedSharding(mesh, P(None))),
    )
    c = MipsIndex(mesh, method="int4")
    c.add_host_packed4(packed, sc, n_valid=1024, col_scales=col)
    sa, ia = a.search(queries, k=9)
    sb, ib = b.search(queries, k=9)
    sc_, ic = c.search(queries, k=9)
    np.testing.assert_allclose(
        _dense_rows(sa, ia, 1024), _dense_rows(sb, ib, 1024), rtol=1e-5
    )
    np.testing.assert_allclose(
        _dense_rows(sa, ia, 1024), _dense_rows(sc_, ic, 1024), rtol=1e-5
    )


def test_int4_two_plane_queries_run_and_match_grid():
    """planes=2 rides the same sweep; on grid data (query-side exact
    already) it must still reproduce exact search."""
    rng = np.random.default_rng(45)
    corpus = _grid4_embeddings(rng, 1024, 16)
    queries = _grid8_queries(rng, 4, 16)
    index = MipsIndex(get_mesh(8), method="int4")
    index.add(corpus)
    index.int8_query_planes = 2
    s, i = index.search(queries, k=10)
    es, ei = _np_topk(corpus, queries, 10)
    np.testing.assert_allclose(
        _dense_rows(s, i, 1024), _dense_rows(es, ei, 1024), rtol=1e-4, atol=1e-6
    )


@pytest.mark.parametrize("method", ["int4", "int8", "approx"])
def test_rerank_recovers_exact(method):
    """set_rerank with a candidate pool covering the corpus returns the
    EXACT fp32 top-k for every lossy serving mode."""
    rng = np.random.default_rng(46)
    corpus = rng.normal(size=(1024, 32)).astype(np.float32)
    queries = rng.normal(size=(8, 32)).astype(np.float32)
    index = MipsIndex(get_mesh(8), method=method)
    index.add(corpus)
    fetched = []

    def rows_fn(ids):
        fetched.append(len(ids))
        return corpus[ids]

    index.set_rerank(rows_fn, oversample=128)  # 128*8 >= corpus size
    s, i = index.search(queries, k=8)
    es, ei = _np_topk(corpus, queries, 8)
    np.testing.assert_array_equal(i, ei)
    np.testing.assert_allclose(s, es, rtol=1e-5, atol=1e-6)
    assert fetched and fetched[0] <= corpus.shape[0]
    # detaching restores the raw lossy scores
    index.set_rerank(None)
    s2, _ = index.search(queries, k=8)
    if method in ("int4", "int8"):
        assert not np.allclose(s2, s, rtol=1e-6)


def test_rerank_improves_int4_recall():
    """A realistic oversample (4x) lifts int4 recall@10 vs no rerank."""
    rng = np.random.default_rng(47)
    corpus = rng.normal(size=(4096, 64)).astype(np.float32)
    queries = rng.normal(size=(16, 64)).astype(np.float32)
    es, ei = _np_topk(corpus, queries, 10)

    def recall(oversample):
        index = MipsIndex(get_mesh(8), method="int4")
        index.add(corpus)
        if oversample:
            index.set_rerank(lambda ids: corpus[ids], oversample=oversample)
        _, i = index.search(queries, k=10)
        return np.mean(
            [len(set(i[b]) & set(ei[b])) / 10.0 for b in range(len(queries))]
        )

    raw, reranked = recall(None), recall(4)
    assert reranked >= raw, (raw, reranked)
    assert reranked >= 0.8, reranked


def test_int4_retrieve_e2e_with_rerank(tmp_path):
    """retrieve(..., method='int4', rerank_oversample=...) end to end:
    shards on disk -> int4 index + host rerank -> DPR JSON."""
    import pickle

    from dpr_scale_tpu.retrieve.retrieval import retrieve

    rng = np.random.default_rng(48)
    corpus = rng.normal(size=(512, 16)).astype(np.float32)
    (tmp_path / "embs").mkdir()
    with open(tmp_path / "embs" / "reps_0000.pkl", "wb") as f:
        pickle.dump(corpus, f, protocol=4)
    with open(tmp_path / "psgs.tsv", "w") as f:
        f.write("id\ttext\ttitle\n")
        for r in range(512):
            f.write(f"{r}\tpassage {r}\tt{r}\n")
    queries = corpus[:4] + 0.01 * rng.normal(size=(4, 16)).astype(np.float32)
    results = retrieve(
        queries,
        [{"question": f"q{b}", "answers": []} for b in range(4)],
        str(tmp_path / "psgs.tsv"),
        str(tmp_path / "embs"),
        get_mesh(8),
        k=5,
        query_batch=4,
        method="int4",
        rerank_oversample=8,
        output_json_path=str(tmp_path / "out.json"),
    )
    assert len(results) == 4 and all(len(r) == 5 for r in results)
    # rerank scores are exact fp32: top-1 must be each query's source row
    for b, ctxs in enumerate(results):
        exact = queries[b] @ corpus.T
        assert int(ctxs[0]["id"]) == int(np.argmax(exact))
        np.testing.assert_allclose(ctxs[0]["score"], exact.max(), rtol=1e-5)


def test_shard_row_reader_mixed_formats(tmp_path):
    """ShardRowReader: global row ids -> fp32 rows across mixed .pkl/.npy
    shards without loading the corpus in RAM; .pkl sidecars are built
    once and reused while the pickle is unchanged."""
    import pickle

    from dpr_scale_tpu.encode.embeddings import ShardRowReader

    rng = np.random.default_rng(49)
    a = rng.normal(size=(100, 8)).astype(np.float32)
    b = rng.normal(size=(60, 8)).astype(np.float32)
    with open(tmp_path / "reps_0000.pkl", "wb") as f:
        pickle.dump(a, f, protocol=4)
    np.save(tmp_path / "reps_0001.npy", b)
    full = np.concatenate([a, b], 0)
    r = ShardRowReader(str(tmp_path))
    assert r.num_rows == 160 and r.dim == 8
    ids = np.array([0, 99, 100, 159, 5, 120], np.int64)
    np.testing.assert_array_equal(r(ids), full[ids])
    # sidecar reused (fingerprint match): second reader, same bytes
    sidecar = tmp_path / "reps_0000.pkl.rerank.npy"
    assert sidecar.exists()
    mtime = sidecar.stat().st_mtime_ns
    r2 = ShardRowReader(str(tmp_path))
    np.testing.assert_array_equal(r2(ids), full[ids])
    assert sidecar.stat().st_mtime_ns == mtime
    # and the sidecar must not be picked up as a shard itself
    assert r2.num_rows == 160


def test_retrieve_rerank_validates_prebuilt_index_method(tmp_path):
    """rerank_oversample checks the INDEX searched, not the method arg:
    a prebuilt exact index raises; a prebuilt int4 index with the
    default method='fused' arg attaches the tier (advisor r4)."""
    import pickle

    from dpr_scale_tpu.retrieve.retrieval import retrieve

    rng = np.random.default_rng(50)
    corpus = rng.normal(size=(256, 16)).astype(np.float32)
    (tmp_path / "embs").mkdir()
    with open(tmp_path / "embs" / "reps_0000.pkl", "wb") as f:
        pickle.dump(corpus, f, protocol=4)
    with open(tmp_path / "psgs.tsv", "w") as f:
        f.write("id\ttext\ttitle\n")
        for rr in range(256):
            f.write(f"{rr}\tpassage {rr}\tt{rr}\n")
    mesh = get_mesh(8)
    queries = corpus[:4]
    qrows = [{"question": f"q{i}", "answers": []} for i in range(4)]
    exact_idx = MipsIndex(mesh, method="fused")
    exact_idx.add(corpus)
    with pytest.raises(ValueError, match="lossy"):
        retrieve(
            queries, qrows, str(tmp_path / "psgs.tsv"),
            str(tmp_path / "embs"), mesh, k=5, query_batch=4,
            index=exact_idx, method="int4", rerank_oversample=4,
        )
    int4_idx = MipsIndex(mesh, method="int4")
    int4_idx.add(corpus)
    res = retrieve(
        queries, qrows, str(tmp_path / "psgs.tsv"), str(tmp_path / "embs"),
        mesh, k=5, query_batch=4, index=int4_idx, rerank_oversample=64,
    )
    for b, ctxs in enumerate(res):
        assert int(ctxs[0]["id"]) == int(np.argmax(queries[b] @ corpus.T))


def test_fp16_shards_flow_through_encoder_reader_and_index(tmp_path):
    """embeddings_dtype=float16: CorpusEncoder casts ON DEVICE (half the
    fetch bytes over a slow host link), writes fp16 .npy shards, and every
    consumer upcasts — ShardRowReader returns fp32 rows, MipsIndex.add
    accepts fp16 blocks with results matching the fp32-shard build to
    fp16 resolution."""
    from dpr_scale_tpu.encode.embeddings import CorpusEncoder, ShardRowReader

    mesh = get_mesh(8)

    class _IdModel:
        """encode_context == row-normalized slice of the ids (stand-in
        encoder: deterministic, dtype-exercising)."""

        def apply(self, variables, input_ids, attention_mask, **kw):
            import jax.numpy as jnp

            x = input_ids.astype(jnp.float32)
            return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

        def encode_context(self):  # method=getattr target
            pass

    enc = CorpusEncoder(_IdModel(), {}, mesh, out_dtype=np.float16)
    rng = np.random.default_rng(3)
    toks = rng.integers(1, 100, size=(64, 16)).astype(np.int32)

    def batches():
        for lo in range(0, 64, 16):
            yield {
                "input_ids": toks[lo : lo + 16],
                "attention_mask": np.ones((16, 16), np.int32),
                "pad_count": 0,
            }

    emb, _ = enc.encode_batches(batches())
    assert emb.dtype == np.float16 and emb.shape == (64, 16)
    ref = toks.astype(np.float32)
    ref /= np.linalg.norm(ref, axis=-1, keepdims=True)
    np.testing.assert_allclose(emb.astype(np.float32), ref, atol=2e-3)

    out = tmp_path / "embs"
    enc.encode_to_dir(batches(), str(out), shard_id=0, fmt="npy")
    # reader upcasts fp16 mmap rows to fp32
    r = ShardRowReader(str(out))
    rows = r(np.array([0, 63], np.int64))
    assert rows.dtype == np.float32
    np.testing.assert_allclose(rows, ref[[0, 63]], atol=2e-3)
    # index build from fp16 shards matches the fp32 build bit-for-bit
    # after the fp16 storage rounding (both paths go through bf16)
    from dpr_scale_tpu.index import MipsIndex

    idx16 = MipsIndex(mesh, method="fused")
    idx16.add(np.load(out / "reps_0000.npy"))
    idx32 = MipsIndex(mesh, method="fused")
    idx32.add(ref.astype(np.float16).astype(np.float32))
    q = ref[:4]
    s16, i16 = idx16.search(q, 5)
    s32, i32 = idx32.search(q, 5)
    np.testing.assert_array_equal(i16, i32)
    np.testing.assert_allclose(s16, s32, rtol=1e-6)
