"""Inverted expert index: consistency with the training scorer, IO
roundtrip in the reference shard format, pruning/quantization options."""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpr_scale_tpu.index.inverted import InvertedExpertIndex
from dpr_scale_tpu.models import TransformerConfig
from dpr_scale_tpu.models.multivec import MultiVecEncoder
from dpr_scale_tpu.train.multivec import dot_score, expert_sim_score

CFG = dataclasses.replace(TransformerConfig.tiny(vocab_size=32), dtype=jnp.float32)


def _encode(variant, n, L, seed, topk=2, add_cls=False):
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(5, 32, size=(n, L)), jnp.int32)
    mask = jnp.ones((n, L), jnp.int32)
    model = MultiVecEncoder(
        CFG, variant=variant, tok_projection_dim=8,
        cls_projection_dim=8 if add_cls else None,
    )
    params = model.init(jax.random.PRNGKey(0), ids, mask, topk=topk, add_cls=add_cls)
    out = model.apply(params, ids, mask, topk=topk, add_cls=add_cls)
    return model, params, out


@pytest.mark.parametrize("variant", ["citadel", "coil"])
def test_index_matches_training_scorer(variant, tmp_path):
    """Index search must reproduce expert_sim_score + cls over the corpus."""
    topk = 2 if variant == "citadel" else 1
    model, params, doc_out = _encode(variant, 6, 10, seed=0, topk=topk, add_cls=True)
    _m, _p, q_out = _encode(variant, 3, 8, seed=1, topk=topk, add_cls=True)
    # re-encode queries with the SAME params as docs for a fair comparison
    rng = np.random.default_rng(1)
    q_ids = jnp.asarray(rng.integers(5, 32, size=(3, 8)), jnp.int32)
    q_out = model.apply(params, q_ids, jnp.ones((3, 8), jnp.int32), topk=topk, add_cls=True)

    index = InvertedExpertIndex(dim=8, num_docs=6)
    index.add_batch(range(6), {k: np.asarray(v) for k, v in doc_out.items()})
    index.finalize()
    scores, rows = index.search({k: np.asarray(v) for k, v in q_out.items()}, topk=6)

    expected = np.asarray(expert_sim_score(q_out, doc_out, query_pool="sum"))
    expected = expected + np.asarray(dot_score(q_out["cls_repr"], doc_out["cls_repr"]))
    for b in range(3):
        dense = np.full(6, -np.inf)
        dense[rows[b]] = scores[b]
        np.testing.assert_allclose(dense, expected[b], rtol=1e-4, atol=1e-4)


def test_index_save_load_roundtrip(tmp_path):
    model, params, doc_out = _encode("citadel", 5, 8, seed=2, topk=2, add_cls=True)
    doc_out = {k: np.asarray(v) for k, v in doc_out.items()}
    index = InvertedExpertIndex(dim=8, num_docs=5)
    index.add_batch(range(5), doc_out)
    index.finalize()
    index.save(str(tmp_path), shard_id=0)
    assert os.path.isdir(tmp_path / "expert_0000")
    assert (tmp_path / "cls_0000.pkl").exists()

    loaded = InvertedExpertIndex.load(str(tmp_path), num_docs=5)
    assert set(loaded.experts) == set(index.experts)
    _m, _p, q_out = _encode("citadel", 2, 8, seed=3, topk=2, add_cls=True)
    q_out = {k: np.asarray(v) for k, v in q_out.items()}
    s1, r1 = index.search(q_out, topk=5)
    s2, r2 = loaded.search(q_out, topk=5)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)
    np.testing.assert_array_equal(r1, r2)


def test_index_multi_shard_merge(tmp_path):
    """Two emission shards (expert_0000/expert_0001) merge on load —
    the expert-parallel layout."""
    model, params, doc_out = _encode("citadel", 6, 8, seed=4, topk=1)
    doc_out = {k: np.asarray(v) for k, v in doc_out.items()}
    half = lambda d, sl: {k: v[sl] for k, v in d.items() if np.ndim(v) > 0}
    i0 = InvertedExpertIndex(dim=8, num_docs=6)
    i0.add_batch(range(0, 3), half(doc_out, slice(0, 3)))
    i0.finalize()
    i0.save(str(tmp_path), shard_id=0)
    i1 = InvertedExpertIndex(dim=8, num_docs=6)
    i1.add_batch(range(3, 6), half(doc_out, slice(3, 6)))
    i1.finalize()
    i1.save(str(tmp_path), shard_id=1)

    full = InvertedExpertIndex(dim=8, num_docs=6)
    full.add_batch(range(6), doc_out)
    full.finalize()

    loaded = InvertedExpertIndex.load(str(tmp_path), num_docs=6)
    _m, _p, q_out = _encode("citadel", 2, 8, seed=5, topk=1)
    q_out = {k: np.asarray(v) for k, v in q_out.items()}
    s1, r1 = full.search(q_out, topk=6)
    s2, r2 = loaded.search(q_out, topk=6)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)
    np.testing.assert_array_equal(r1, r2)


@pytest.mark.parametrize("variant", ["citadel", "coil"])
def test_device_index_matches_host(variant, tmp_path):
    """The TPU-native bucketed search must reproduce the host search."""
    import jax.numpy as jnp

    from dpr_scale_tpu.index.inverted_device import DeviceExpertIndex

    topk = 2 if variant == "citadel" else 1
    model, params, doc_out = _encode(variant, 8, 12, seed=8, topk=topk, add_cls=True)
    doc_out = {k: np.asarray(v) for k, v in doc_out.items()}
    host = InvertedExpertIndex(dim=8, num_docs=8)
    host.add_batch(range(8), doc_out)
    host.finalize()
    dev = DeviceExpertIndex.from_host_index(host, dtype=jnp.float32)

    rng = np.random.default_rng(9)
    q_ids = jnp.asarray(rng.integers(5, 32, size=(3, 8)), jnp.int32)
    q_out = model.apply(
        params, q_ids, jnp.ones((3, 8), jnp.int32), topk=topk, add_cls=True
    )
    q_out = {k: np.asarray(v) for k, v in q_out.items()}

    hs, hr = host.search(q_out, topk=8)
    ds, dr = dev.search(q_out, topk=8)
    for b in range(3):
        dense_h = np.zeros(8, np.float32)
        dense_h[hr[b]] = hs[b]
        dense_d = np.zeros(8, np.float32)
        dense_d[dr[b]] = ds[b]
        np.testing.assert_allclose(dense_d, dense_h, rtol=1e-4, atol=1e-4)

    # latency accounting mirrors the host index's dict
    assert dev.latency["routing_time"] > 0
    assert dev.latency["search_time"] > 0

    # as_numpy=False keeps results device-resident but numerically equal
    ds2, dr2 = dev.search(q_out, topk=8, as_numpy=False)
    assert not isinstance(ds2, np.ndarray)
    np.testing.assert_allclose(np.asarray(ds2), ds, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(dr2), dr)


def test_device_index_streamed_scorer_matches_host(monkeypatch):
    """The stream-and-pick Pallas scorer (interpret mode on CPU) must
    reproduce the host search exactly — covers the slot-sorted entry
    permutation, the step table, and the in-kernel one-hot masking."""
    from dpr_scale_tpu.index import inverted_device as idev

    monkeypatch.setattr(idev, "STREAM_MODE", "on")
    model, params, doc_out = _encode("citadel", 8, 12, seed=8, topk=2, add_cls=True)
    doc_out = {k: np.asarray(v) for k, v in doc_out.items()}
    host = InvertedExpertIndex(dim=8, num_docs=8)
    host.add_batch(range(8), doc_out)
    host.finalize()
    dev = idev.DeviceExpertIndex.from_host_index(host, dtype=jnp.float32)

    rng = np.random.default_rng(9)
    q_ids = jnp.asarray(rng.integers(5, 32, size=(3, 8)), jnp.int32)
    q_out = model.apply(
        params, q_ids, jnp.ones((3, 8), jnp.int32), topk=2, add_cls=True
    )
    q_out = {k: np.asarray(v) for k, v in q_out.items()}

    hs, hr = host.search(q_out, topk=8)
    ds, dr = dev.search(q_out, topk=8)
    for b in range(3):
        dense_h = np.zeros(8, np.float32)
        dense_h[hr[b]] = hs[b]
        dense_d = np.zeros(8, np.float32)
        dense_d[dr[b]] = ds[b]
        np.testing.assert_allclose(dense_d, dense_h, rtol=1e-4, atol=1e-4)


def test_stream_auto_byte_model():
    """STREAM_MODE="auto" picks the scorer PER BUCKET: entries
    concentrated on few experts stream (distinct posting groups << the
    per-entry gather bytes), entries sparse over many experts gather
    (every entry touches its own ~STREAM_CHUNK posting group)."""
    from dpr_scale_tpu.index.inverted_device import (
        STREAM_M, _pad_2bit, _stream_auto_wins, _stream_cfg, _stream_steps,
    )

    bsize, D, itemsize, n_exp = 512, 128, 2, 8000
    G, TL = _stream_cfg(n_exp, bsize, D, itemsize)
    assert G > 1  # the model separates the paths via group sharing

    def decide(slots):
        n = len(slots)
        n_pad = _pad_2bit(n, minimum=STREAM_M, multiple=STREAM_M)
        padded = np.full((n_pad,), n_exp, np.int32)
        padded[:n] = np.sort(slots)
        steps = _stream_steps(padded, n, n_pad, G)
        return _stream_auto_wins(steps, G, TL, bsize, D, itemsize, n)

    # 256 entries all routed to one stopword expert: one fetched group
    assert decide(np.zeros(256, np.int32))
    # 256 entries spread G experts apart: each touches its own group,
    # streaming would fetch G x the postings the gather path reads
    assert not decide(np.arange(256, dtype=np.int32) * G)


def test_stream_auto_shape_gate():
    """STREAM_MODE="auto" never streams big-L buckets: the streamed
    kernel's bandwidth advantage was measured only where >= 8 experts
    pack into each ~2 MB block (L=512 class); at G<=4 shapes its
    isolated win is at most ~1 ms per bucket (5.36 vs 6.16 ms at
    L=2048/G=4, at parity or losing at G=1: 110.6 vs 96.1 GB/s at
    L=8192, LOSES at L=32768) while in-program those picks cost
    +69 ms/batch — see STREAM_MIN_GROUP in index/inverted_device.py."""
    from dpr_scale_tpu.index.inverted_device import _stream_shape_ok

    D, itemsize = 128, 2
    # small-bucket family (many experts per block): eligible
    assert _stream_shape_ok(8000, 512, D, itemsize)
    # mid shape G=4 (pathological compile) and big-L G=1 shapes: gated
    assert not _stream_shape_ok(3000, 2048, D, itemsize)
    assert not _stream_shape_ok(800, 8192, D, itemsize)
    assert not _stream_shape_ok(100, 32768, D, itemsize)
    assert not _stream_shape_ok(8, 131072, D, itemsize)


def test_index_pruning_and_quantization():
    model, params, doc_out = _encode("citadel", 6, 10, seed=6, topk=2)
    doc_out = {k: np.asarray(v) for k, v in doc_out.items()}
    full = InvertedExpertIndex(dim=8, num_docs=6)
    full.add_batch(range(6), doc_out)
    full.finalize()

    # weight-threshold pruning drops postings
    pruned = InvertedExpertIndex(dim=8, num_docs=6)
    pruned.add_batch(range(6), doc_out, weight_threshold=0.2)
    pruned.finalize()
    assert pruned.stats()["num_postings"] < full.stats()["num_postings"]

    # int8 quantization approximates full scores
    quant = InvertedExpertIndex(dim=8, num_docs=6)
    quant.add_batch(range(6), doc_out)
    quant.finalize(quantizer="pq")
    _m, _p, q_out = _encode("citadel", 2, 8, seed=7, topk=2)
    q_out = {k: np.asarray(v) for k, v in q_out.items()}
    sf, rf = full.search(q_out, topk=6)
    sq, rq = quant.search(q_out, topk=6)
    np.testing.assert_allclose(sf, sq, rtol=0.08, atol=0.05)
    assert full.latency["search_time"] > 0  # latency accounting is wired


def test_device_index_expert_parallel_large_corpus():
    """Regression: the EP scatter must DROP out-of-shard doc columns.

    ``docs - dev*ncols_l`` goes negative for docs owned by a lower device,
    and JAX wraps negative advanced indices (idx + axis_size) BEFORE the
    ``mode="drop"`` OOB check — so doc d owned by device dev-1 used to add
    its score to global doc d+ncols_l on device dev. Only visible when
    num_docs > ncols_l, i.e. several devices own real columns (the small
    8-doc parity test hits masked pad columns and cannot see it), so this
    test uses num_docs > 2*TILE.
    """
    from dpr_scale_tpu.index.inverted import _ExpertPostings
    from dpr_scale_tpu.index.inverted_device import TILE, DeviceExpertIndex
    from dpr_scale_tpu.parallel import get_mesh

    num_docs = 2 * TILE + 904  # 5000: three mesh(8) devices own real columns
    D = 8
    rng = np.random.default_rng(42)
    host = InvertedExpertIndex(dim=D, num_docs=num_docs)
    for e in range(16):
        n = int(rng.integers(20, 100))
        ids = np.sort(rng.choice(num_docs, size=n, replace=False)).astype(np.int64)
        host.experts[e] = _ExpertPostings(
            ids, np.ones(n, np.float32), rng.normal(size=(n, D)).astype(np.float32)
        )

    B, T = 3, 6
    q_out = {
        "expert_ids": rng.integers(0, 16, size=(B, T)).astype(np.int64),
        "expert_repr": rng.normal(size=(B, T, D)).astype(np.float32),
        "attention_mask": np.ones((B, T), np.int64),
    }
    hs, hr = host.search(q_out, topk=10)
    dev8 = DeviceExpertIndex.from_host_index(
        host, dtype=jnp.float32, mesh=get_mesh(8)
    )
    s8, r8 = dev8.search(q_out, topk=10)
    # single-device with the SORT-BASED combine (forced on by lowering
    # the corpus threshold): must also match the host search exactly
    dev_sorted = DeviceExpertIndex.from_host_index(host, dtype=jnp.float32)
    dev_sorted.sorted_combine_min_docs = 0
    ss, rs = dev_sorted.search(q_out, topk=10)
    for b in range(B):
        dense_h = np.zeros(num_docs + 1, np.float32)
        dense_h[hr[b]] = hs[b]
        dense_d = np.zeros(num_docs + 1, np.float32)
        dense_d[r8[b]] = s8[b]
        dense_s = np.zeros(num_docs + 1, np.float32)
        dense_s[rs[b]] = ss[b]
        np.testing.assert_allclose(dense_d, dense_h, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(dense_s, dense_h, rtol=1e-4, atol=1e-4)


def test_stream_cfg_tiles_are_hardware_legal():
    """Regression: at D=768 bf16 the L-tile target is 1365 (odd), and the
    divisibility halving walked it down to a degenerate TL=2 — below the
    (8, 128) TPU tiling minimum — for EVERY pow2 bucket length. TL must
    be a power of two >= 8 that divides L, near the stream-chunk target."""
    from dpr_scale_tpu.index.inverted_device import STREAM_CHUNK, _stream_cfg

    for D, itemsize in ((768, 2), (768, 4), (128, 2), (96, 4)):
        for L in (2048, 3072, 4096, 6144, 65536, 131072):
            if L * D * itemsize < STREAM_CHUNK:
                continue
            G, TL = _stream_cfg(1, L, D, itemsize)
            assert G == 1
            assert TL >= 8 and TL & (TL - 1) == 0 and L % TL == 0, (
                D, itemsize, L, TL,
            )
            # within 2x of the chunk target (not degenerate-small)
            assert TL * D * itemsize > STREAM_CHUNK // 4, (D, itemsize, L, TL)


@pytest.mark.parametrize("num_docs", [100_000, 2**30])
def test_sorted_combine_last_row_pad_isolation(num_docs):
    """Regression: pad entries (row == batch, real doc ids, value 0.0)
    sort AFTER the real rows, and the last row's segment end used to be
    set to U — so a last row touching < k docs got pad doc ids with
    score 0.0 in its top-k, displacing its real (negative-score) docs.

    num_docs=2**30 forces the TWO-KEY sort branch: the packed key would
    need int64, which silently stays int32 without jax_enable_x64
    (overflowed keys would merge unrelated (row, doc) pairs)."""
    import jax.numpy as jnp

    from dpr_scale_tpu.index.inverted_device import DeviceExpertIndex

    idx = DeviceExpertIndex.__new__(DeviceExpertIndex)
    idx.num_docs = num_docs
    assert ((3) * (num_docs + 2) < 2**31) == (num_docs == 100_000)
    batch, k = 2, 4
    rows = np.array([0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 2, 2], np.int32)
    docs = np.array([10, 20, 30, 40, 50, 60, 7, 8, 11, 22, 33, 44], np.int32)
    vals = np.array(
        [5.0, 4.0, 3.0, 2.0, 1.0, 0.5, -1.0, -2.0, 0.0, 0.0, 0.0, 0.0],
        np.float32,
    )
    s, d = jax.jit(
        lambda r, dd, v: idx._combine_updates_sorted(
            jnp.asarray(r), jnp.asarray(dd), jnp.asarray(v), batch, k, 1
        )
    )(rows, docs, vals)
    s, d = np.asarray(s), np.asarray(d)
    # row 0: plain top-4
    np.testing.assert_array_equal(d[0], [10, 20, 30, 40])
    np.testing.assert_allclose(s[0], [5.0, 4.0, 3.0, 2.0])
    # row 1 touched only 2 docs (both negative): the remaining slots must
    # be masked placeholders, NOT the pad entries' doc ids at 0.0
    assert set(d[1][:2]) == {7, 8}
    np.testing.assert_allclose(sorted(s[1][:2], reverse=True), [-1.0, -2.0])
    np.testing.assert_array_equal(d[1][2:], -1)  # placeholders, not doc 0
    np.testing.assert_allclose(s[1][2:], 0.0)


@pytest.mark.parametrize("add_cls", [False, True])
def test_device_index_expert_parallel_matches_host(add_cls, tmp_path):
    """Expert-parallel (mesh-sharded) device search == host search ==
    single-device search (SPMD convention: simulated-mesh coverage)."""
    import jax.numpy as jnp

    from dpr_scale_tpu.index.inverted_device import DeviceExpertIndex
    from dpr_scale_tpu.parallel import get_mesh

    model, params, doc_out = _encode(
        "citadel", 8, 12, seed=14, topk=2, add_cls=add_cls
    )
    doc_out = {k: np.asarray(v) for k, v in doc_out.items()}
    host = InvertedExpertIndex(dim=8, num_docs=8)
    host.add_batch(range(8), doc_out)
    host.finalize()
    dev1 = DeviceExpertIndex.from_host_index(host, dtype=jnp.float32)
    dev8 = DeviceExpertIndex.from_host_index(
        host, dtype=jnp.float32, mesh=get_mesh(8)
    )

    rng = np.random.default_rng(15)
    q_ids = jnp.asarray(rng.integers(5, 32, size=(3, 8)), jnp.int32)
    q_out = model.apply(
        params, q_ids, jnp.ones((3, 8), jnp.int32), topk=2, add_cls=add_cls
    )
    q_out = {k: np.asarray(v) for k, v in q_out.items()}

    hs, hr = host.search(q_out, topk=8)
    s1, r1 = dev1.search(q_out, topk=8)
    s8, r8 = dev8.search(q_out, topk=8)
    for b in range(3):
        dense = {}
        for tag, (ss, rr) in {"h": (hs, hr), "1": (s1, r1), "8": (s8, r8)}.items():
            vec = np.zeros(8, np.float32)
            vec[rr[b]] = ss[b]
            dense[tag] = vec
        np.testing.assert_allclose(dense["8"], dense["h"], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(dense["8"], dense["1"], rtol=1e-5, atol=1e-5)
