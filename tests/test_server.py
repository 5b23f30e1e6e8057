"""Retrieval server: real HTTP requests against an in-process server."""
import dataclasses
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpr_scale_tpu.data.datasets import CSVDataset
from dpr_scale_tpu.data.tokenize import HFTokenizer
from dpr_scale_tpu.encode.embeddings import CorpusEncoder
from dpr_scale_tpu.index import MipsIndex
from dpr_scale_tpu.models import BiEncoder, TransformerConfig
from dpr_scale_tpu.parallel import get_mesh
from dpr_scale_tpu.retrieve.server import Retriever, make_server


@pytest.fixture(scope="module")
def server_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve")
    passages_path = d / "passages.tsv"
    with open(passages_path, "w") as f:
        f.write("id\ttext\ttitle\n")
        for i in range(20):
            f.write(f"d{i}\tpassage text {i}\ttitle {i}\n")

    # tiny tokenizer
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "passage", "text",
             "title", "query"] + [str(i) for i in range(20)]
    (d / "vocab.txt").write_text("\n".join(vocab) + "\n")
    from transformers import BertTokenizerFast

    BertTokenizerFast(vocab_file=str(d / "vocab.txt")).save_pretrained(str(d))
    tok = HFTokenizer(str(d), max_seq_len=12)

    cfg = dataclasses.replace(
        TransformerConfig.tiny(vocab_size=len(vocab)), dtype=jnp.float32
    )
    model = BiEncoder(cfg, shared=True)
    ids = jnp.ones((2, 12), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, ids, ids, ids)["params"]
    mesh = get_mesh(8)
    encoder = CorpusEncoder(model, params, mesh, use_query_tower=True)

    # corpus embeddings from the same model (context tower)
    ctx_encoder = CorpusEncoder(model, params, mesh)
    passages = CSVDataset(str(passages_path), cache_index=False)
    texts = [passages[i]["text"] for i in range(20)]
    cids, cmask = tok(texts)
    emb = np.asarray(ctx_encoder._encode(params, cids, cmask), np.float32)
    index = MipsIndex(mesh, dtype=jnp.float32)
    index.add(emb)

    retriever = Retriever(encoder, tok, index, passages, default_k=3)
    server = make_server(retriever, "127.0.0.1", 0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", passages, retriever
    server.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/search",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server_setup):
    url, _, _ = server_setup
    with urllib.request.urlopen(url + "/healthz") as resp:
        body = json.loads(resp.read())
    assert body == {"status": "ok", "corpus_rows": 20, "towers": ["/search"]}


def test_search_roundtrip(server_setup):
    url, passages, _ = server_setup
    status, body = _post(url, {"questions": ["passage text 3", "passage text 7"], "k": 4})
    assert status == 200
    results = body["results"]
    assert len(results) == 2
    assert len(results[0]) == 4
    assert {"id", "title", "text", "score"} == set(results[0][0])
    # a query identical to a passage should retrieve that passage first
    # (shared tower, same text -> identical embedding -> max dot product)
    assert results[0][0]["id"] == "d3"
    assert results[1][0]["id"] == "d7"
    # scores sorted descending
    scores = [c["score"] for c in results[0]]
    assert scores == sorted(scores, reverse=True)


def test_search_error_handling(server_setup):
    url, _, _ = server_setup
    assert _post(url, {"questions": []})[0] == 400
    assert _post(url, {"k": 3})[0] == 400
    assert _post(url, {"questions": ["x"], "k": -1})[0] == 400
    status, _ = _post(url, {"questions": ["x"], "k": 100})  # k > corpus clamps
    assert status == 200


def test_search_k_cap_and_bucketing(server_setup):
    url, _, _ = server_setup
    # k above the configured max_k is rejected, not compiled-under-lock
    assert _post(url, {"questions": ["x"], "k": 10_001})[0] == 400
    # non-power-of-two k still returns exactly k results (searched k is
    # bucketed up to a power of two and sliced)
    status, body = _post(url, {"questions": ["passage text 3"], "k": 3})
    assert status == 200
    assert len(body["results"][0]) == 3
    scores = [c["score"] for c in body["results"][0]]
    assert scores == sorted(scores, reverse=True)


def test_coalesced_failure_isolation(server_setup, tmp_path):
    """A poisoned request coalesced with a healthy one must not fail the
    healthy caller: the worker retries each request alone on batch error."""
    d = tmp_path
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "passage", "text",
             "title", "query"] + [str(i) for i in range(20)]
    (d / "vocab.txt").write_text("\n".join(vocab) + "\n")
    from transformers import BertTokenizerFast

    BertTokenizerFast(vocab_file=str(d / "vocab.txt")).save_pretrained(str(d))
    base_tok = HFTokenizer(str(d), max_seq_len=12)

    class PoisonTokenizer:
        """Raises on a marker text — stands in for any per-request
        pipeline failure (bad input, tokenizer edge case)."""

        max_seq_len = 12

        def __call__(self, texts):
            if any("POISON" in t for t in texts):
                raise RuntimeError("poisoned input")
            return base_tok(texts)

    cfg = dataclasses.replace(
        TransformerConfig.tiny(vocab_size=len(vocab)), dtype=jnp.float32
    )
    model = BiEncoder(cfg, shared=True)
    ids = jnp.ones((2, 12), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, ids, ids, ids)["params"]
    mesh = get_mesh(8)
    encoder = CorpusEncoder(model, params, mesh, use_query_tower=True)
    ctx_encoder = CorpusEncoder(model, params, mesh)
    _, passages, _ = server_setup
    texts = [passages[i]["text"] for i in range(20)]
    cids, cmask = base_tok(texts)
    emb = np.asarray(ctx_encoder._encode(params, cids, cmask), np.float32)
    index = MipsIndex(mesh, dtype=jnp.float32)
    index.add(emb)
    retriever = Retriever(
        encoder, PoisonTokenizer(), index, passages,
        default_k=3, coalesce_wait_ms=250.0,
    )
    # warm the jit paths so the coalesce window isn't eaten by compiles
    assert retriever.search(["passage text 5"], k=3)

    results = {}
    errors = {}
    barrier = threading.Barrier(2)

    def call(name, text):
        barrier.wait()
        if name == "good":
            import time as _t

            _t.sleep(0.02)  # land inside the poisoned request's window
        try:
            results[name] = retriever.search([text], k=3)
        except Exception as e:  # noqa: BLE001
            errors[name] = e

    threads = [
        threading.Thread(target=call, args=("bad", "POISON me")),
        threading.Thread(target=call, args=("good", "passage text 7")),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert "bad" in errors and "poisoned" in str(errors["bad"])
    assert "good" in results and len(results["good"][0]) == 3


def test_search_roundtrip_int8(server_setup, tmp_path):
    """The int8 serving index behind the same Retriever surface: a query
    identical to a passage must still retrieve it first (quantization
    preserves the self-similarity argmax on this separable corpus)."""
    url, passages, _ = server_setup
    # build a second retriever on an int8 index over the same corpus
    import dataclasses as _dc

    d = tmp_path
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "passage", "text",
             "title", "query"] + [str(i) for i in range(20)]
    (d / "vocab.txt").write_text("\n".join(vocab) + "\n")
    from transformers import BertTokenizerFast

    BertTokenizerFast(vocab_file=str(d / "vocab.txt")).save_pretrained(str(d))
    tok = HFTokenizer(str(d), max_seq_len=12)
    cfg = dataclasses.replace(
        TransformerConfig.tiny(vocab_size=len(vocab)), dtype=jnp.float32
    )
    model = BiEncoder(cfg, shared=True)
    ids = jnp.ones((2, 12), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, ids, ids, ids)["params"]
    mesh = get_mesh(8)
    encoder = CorpusEncoder(model, params, mesh, use_query_tower=True)
    ctx_encoder = CorpusEncoder(model, params, mesh)
    texts = [passages[i]["text"] for i in range(20)]
    cids, cmask = tok(texts)
    emb = np.asarray(ctx_encoder._encode(params, cids, cmask), np.float32)
    index = MipsIndex(mesh, method="int8")
    index.add(emb)
    retriever = Retriever(encoder, tok, index, passages, default_k=3)
    results = retriever.search(["passage text 5"], k=3)
    scores = [c["score"] for c in results[0]]
    assert scores == sorted(scores, reverse=True)
    # this tiny random model's score margins are smaller than the int8
    # error bound, so ranks may legally reorder; the contract is
    # near-optimality: every returned score is within the quantization
    # bound of the exact score, and the returned top-1's exact score is
    # within two bounds of the true maximum
    qids, qmask = tok(["passage text 5"])
    q = np.asarray(encoder._encode(params, qids, qmask), np.float32)[0]
    exact = emb @ q
    qsc = np.abs(q).max() / 127.0

    def bound(row):
        sc_r = np.abs(emb[row]).max() / 127.0
        return (
            0.5 * np.abs(q).sum() * sc_r
            + 0.5 * np.abs(emb[row]).sum() * qsc
            + 0.25 * emb.shape[1] * sc_r * qsc
        )

    for c in results[0]:
        row = int(c["id"][1:])
        assert abs(c["score"] - exact[row]) <= bound(row) + 1e-5
    top1 = int(results[0][0]["id"][1:])
    best = int(np.argmax(exact))
    assert exact[top1] >= exact[best] - bound(top1) - bound(best) - 1e-5


# --------------------------------------------------------------------- #
# multi-vector (CITADEL) tower


@pytest.fixture(scope="module")
def citadel_server_setup(tmp_path_factory):
    """A CITADEL tower served over HTTP: tiny multivec model, passages
    encoded + indexed into the inverted expert index, same coalescing
    pipeline as the dense tower."""
    from dpr_scale_tpu.index.inverted import InvertedExpertIndex
    from dpr_scale_tpu.models.multivec import MultiVecEncoder
    from dpr_scale_tpu.retrieve.server import CitadelRetriever

    d = tmp_path_factory.mktemp("serve_mv")
    passages_path = d / "passages.tsv"
    with open(passages_path, "w") as f:
        f.write("id\ttext\ttitle\n")
        for i in range(20):
            f.write(f"d{i}\tpassage text {i}\ttitle {i}\n")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "passage", "text",
             "title", "query"] + [str(i) for i in range(20)]
    (d / "vocab.txt").write_text("\n".join(vocab) + "\n")
    from transformers import BertTokenizerFast

    BertTokenizerFast(vocab_file=str(d / "vocab.txt")).save_pretrained(str(d))
    tok = HFTokenizer(str(d), max_seq_len=12)

    cfg = dataclasses.replace(
        TransformerConfig.tiny(vocab_size=len(vocab)), dtype=jnp.float32
    )
    model = MultiVecEncoder(cfg, variant="citadel", tok_projection_dim=8)
    ids = jnp.ones((2, 12), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids, ids, topk=2)
    params = variables["params"]

    passages = CSVDataset(str(passages_path), cache_index=False)
    texts = [passages[i]["text"] for i in range(20)]
    cids, cmask = tok(texts)
    doc_out = model.apply(
        {"params": params}, jnp.asarray(cids), jnp.asarray(cmask), topk=2
    )
    index = InvertedExpertIndex(dim=8, num_docs=20)
    index.add_batch(range(20), {k: np.asarray(v) for k, v in doc_out.items()})
    index.finalize()

    retriever = CitadelRetriever(
        model, params, tok, index, passages, topk_route=2, default_k=3
    )
    server = make_server(None, "127.0.0.1", 0, citadel_retriever=retriever)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", passages, retriever
    server.shutdown()


def _post_path(url, path, payload):
    req = urllib.request.Request(
        url + path,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_citadel_healthz_and_routes(citadel_server_setup):
    url, _, _ = citadel_server_setup
    with urllib.request.urlopen(url + "/healthz") as resp:
        body = json.loads(resp.read())
    assert body["corpus_rows"] == 20
    assert body["towers"] == ["/search_citadel"]
    # the dense route is not configured on this server
    assert _post_path(url, "/search", {"questions": ["x"]})[0] == 404


def test_citadel_search_roundtrip(citadel_server_setup):
    """HTTP multivec search returns ranked ctxs that match the index
    searched directly with the same encoder output."""
    url, passages, retriever = citadel_server_setup
    status, body = _post_path(
        url, "/search_citadel", {"questions": ["passage text 3"], "k": 4}
    )
    assert status == 200
    results = body["results"]
    assert len(results) == 1 and 0 < len(results[0]) <= 4
    assert {"id", "title", "text", "score"} == set(results[0][0])
    scores = [c["score"] for c in results[0]]
    assert scores == sorted(scores, reverse=True)
    # cross-check against a direct (non-HTTP, non-coalesced) search
    direct = retriever.search(["passage text 3"], k=4)
    assert [c["id"] for c in results[0]] == [c["id"] for c in direct[0]]
    assert np.allclose(
        [c["score"] for c in results[0]], [c["score"] for c in direct[0]], atol=1e-5
    )


def test_citadel_concurrent_coalesced_load(citadel_server_setup):
    """16 concurrent HTTP callers through the two-stage pipeline: every
    response is correct for ITS question (no cross-request mixing when
    groups are coalesced, chunked, and pipelined)."""
    url, _, retriever = citadel_server_setup
    expected = {
        q: [c["id"] for c in retriever.search([q], k=3)[0]]
        for q in (f"passage text {i}" for i in range(8))
    }
    results, errors = {}, []

    def call(i):
        q = f"passage text {i % 8}"
        try:
            status, body = _post_path(
                url, "/search_citadel", {"questions": [q], "k": 3}
            )
            assert status == 200, body
            results[i] = (q, [c["id"] for c in body["results"][0]])
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert len(results) == 16
    for q, ids in results.values():
        assert ids == expected[q], (q, ids, expected[q])


def test_dense_pipeline_concurrent_load(server_setup):
    """Same concurrency drill for the dense tower, in the OPT-IN
    two-stage overlap mode (exercises the device-array payload hand-off
    between encode and search workers, which the serialized default
    never touches)."""
    url, _, retriever = server_setup
    results, errors = {}, []

    def call(i):
        q = f"passage text {i % 8}"
        try:
            status, body = _post(url, {"questions": [q], "k": 3})
            assert status == 200, body
            results[i] = (q, body["results"][0][0]["id"])
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(16)]
    retriever.serialized = False
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        retriever.serialized = True
    assert not errors and len(results) == 16
    for q, top1 in results.values():
        assert top1 == "d" + q.rsplit(" ", 1)[1]


def test_pipelined_mode_matches_serialized(server_setup):
    """`serialized=False` (the opt-in two-stage encode/search overlap —
    measured slower on one chip, kept for multi-device stages) must
    return byte-identical results and be toggleable on a live pipeline
    (tools/bench_serving_http.py --ab flips it between timed phases)."""
    url, _, retriever = server_setup
    assert retriever.serialized  # measured-faster default
    qs = [f"passage text {i}" for i in range(6)]
    status, serial = _post(url, {"questions": qs, "k": 5})
    assert status == 200
    retriever.serialized = False
    try:
        status, piped = _post(url, {"questions": qs, "k": 5})
    finally:
        retriever.serialized = True
    assert status == 200
    assert serial == piped
