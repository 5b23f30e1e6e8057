"""End-to-end cli/citadel_retrieval.py coverage (VERDICT r2 item 4).

Drives the full CLI path — multivec emission -> inverted-index shards ->
host / device-index / expert-parallel retrieval -> TREC output — and the
query-side embedding emission (GenerateMultiVecQueryEmbeddingsTask
parity, reference citadel_eval_task.py:120-213). Asserts:

  * host vs device-index CLI runs rank identically (scores to fp32
    tolerance — host numpy and XLA differ in last-ulp rounding);
  * device-index mesh(1) vs expert-parallel mesh(8) TREC outputs are
    BIT-IDENTICAL files (the docs/STATUS.md claim, now backed here);
  * query_emb_output_dir writes query_repr/weight/id/cls pickles in the
    reference shapes.
"""
import os
import pickle

import numpy as np
import pytest

CONF = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "conf")


@pytest.fixture(scope="module")
def citadel_setup(tmp_path_factory, tiny_bert_dir):
    tok_dir = tiny_bert_dir
    d = tmp_path_factory.mktemp("citadel_cli")
    words = list("abcdefghij")
    passages = d / "passages.tsv"
    with open(passages, "w") as f:
        f.write("id\ttext\ttitle\n")
        for i in range(12):
            w = words[i % len(words)]
            f.write(f"p{i}\t{w} {w} book {w}\tcity {i % 3}\n")
    queries = d / "queries.tsv"
    with open(queries, "w") as f:
        for i in range(5):
            f.write(f"q{i}\twhat {words[i]} book\n")

    base = [
        "--config", os.path.join(CONF, "tiny_smoke.yaml"),
        f"task.transform.model_path={tok_dir}",
        "task.model.vocab_size=32",
        "task.transform.max_seq_len=12",
        "task.type=multivec", "task.variant=citadel",
        "task.tok_projection_dim=8", "task.cls_projection_dim=8",
        "task.add_cls=true", "task.query_topk=1", "task.context_topk=2",
        f"datamodule.passages_path={passages}",
        f"datamodule.test_path={queries}",
        "datamodule.trec_format=true",
        "datamodule.encode_batch_size=4",
    ]

    from dpr_scale_tpu.cli.generate_multivec_embeddings import main as genmv_main

    genmv_main(
        base + [
            f"task.ctx_embeddings_dir={d}/cit_index",
            "task.weight_threshold=0.0", "task.shard=0", "task.num_shards=1",
        ]
    )
    return d, base


def _trec_rank(path):
    """{qid: [(docid, score), ...]} in file order."""
    out = {}
    for ln in open(path):
        qid, _q0, doc, _rank, score, _tag = ln.split()
        out.setdefault(qid, []).append((doc, float(score)))
    return out


def test_citadel_cli_host_vs_device_vs_expert_parallel(citadel_setup):
    d, base = citadel_setup
    from dpr_scale_tpu.cli.citadel_retrieval import main as cit_main

    common = base + [
        f"task.ctx_embeddings_dir={d}/cit_index", "task.topk=8",
        # fp32 postings: random-init scores have tiny margins, and host
        # (numpy fp32) vs device rankings must agree exactly here
        "task.device_index_dtype=float32",
    ]
    cit_main(common + [f"task.output_trec_path={d}/host.trec"])
    cit_main(
        common
        + ["task.device_index=true", f"task.output_trec_path={d}/dev.trec"]
    )
    cit_main(
        common
        + [
            "task.device_index=true", "task.expert_parallel=true",
            f"task.output_trec_path={d}/ep.trec",
        ]
    )

    host, dev = _trec_rank(f"{d}/host.trec"), _trec_rank(f"{d}/dev.trec")
    assert host.keys() == dev.keys() and len(host) == 5
    for q in host:
        assert [doc for doc, _s in host[q]] == [doc for doc, _s in dev[q]], q
        np.testing.assert_allclose(
            [s for _d, s in host[q]], [s for _d, s in dev[q]], rtol=1e-4, atol=1e-4
        )

    # single-device vs expert-parallel mesh(8): bit-identical TREC files
    assert open(f"{d}/dev.trec").read() == open(f"{d}/ep.trec").read()


def test_citadel_cli_query_embedding_emission(citadel_setup):
    d, base = citadel_setup
    from dpr_scale_tpu.cli.citadel_retrieval import main as cit_main

    out_dir = d / "qemb"
    cit_main(
        base
        + [
            f"task.ctx_embeddings_dir={d}/cit_index", "task.topk=4",
            f"task.query_emb_output_dir={out_dir}",
            f"task.output_trec_path={d}/qemb.trec",
        ]
    )
    repr_ = pickle.load(open(out_dir / "query_repr.pkl", "rb"))
    weight = pickle.load(open(out_dir / "query_weight.pkl", "rb"))
    qids = pickle.load(open(out_dir / "query_id.pkl", "rb"))
    cls = pickle.load(open(out_dir / "query_cls.pkl", "rb"))
    L = repr_.shape[1]  # padded to the longest query, <= max_seq_len
    assert repr_.shape == (5, L, 8) and L <= 12  # (n, L, tok_projection_dim)
    assert weight.shape == (5, L, 1)  # query_topk=1
    assert cls.shape == (5, 8)
    assert list(qids) == [f"q{i}" for i in range(5)]
    assert np.isfinite(repr_).all() and np.isfinite(cls).all()
