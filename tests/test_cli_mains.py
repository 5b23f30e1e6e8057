"""Drives for CLI mains that only had library-level coverage: rerank and
run_retrieval_multiset (reference entry points run_retrieval_multiset.py
and the rerank tasks, SURVEY.md §2.1/2.2). The grad_norm logging bug
showed wiring-level bugs hide exactly in these thin main() layers."""
import json
import os
import pickle

import numpy as np
import pytest

CONF = os.path.join(os.path.dirname(__file__), "..", "conf")


@pytest.fixture
def trec_files(tmp_path):
    passages = tmp_path / "passages.tsv"
    with open(passages, "w") as f:
        f.write("id\ttext\ttitle\n")
        for i in range(12):
            f.write(f"d{i}\tpassage text {i}\ttitle {i}\n")
    queries = tmp_path / "queries.tsv"
    queries.write_text("q1\twho wrote\nq2\twhat city\n")
    run = tmp_path / "cand.trec"
    run.write_text(
        "q1 Q0 d0 1 5.0 x\nq1 Q0 d1 2 4.0 x\nq1 Q0 d2 3 3.0 x\n"
        "q2 Q0 d3 1 5.0 x\nq2 Q0 d4 2 4.0 x\n"
    )
    return passages, queries, run


@pytest.mark.parametrize("rerank_type", ["dense", "cross_encoder"])
def test_rerank_cli_main(trec_files, tiny_bert_dir, tmp_path, rerank_type):
    from dpr_scale_tpu.cli.rerank import main

    passages, queries, run = trec_files
    out_trec = tmp_path / "reranked.trec"
    out = main(
        [
            "--config", os.path.join(CONF, "tiny_smoke.yaml"),
            f"task.rerank_type={rerank_type}",
            f"task.transform.model_path={tiny_bert_dir}",
            f"task.output_trec_path={out_trec}",
            f"datamodule.trec_path={run}",
            f"datamodule.queries_path={queries}",
            f"datamodule.passages_path={passages}",
            "datamodule.batch_size=4",
        ]
    )
    assert len(out["scores"]) == 5 and np.isfinite(out["scores"]).all()
    lines = out_trec.read_text().splitlines()
    assert len(lines) == 5
    q1 = [l.split() for l in lines if l.startswith("q1 ")]
    scores = [float(r[4]) for r in q1]
    assert scores == sorted(scores, reverse=True)


def test_serve_cli_wiring(trec_files, tiny_bert_dir, tmp_path):
    """Drive the serve CLI's full wiring (config -> retriever -> HTTP
    server) short of serve_forever: build via cli.serve.build_retriever,
    bind port 0, answer one real POST /search."""
    import http.client
    import threading

    from dpr_scale_tpu.cli.serve import build_retriever
    from dpr_scale_tpu.config import load_config
    from dpr_scale_tpu.retrieve.server import make_server

    passages, _, _ = trec_files
    rng = np.random.default_rng(1)
    reps = rng.normal(size=(12, 16)).astype(np.float32)
    emb_dir = tmp_path / "embs"
    emb_dir.mkdir()
    with open(emb_dir / "reps_0000.pkl", "wb") as f:
        pickle.dump(reps, f, protocol=4)

    cfg = load_config(
        os.path.join(CONF, "tiny_smoke.yaml"),
        [
            f"task.transform.model_path={tiny_bert_dir}",
            f"task.ctx_embeddings_dir={emb_dir}",
            f"datamodule.passages_path={passages}",
            "serve.method=fused", "serve.k=3",
        ],
    )
    retriever = build_retriever(cfg)
    server = make_server(retriever, host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port)
        conn.request(
            "POST", "/search",
            json.dumps({"questions": ["who wrote the book"], "k": 3}),
            {"Content-Type": "application/json"},
        )
        resp = conn.getresponse()
        data = json.loads(resp.read())
        assert resp.status == 200, data
        (ctxs,) = data["results"]
        assert len(ctxs) == 3
        assert all(c["id"].startswith("d") for c in ctxs)
        scores = [c["score"] for c in ctxs]
        assert scores == sorted(scores, reverse=True)
    finally:
        server.shutdown()


def test_run_retrieval_multiset_cli_main(trec_files, tiny_bert_dir, tmp_path):
    """Build the index ONCE, search two query sets (reference
    run_retrieval_multiset.py:107-161): outputs must match a numpy
    exact search per set."""
    from dpr_scale_tpu.cli.run_retrieval_multiset import main

    passages, _, _ = trec_files
    rng = np.random.default_rng(0)
    reps = rng.normal(size=(12, 16)).astype(np.float32)
    emb_dir = tmp_path / "embs"
    emb_dir.mkdir()
    with open(emb_dir / "reps_0000.pkl", "wb") as f:
        pickle.dump(reps, f, protocol=4)

    sets = []
    for s in range(2):
        q = rng.normal(size=(2, 16)).astype(np.float32)
        qp = tmp_path / f"q{s}.pkl"
        with open(qp, "wb") as f:
            pickle.dump(q, f, protocol=4)
        test_csv = tmp_path / f"queries{s}.csv"
        test_csv.write_text(
            f'question {s} a\t["ans"]\nquestion {s} b\t["ans"]\n'
        )
        sets.append(
            dict(
                query_emb_path=str(qp),
                test_path=str(test_csv),
                output_path=str(tmp_path / f"out{s}.json"),
                q=q,
            )
        )

    qs_override = "task.query_sets=[" + ", ".join(
        "{query_emb_path: %s, test_path: %s, output_path: %s}"
        % (s["query_emb_path"], s["test_path"], s["output_path"])
        for s in sets
    ) + "]"
    outputs = main(
        [
            "--config", os.path.join(CONF, "tiny_smoke.yaml"),
            f"task.transform.model_path={tiny_bert_dir}",
            f"task.ctx_embeddings_dir={emb_dir}",
            "task.topk=3",
            f"datamodule.passages_path={passages}",
            qs_override,
        ]
    )
    assert len(outputs) == 2
    for s in sets:
        with open(s["output_path"]) as f:
            results = json.load(f)
        assert len(results) == 2
        exact = np.argsort(-(s["q"] @ reps.T), axis=1)[:, :3]
        for row, ids in zip(results, exact):
            assert len(row["ctxs"]) == 3
            got = [c["id"] for c in row["ctxs"]]
            assert got == [f"d{j}" for j in ids], (got, ids)
