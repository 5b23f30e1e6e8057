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
