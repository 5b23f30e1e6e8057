"""Data-prep tool tests: each CLI run end-to-end on tiny fixtures."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_tool(name, *args):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", name), *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    return out.stdout


def test_prep_wiki_ict(tmp_path):
    tsv = tmp_path / "psgs.tsv"
    with open(tsv, "w") as f:
        f.write("id\ttext\ttitle\n")
        for i in range(10):
            f.write(
                f"{i}\tFirst sentence {i}. Second sentence {i}. Third one {i}.\tDoc {i}\n"
            )
    run_tool(
        "prep_wiki_ict.py", "--file_path", str(tsv),
        "--output_dir_path", str(tmp_path), "--dev_pct", "0.0",
    )
    rows = [json.loads(l) for l in open(tmp_path / "wiki_ict_train.jsonl")]
    assert len(rows) == 10
    r = rows[0]
    assert r["positive_ctxs"][0]["title"].startswith("Doc")
    # the query sentence is excluded from the positive passage
    assert r["question"] not in r["positive_ctxs"][0]["text"]
    assert r["positive_ctxs"][0]["score"] == 1000


def test_prep_wiki_ict_exp(tmp_path):
    tsv = tmp_path / "psgs.tsv"
    with open(tsv, "w") as f:
        f.write("id\ttext\ttitle\n")
        for d in range(2):
            for p in range(3):
                sents = " ".join(f"Sentence {d} {p} {s} here." for s in range(6))
                f.write(f"{d * 3 + p}\t{sents}\tDoc {d}\n")
    run_tool(
        "prep_wiki_ict_exp.py", "--file_path", str(tsv),
        "--output_dir_path", str(tmp_path), "--base", "2.0", "--dev_pct", "0.0",
    )
    rows = [json.loads(l) for l in open(tmp_path / "wiki_ict_exp_train.jsonl")]
    # passage 0 of each doc: 6/(2*1)=3 queries; p1: 6/4=2 (round); p2: 6/6=1
    assert len(rows) == 2 * (3 + 2 + 1)


def test_prep_msmarco_corpus(tmp_path):
    src = tmp_path / "corpus.jsonl"
    with open(src, "w") as f:
        for i in range(5):
            f.write(json.dumps({"docid": i, "text": f"text\t{i}\nx", "title": f"t {i}"}) + "\n")
    run_tool(
        "prep_msmarco_corpus.py", "--doc_path", str(src),
        "--output_dir_path", str(tmp_path),
    )
    lines = open(tmp_path / "msmarco_corpus.tsv").read().splitlines()
    assert lines[0] == "id\ttext\ttitle"
    assert len(lines) == 6
    assert lines[1] == "0\ttext 0 x\tt 0"  # tabs/newlines cleaned


def test_prep_msmarco_train(tmp_path):
    (tmp_path / "q.tsv").write_text("1\twho wrote\n2\twhat city\n")
    (tmp_path / "triples.tsv").write_text("1\t10\t20\n1\t10\t21\n2\t11\t22\n")
    run_tool(
        "prep_msmarco_train.py", "--query_file_path", str(tmp_path / "q.tsv"),
        "--qidpidtriples_path", str(tmp_path / "triples.tsv"),
        "--json_output_dir", str(tmp_path), "--ratio_of_dev", "0",
    )
    rows = [json.loads(l) for l in open(tmp_path / "official_train.jsonl")]
    assert len(rows) == 2
    r1 = next(r for r in rows if r["query_id"] == 1)
    assert r1["positive_ctxs"] == [{"docidx": 10}]
    assert r1["hard_negative_ctxs"] == [{"docidx": 20}, {"docidx": 21}]


def test_convert_trec_to_train(tmp_path):
    (tmp_path / "q.tsv").write_text("q1\twho wrote\n")
    with open(tmp_path / "run.trec", "w") as f:
        for rank in range(1, 61):
            f.write(f"q1 Q0 d{rank} {rank} {100 - rank}.5 run\n")
    run_tool(
        "convert_trec_to_train.py", "--query_tsv_path", str(tmp_path / "q.tsv"),
        "--trec_in_path", str(tmp_path / "run.trec"),
        "--json_out_path", str(tmp_path / "train.jsonl"),
    )
    rows = [json.loads(l) for l in open(tmp_path / "train.jsonl")]
    assert len(rows) == 1
    r = rows[0]
    assert len(r["positive_ctxs"]) == 10
    assert r["positive_ctxs"][0] == {"docidx": "d1", "relevance": 99.5}
    assert len(r["hard_negative_ctxs"]) == 5
    assert r["hard_negative_ctxs"][0]["docidx"] == "d46"


def test_prep_beir_eval(tmp_path):
    (tmp_path / "qrels").mkdir()
    with open(tmp_path / "corpus.jsonl", "w") as f:
        f.write(json.dumps({"_id": "d1", "text": "hello\tworld", "title": "T"}) + "\n")
    with open(tmp_path / "queries.jsonl", "w") as f:
        f.write(json.dumps({"_id": "q1", "text": "what"}) + "\n")
    (tmp_path / "qrels" / "test.tsv").write_text("query-id\tcorpus-id\tscore\nq1\td1\t1\n")
    run_tool("prep_beir_eval.py", "--data_dir", str(tmp_path))
    assert open(tmp_path / "collection.tsv").read() == "id\ttext\ttitle\nd1\thello world\tT\n"
    assert open(tmp_path / "queries.test.tsv").read() == "q1\twhat\n"
    assert open(tmp_path / "qrels.test.tsv").read() == "q1 0 d1 1\n"


def test_prep_conv_datasets(tmp_path):
    data = [
        {
            "messages-so-far": [
                {"speaker": "participant_1", "utterance": "hi"},
                {"speaker": "participant_2", "utterance": "hello"},
            ],
            "options-for-correct-answers": [
                {"candidate-id": "c1", "utterance": "the answer"}
            ],
            "options-for-next": [
                {"candidate-id": "c1", "utterance": "the answer"},
                {"candidate-id": "c2", "utterance": "a wrong one"},
            ],
        }
    ]
    (tmp_path / "in.json").write_text(json.dumps(data))
    run_tool(
        "prep_conv_datasets.py", "--in_file_path", str(tmp_path / "in.json"),
        "--out_file_path", str(tmp_path / "out.jsonl"),
    )
    rows = [json.loads(l) for l in open(tmp_path / "out.jsonl")]
    assert len(rows) == 1
    assert rows[0]["question"].startswith("1: hi")
    assert rows[0]["positive_ctxs"] == [{"text": "the answer", "title": ""}]
    assert rows[0]["hard_negative_ctxs"] == [{"text": "a wrong one", "title": ""}]


def test_crop_sentence(tmp_path):
    tsv = tmp_path / "collection.tsv"
    with open(tsv, "w") as f:
        f.write("id\ttext\ttitle\n")
        f.write("0\tThe fox jumps high. The dog sleeps now.\tA\n")
        f.write("1\tShort.\tB\n")  # under min_words: skipped
    run_tool(
        "crop_sentence.py", "--corpus_tsv_path", str(tsv),
        "--json_out_path", str(tmp_path / "crop.jsonl"),
    )
    rows = [json.loads(l) for l in open(tmp_path / "crop.jsonl")]
    assert len(rows) == 1
    assert rows[0]["positive_ctxs"] == [{"docidx": 0}]
    assert rows[0]["question"].endswith(".")


def test_prep_ccnews_ict(tmp_path):
    src = tmp_path / "news.jsonl"
    with open(src, "w") as f:
        for i in range(4):
            f.write(
                json.dumps(
                    {
                        "title": f"News {i}",
                        "text": f"Alpha {i} one. Beta {i} two. Gamma {i} three.",
                    }
                )
                + "\n"
            )
    run_tool(
        "prep_ccnews_ict.py", "--file_path", str(src),
        "--output_dir_path", str(tmp_path), "--dev_pct", "0.0",
    )
    rows = [json.loads(l) for l in open(tmp_path / "ccnews_ict_train.jsonl")]
    assert len(rows) == 4
    assert rows[0]["question"] not in rows[0]["positive_ctxs"][0]["text"]
    run_tool(
        "prep_ccnews_ict.py", "--file_path", str(src),
        "--output_dir_path", str(tmp_path), "--bfs", "--dev_pct", "0.0",
        "--chunk_sents", "1",
    )
    brows = [json.loads(l) for l in open(tmp_path / "ccnews_bfs_train.jsonl")]
    assert len(brows) == 4
    # BFS semantics (reference get_bfs_data): query from the FIRST chunk,
    # positive from a later chunk
    for r in brows:
        assert r["question"].startswith("Alpha")
        assert not r["positive_ctxs"][0]["text"].startswith("Alpha")


def test_prep_msmarco_jsonl(tmp_path):
    src = tmp_path / "msm.jsonl"
    with open(src, "w") as f:
        f.write(
            json.dumps(
                {
                    "query_id": "7",
                    "query": "who wrote",
                    "positive_passages": [{"docid": "d1", "text": "t", "title": "T"}],
                    "negative_passages": [{"docid": "d2", "text": "n"}],
                }
            )
            + "\n"
        )
    run_tool(
        "prep_msmarco_jsonl.py", "--doc_path", str(src),
        "--output_dir_path", str(tmp_path), "--dev_pct", "0",
    )
    rows = [json.loads(l) for l in open(tmp_path / "msmarco_exp_train.jsonl")]
    assert len(rows) == 1
    r = rows[0]
    assert r["question"] == "who wrote" and r["question_id"] == "7"
    assert r["positive_ctxs"] == [
        {"text": "t", "title": "T", "score": 1000, "title_score": 1, "passage_id": "d1"}
    ]
    assert r["hard_negative_ctxs"][0]["passage_id"] == "d2"


def test_corpus_stats(tmp_path):
    tsv = tmp_path / "collection.tsv"
    tsv.write_text("id\ttext\ttitle\n0\tone two three\tt\n1\tone two\tt t\n")
    out = run_tool("corpus_stats.py", "--path", str(tsv))
    stats = json.loads(out)
    assert stats["rows"] == 2
    assert stats["text_words"]["max"] == 3
    assert stats["title_words"]["max"] == 2

    jl = tmp_path / "train.jsonl"
    jl.write_text(
        json.dumps(
            {"question": "a b", "positive_ctxs": [{}], "hard_negative_ctxs": [{}, {}]}
        )
        + "\n"
    )
    stats = json.loads(run_tool("corpus_stats.py", "--path", str(jl)))
    assert stats["question_words"]["max"] == 2
    assert stats["hard_negatives_per_q"]["max"] == 2


def test_iter_tsv_rows_handles_csv_quoting(tmp_path):
    """psgs_w100-style quoted text fields parse like pandas read_csv
    (reference prep scripts), not raw tab-splitting."""
    sys.path.insert(0, REPO)
    from tools._text import iter_tsv_rows

    tsv = tmp_path / "psgs.tsv"
    tsv.write_text(
        'id\ttext\ttitle\n'
        '1\t"He said ""hi"" and left."\tDoc A\n'
        "2\tplain text\tDoc B\n"
    )
    rows = list(iter_tsv_rows(str(tsv)))
    assert rows[0] == (0, ["1", 'He said "hi" and left.', "Doc A"])
    assert rows[1] == (1, ["2", "plain text", "Doc B"])
    # headerless files index from 0 too
    tsv2 = tmp_path / "nohead.tsv"
    tsv2.write_text("7\talpha\tA\n8\tbeta\tB\n")
    rows2 = list(iter_tsv_rows(str(tsv2)))
    assert [r[0] for r in rows2] == [0, 1]
    assert rows2[0][1][0] == "7"


def test_tune_spar_weights_multiset(tmp_path):
    """Multiset grid search (reference grid_search_weights_multiset,
    spar_weight_tuning.py:200-224): shared ctx embeddings, per-dataset
    query embeddings + regex flags, per-dataset best weights."""
    import pickle

    import numpy as np

    rng = np.random.default_rng(0)
    D, N = 8, 12
    # passages: answer word "gold" appears only in passage 3; passage 7
    # matches the regex dataset's pattern
    with open(tmp_path / "psgs.tsv", "w") as f:
        f.write("id\ttext\ttitle\n")
        for i in range(N):
            text = "gold answer here" if i == 3 else (
                "code ab12 token" if i == 7 else f"plain text {i}")
            f.write(f"{i}\t{text}\tt{i}\n")

    p1 = rng.normal(size=(N, D)).astype(np.float32)
    p2 = rng.normal(size=(N, D)).astype(np.float32)
    for d, p in (("m1", p1), ("m2", p2)):
        os.makedirs(tmp_path / d, exist_ok=True)
        with open(tmp_path / d / "reps_0000.pkl", "wb") as f:
            pickle.dump(p, f, protocol=4)

    # dataset A: model-2 signal points at passage 3 (needs high weight)
    qa1 = rng.normal(size=(2, D)).astype(np.float32) * 0.01
    qa2 = np.tile(p2[3], (2, 1)).astype(np.float32)
    # dataset B (regex): model-1 already points at passage 7
    qb1 = np.tile(p1[7], (2, 1)).astype(np.float32)
    qb2 = rng.normal(size=(2, D)).astype(np.float32) * 0.01
    for name, (e1, e2) in {"qa.pkl": (qa1, qa2), "qb.pkl": (qb1, qb2)}.items():
        with open(tmp_path / "m1" / name, "wb") as f:
            pickle.dump(e1, f, protocol=4)
        with open(tmp_path / "m2" / name, "wb") as f:
            pickle.dump(e2, f, protocol=4)

    with open(tmp_path / "a.csv", "w") as f:
        f.write("who has gold\t['gold']\nwhere is gold\t['gold']\n")
    with open(tmp_path / "b.csv", "w") as f:
        f.write("code query\t['ab\\\\d+']\ncode again\t['ab\\\\d+']\n")

    out_json = tmp_path / "out.json"
    stdout = run_tool(
        "tune_spar_weights.py",
        "--queries", str(tmp_path / "a.csv"), str(tmp_path / "b.csv"),
        "--query_emb_names", "qa.pkl", "qb.pkl",
        "--use_regex", "0", "1",
        "--tsv_passages_path", str(tmp_path / "psgs.tsv"),
        "--ctx_embeddings_dir_1", str(tmp_path / "m1"),
        "--ctx_embeddings_dir_2", str(tmp_path / "m2"),
        "--weights", "0.0", "1.0", "5.0",
        "--topk", "5", "--eval_on_ks", "1", "5", "--valid_on_k", "1",
        "--output_json", str(out_json),
    )
    assert "Best weights per dataset" in stdout
    result = json.load(open(out_json))
    # dataset A only hits with a positive weight on model 2
    assert result["a.csv"]["best_weight"] > 0.0
    assert result["a.csv"]["recalls"]["5.0"]["1"] == 1.0
    assert result["a.csv"]["recalls"]["0.0"]["1"] == 0.0
    # dataset B: regex matching finds ab12; weight 0 already perfect
    assert result["b.csv"]["recalls"]["0.0"]["1"] == 1.0
