"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

The reference has no multi-device tests at all (SURVEY.md §4); here every
sharded code path (global in-batch negatives, contiguous corpus sharding,
cross-shard top-k merge) is exercised on a simulated mesh.
"""
import os

# The suite is CPU-only by design, but the axon TPU plugin registers an
# in-process tunnel client from sitecustomize at interpreter startup
# whenever PALLAS_AXON_POOL_IPS is set. Strip the trigger var so every
# child process this suite spawns (CLI-tool tests, sweep, supervisor)
# starts WITHOUT the plugin — children otherwise each claim the TPU
# tunnel at interpreter start, contending with any concurrent TPU work.
# (Historical note: the suite's flaky "Fatal Python error: Aborted" was
# NOT this — it was XLA's CPU collective rendezvous hard 40 s
# termination timeout under a long async SPMD dispatch queue; see
# test_tasks_extra.py::test_distill_task_learns.)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")  # stabilize torch-side numerics
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

# The axon sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon already in the environment, so the env var above is
# too late — override the live config instead (backends init lazily, so
# this sticks as long as no jax computation ran yet).
import jax

jax.config.update("jax_platforms", "cpu")

# The suite has aborted with a bare "Fatal Python error" when ANOTHER
# process used the TPU concurrently (axon plugin contention — the plugin
# initializes in every python process via sitecustomize). Dump tracebacks
# of all threads on such a crash so the dying test is identifiable.
import faulthandler

faulthandler.enable(all_threads=True)

import json

import numpy as np
import pytest


@pytest.fixture(scope="session")
def tiny_bert_dir(tmp_path_factory):
    """A tiny random BERT tokenizer+config dir (32-token vocab).

    Mirrors the reference's ``create_bert_tiny`` fixture pattern
    (dpr_scale/datamodule/tests/test_datamodule.py:13-18).
    """
    d = tmp_path_factory.mktemp("tiny_bert")
    vocab = (
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
        + list("abcdefghijklmnopqrst")
        + ["who", "what", "book", "city", "text", "title", "0"]
    )
    vocab_file = d / "vocab.txt"
    vocab_file.write_text("\n".join(vocab) + "\n")

    from transformers import BertTokenizerFast

    tok = BertTokenizerFast(vocab_file=str(vocab_file), do_lower_case=True)
    tok.save_pretrained(str(d))
    return str(d)


@pytest.fixture(scope="session")
def dpr10_jsonl(tmp_path_factory):
    """10 DPR training rows with 1-2 positives and 0-4 hard negatives."""
    d = tmp_path_factory.mktemp("data")
    path = d / "dpr10.jsonl"
    rng = np.random.default_rng(0)
    rows = []
    for i in range(10):
        n_pos = 1 + (i % 2)
        n_neg = i % 5
        rows.append(
            {
                "question": f"who wrote book {i}",
                "positive_ctxs": [
                    {
                        "title": f"title {i} {j}",
                        "text": f"text pos {i} {j}",
                        "score": float(10 + j),
                        "relevance": float(1 + j),
                    }
                    for j in range(n_pos)
                ],
                "hard_negative_ctxs": [
                    {
                        "title": f"neg title {i} {j}",
                        "text": f"text neg {i} {j}",
                        "score": float(rng.integers(0, 5)),
                        "relevance": 1.0,
                    }
                    for j in range(n_neg)
                ],
            }
        )
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(path)


@pytest.fixture(scope="session")
def dpr10_tsv(tmp_path_factory):
    """Passage corpus TSV: id \t text \t title with header, 10 rows."""
    d = tmp_path_factory.mktemp("corpus")
    path = d / "dpr10.tsv"
    with open(path, "w") as f:
        f.write("id\ttext\ttitle\n")
        for i in range(10):
            f.write(f"{i}\tpassage text {i}\tpassage title {i}\n")
    return str(path)
