#!/usr/bin/env python3
"""Self-contained end-to-end demo: train -> encode -> retrieve -> evaluate.

No external data or pretrained weights needed (works in zero-egress
environments): synthesizes a small retrieval corpus with a locally built
WordPiece tokenizer, trains a small bi-encoder with in-batch negatives,
encodes the corpus into two shards, runs exact MIPS retrieval, and scores
answer recall with the QA eval harness.

    python examples/run_e2e_demo.py [--workdir /tmp/dpr_demo] [--epochs 20]

Expected output: Top1/Top5 accuracy close to 1.0 after ~20 epochs.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # demo runs anywhere; drop for TPU


WORDS = ["fox", "dog", "cat", "bird", "fish", "tree", "lake", "hill", "star", "moon"]


def make_data(workdir: str, n_docs: int = 60):
    os.makedirs(workdir, exist_ok=True)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    vocab += ["the", "quick", "where", "is", "doc", "about", "number"]
    vocab += WORDS + [str(i) for i in range(n_docs)]
    tok_dir = os.path.join(workdir, "tokenizer")
    os.makedirs(tok_dir, exist_ok=True)
    with open(os.path.join(tok_dir, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab) + "\n")
    from transformers import BertTokenizerFast

    BertTokenizerFast(
        vocab_file=os.path.join(tok_dir, "vocab.txt"), do_lower_case=True
    ).save_pretrained(tok_dir)

    passages = os.path.join(workdir, "passages.tsv")
    with open(passages, "w") as f:
        f.write("id\ttext\ttitle\n")
        for i in range(n_docs):
            w = WORDS[i % len(WORDS)]
            f.write(f"{i}\tthe quick {w} number {i}\tdoc {i}\n")

    train = os.path.join(workdir, "train.jsonl")
    with open(train, "w") as f:
        for i in range(n_docs):
            w = WORDS[i % len(WORDS)]
            row = {
                "question": f"where is {w} {i}",
                "positive_ctxs": [
                    {"title": f"doc {i}", "text": f"the quick {w} number {i}"}
                ],
                "hard_negative_ctxs": [
                    {
                        "title": f"doc {j}",
                        "text": f"the quick {WORDS[j % len(WORDS)]} number {j}",
                    }
                    for j in ((i + 1) % n_docs, (i + 7) % n_docs)
                ],
            }
            f.write(json.dumps(row) + "\n")

    queries = os.path.join(workdir, "queries.csv")
    with open(queries, "w") as f:
        for i in range(0, n_docs, 3):
            w = WORDS[i % len(WORDS)]
            f.write(f"where is {w} {i}\t['{w} number {i}']\n")
    return tok_dir, passages, train, queries, len(vocab)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--workdir", default="/tmp/dpr_scale_tpu_demo")
    parser.add_argument("--epochs", type=int, default=20)
    args = parser.parse_args()
    wd = args.workdir
    tok_dir, passages, train, queries, vocab_size = make_data(wd)
    conf = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "conf")

    base = [
        "--config", os.path.join(conf, "tiny_smoke.yaml"),
        f"task.transform.model_path={tok_dir}",
        f"task.model.vocab_size={vocab_size}",
        "task.model.hidden_size=32", "task.model.num_heads=2",
        "task.model.intermediate_size=64",
        "task.transform.max_seq_len=16",
    ]

    print("=== 1/4 train ===")
    from dpr_scale_tpu.cli.train import main as train_main

    train_main(
        base + [
            f"datamodule.train_path={train}",
            f"datamodule.val_path={train}",
            "datamodule.batch_size=12", "datamodule.num_negative=2",
            "task.optim.lr=0.003", "task.warmup_steps=5",
            f"checkpoint_callback.dirpath={wd}/ckpt",
            f"trainer.max_epochs={args.epochs}", "trainer.log_every=50",
        ]
    )

    enc = base + [
        f"task.checkpoint_path={wd}/ckpt/params_best",
        f"task.ctx_embeddings_dir={wd}/emb",
        f"datamodule.passages_path={passages}",
        f"datamodule.test_path={queries}",
        "datamodule.encode_batch_size=16",
    ]
    print("=== 2/4 encode corpus (2 shards) + queries ===")
    from dpr_scale_tpu.cli.generate_embeddings import main as gen_main
    from dpr_scale_tpu.cli.generate_query_embeddings import main as genq_main

    gen_main(enc + ["task.shard=0", "task.num_shards=2"])
    gen_main(enc + ["task.shard=1", "task.num_shards=2"])
    genq_main(enc)

    print("=== 3/4 retrieve ===")
    from dpr_scale_tpu.cli.run_retrieval import main as ret_main

    ret_main(
        enc + ["task.topk=5", f"task.output_path={wd}/retrieval.json"]
    )

    print("=== 4/5 evaluate ===")
    from dpr_scale_tpu.eval.qa_eval import evaluate_retrieval

    acc = evaluate_retrieval(f"{wd}/retrieval.json", topk=[1, 5])
    import numpy as np

    assert np.mean(acc[5]) > 0.5, "demo model failed to learn — unexpected"

    print("=== 5/5 CITADEL multi-vector: train + inverted index + retrieve ===")
    cit = base + [
        "task.type=multivec", "task.variant=citadel",
        "task.tok_projection_dim=8", "task.cls_projection_dim=8",
        "task.add_cls=true", "task.query_topk=1", "task.context_topk=2",
        "task.query_router_marg_load_loss_coef=0.01",
    ]
    train_main(
        cit + [
            f"datamodule.train_path={train}", f"datamodule.val_path={train}",
            "datamodule.batch_size=12", "datamodule.num_negative=1",
            "task.optim.lr=0.003", "task.warmup_steps=5",
            f"checkpoint_callback.dirpath={wd}/ckpt_cit",
            "trainer.max_epochs=4", "trainer.log_every=50",
        ]
    )
    from dpr_scale_tpu.cli.generate_multivec_embeddings import main as genmv_main

    genmv_main(
        cit + [
            f"task.checkpoint_path={wd}/ckpt_cit/params_best",
            f"datamodule.passages_path={passages}",
            f"task.ctx_embeddings_dir={wd}/cit_index",
            "task.weight_threshold=0.0", "task.shard=0", "task.num_shards=1",
        ]
    )
    # TREC-format query file for the retrieval CLI
    with open(f"{wd}/queries.tsv", "w") as f:
        for i, line in enumerate(open(queries)):
            f.write(f"q{i}\t{line.split(chr(9))[0]}\n")
    from dpr_scale_tpu.cli.citadel_retrieval import main as cit_main

    common = cit + [
        f"task.checkpoint_path={wd}/ckpt_cit/params_best",
        f"task.ctx_embeddings_dir={wd}/cit_index",
        f"datamodule.passages_path={passages}",
        f"datamodule.test_path={wd}/queries.tsv",
        "datamodule.trec_format=true",
    ]
    cit_main(common + [f"task.output_trec_path={wd}/cit_host.trec"])
    cit_main(
        common
        + ["task.device_index=true", f"task.output_trec_path={wd}/cit_dev.trec"]
    )
    host_top1 = [ln.split()[2] for ln in open(f"{wd}/cit_host.trec") if ln.split()[3] == "1"]
    dev_top1 = [ln.split()[2] for ln in open(f"{wd}/cit_dev.trec") if ln.split()[3] == "1"]
    agree = sum(h == d for h, d in zip(host_top1, dev_top1)) / max(1, len(host_top1))
    print(f"CITADEL host vs device top-1 agreement: {agree:.2f}")
    assert agree >= 0.9, "device index diverged from host search"
    print("demo complete:", wd)


if __name__ == "__main__":
    main()
