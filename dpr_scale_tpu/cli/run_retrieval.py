"""End-to-end retrieval (reference run_retrieval.py / run_retrieval_fb.py /
run_retrieval_pytorch.py): encode (or load) query embeddings, exact-MIPS
search over all reps_* shards, join passages, write DPR JSON / TREC run.

Usage:
    python -m dpr_scale_tpu.cli.run_retrieval --config conf/nq.yaml \
        task.ctx_embeddings_dir=/out/embs \
        datamodule.test_path=nq-test.csv \
        datamodule.passages_path=psgs_w100.tsv \
        task.output_path=/out/retrieval.json
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from dpr_scale_tpu.cli.common import check_vocab_compat, build_task, build_tokenizer
from dpr_scale_tpu.config import load_config
from dpr_scale_tpu.data.datamodule import QueriesDataModule
from dpr_scale_tpu.retrieve.retrieval import retrieve


def main(argv=None):
    from dpr_scale_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    cfg = load_config(args.config, args.overrides)

    tokenizer = build_tokenizer(cfg)
    task = build_task(cfg)
    check_vocab_compat(tokenizer, task.cfg)
    d = cfg.datamodule
    emb_dir = cfg.task["ctx_embeddings_dir"]

    # query embeddings: precomputed pickle, or encode now
    qrep_path = cfg.task.get("query_emb_path") or os.path.join(
        emb_dir, "query_reps.pkl"
    )
    dm = QueriesDataModule(
        tokenizer,
        d["test_path"],
        batch_size=d.get("encode_batch_size", 128),
        trec_format=d.get("trec_format", False),
    )
    if os.path.exists(qrep_path):
        from dpr_scale_tpu.encode.embeddings import load_embedding_shard

        # the helper handles torch-tensor pickles (reference writer) too
        q_emb = np.asarray(load_embedding_shard(qrep_path), dtype=np.float32)
        print(f"Loaded query embeddings {q_emb.shape} from {qrep_path}")
    else:
        from dpr_scale_tpu.cli.generate_embeddings import _init_params
        from dpr_scale_tpu.encode.embeddings import CorpusEncoder

        params = _init_params(task, tokenizer, cfg.task.get("checkpoint_path"))
        encoder = CorpusEncoder(task.model, params, task.mesh, use_query_tower=True)
        q_emb, _ = encoder.encode_batches(dm.batches())
        print(f"Encoded {q_emb.shape[0]} queries")

    questions = dm.rows()
    assert len(questions) == q_emb.shape[0], (
        f"{len(questions)} questions vs {q_emb.shape[0]} query embeddings"
    )

    results = retrieve(
        q_emb,
        questions,
        passages_path=d["passages_path"],
        ctx_embeddings_dir=emb_dir,
        mesh=task.mesh,
        k=cfg.task.get("topk", 100),
        output_json_path=cfg.task.get("output_path"),
        output_trec_path=cfg.task.get("output_trec_path"),
        ignore_identical_ids=cfg.task.get("ignore_identical_ids", False),
        # host-resident blocks re-upload PER SWEEP: over a slow host link
        # one big sweep (query_batch >= num queries) pays the corpus
        # upload once instead of once per 512 queries
        query_batch=cfg.task.get("query_batch", 512),
        host_resident=cfg.task.get("host_resident_index", False),
        method=cfg.task.get("mips_method", "fused"),
        int8_query_planes=cfg.task.get("int8_query_planes"),
        rerank_oversample=cfg.task.get("rerank_oversample"),
        index_store=cfg.task.get("index_store"),
        device_rows=cfg.task.get("device_rows"),
    )
    print(f"Retrieved top-{cfg.task.get('topk', 100)} for {len(results)} questions")
    if cfg.task.get("output_path"):
        print(f"Wrote {cfg.task['output_path']}")
    return results


if __name__ == "__main__":
    main()
