"""Multi-dataset retrieval: build the MIPS index once, search many query
sets (reference run_retrieval_multiset.py:107-161).

Usage:
    python -m dpr_scale_tpu.cli.run_retrieval_multiset --config conf/nq.yaml \
        task.ctx_embeddings_dir=/embs \
        datamodule.passages_path=psgs.tsv \
        'task.query_sets=[{query_emb_path: q1.pkl, test_path: q1.csv, output_path: out1.json}, ...]'
"""
from __future__ import annotations

import argparse

import numpy as np

from dpr_scale_tpu.cli.common import check_vocab_compat, build_task, build_tokenizer
from dpr_scale_tpu.config import load_config
from dpr_scale_tpu.data.datamodule import QueriesDataModule
from dpr_scale_tpu.retrieve.retrieval import build_index, retrieve


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
    index = build_index(
        cfg.task["ctx_embeddings_dir"], task.mesh,
        host_resident=cfg.task.get("host_resident_index", False),
        method=cfg.task.get("mips_method", "fused"),
    )
    outputs = []
    for qs in cfg.task["query_sets"]:
        from dpr_scale_tpu.encode.embeddings import load_embedding_shard

        # handles torch-tensor pickles (reference writer) too
        q_emb = np.asarray(
            load_embedding_shard(qs["query_emb_path"]), dtype=np.float32
        )
        dm = QueriesDataModule(
            tokenizer, qs["test_path"], trec_format=qs.get("trec_format", False)
        )
        questions = dm.rows()
        retrieve(
            q_emb,
            questions,
            passages_path=d["passages_path"],
            ctx_embeddings_dir=cfg.task["ctx_embeddings_dir"],
            mesh=task.mesh,
            k=cfg.task.get("topk", 100),
            output_json_path=qs.get("output_path"),
            output_trec_path=qs.get("output_trec_path"),
            index=index,
        )
        outputs.append(qs.get("output_path"))
        print(f"Wrote {qs.get('output_path')}")
    return outputs


if __name__ == "__main__":
    main()
