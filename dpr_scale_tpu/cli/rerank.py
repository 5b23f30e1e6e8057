"""Rerank TREC candidates with a dense bi-encoder, a multi-vector model, or
a cross-encoder (reference rerank tasks; SURVEY.md §2.2).

Usage:
    python -m dpr_scale_tpu.cli.rerank --config conf/tiny_smoke.yaml \
        task.rerank_type=dense \
        task.checkpoint_path=/ckpt/params_best \
        datamodule.trec_path=cand.trec \
        datamodule.queries_path=queries.tsv \
        datamodule.passages_path=passages.tsv \
        task.output_trec_path=reranked.trec
"""
from __future__ import annotations

import argparse

import jax

from dpr_scale_tpu.cli.common import check_vocab_compat, build_model_config, build_tokenizer
from dpr_scale_tpu.config import load_config
from dpr_scale_tpu.data.datasets import (
    IDCSVDataset,
    QueryTRECDataset,
    TRECCandidateDataset,
)
from dpr_scale_tpu.train.checkpoint import load_params


def main(argv=None):
    from dpr_scale_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    cfg = load_config(args.config, args.overrides)

    tokenizer = build_tokenizer(cfg)
    d = cfg.datamodule
    dataset = TRECCandidateDataset(
        d["trec_path"],
        QueryTRECDataset(d["queries_path"]),
        IDCSVDataset(d["passages_path"]),
    )
    mcfg = build_model_config(cfg)
    check_vocab_compat(tokenizer, mcfg)
    rerank_type = cfg.task.get("rerank_type", "dense")
    common = dict(
        batch_size=d.get("batch_size", 32),
        use_title=d.get("use_title", True),
        output_trec_path=cfg.task.get("output_trec_path"),
        output_pickle_dir=cfg.task.get("output_pickle_dir"),
        shard_id=cfg.task.get("shard", 0),
    )

    def restore(model, init_args, **init_kwargs):
        params = model.init(jax.random.PRNGKey(0), *init_args, **init_kwargs)["params"]
        ckpt = cfg.task.get("checkpoint_path")
        if ckpt:
            params = load_params(ckpt, params)
            print(f"Loaded params from {ckpt}")
        return params

    import jax.numpy as jnp

    L = tokenizer.max_seq_len
    dummy = jnp.ones((1, L), jnp.int32)

    if rerank_type == "dense":
        from dpr_scale_tpu.models import BiEncoder
        from dpr_scale_tpu.retrieve.rerank import rerank_dense

        model = BiEncoder(
            mcfg,
            projection_dim=cfg.task.model.get("projection_dim", 0),
            shared=cfg.task.get("shared_model", True),
        )
        params = restore(model, (dummy, dummy, dummy, dummy))
        out = rerank_dense(model, params, tokenizer, dataset, **common)
    elif rerank_type == "multivec":
        from dpr_scale_tpu.models.multivec import MultiVecEncoder
        from dpr_scale_tpu.retrieve.rerank import rerank_multivec

        model = MultiVecEncoder(
            mcfg,
            variant=cfg.task.get("variant", "citadel"),
            tok_projection_dim=cfg.task.get("tok_projection_dim"),
            cls_projection_dim=cfg.task.get("cls_projection_dim"),
        )
        params = restore(
            model,
            (dummy, dummy),
            topk=cfg.task.get("query_topk", 1),
            add_cls=cfg.task.get("add_cls", False),
        )
        out = rerank_multivec(
            model,
            params,
            tokenizer,
            dataset,
            query_topk=cfg.task.get("query_topk", 1),
            context_topk=cfg.task.get("context_topk", 1),
            add_cls=cfg.task.get("add_cls", False),
            query_pool=cfg.task.get("query_pool", "sum"),
            **common,
        )
    elif rerank_type == "cross_encoder":
        from dpr_scale_tpu.models.multivec import CrossEncoder
        from dpr_scale_tpu.retrieve.rerank import rerank_cross_encoder

        model = CrossEncoder(mcfg)
        params = restore(model, (dummy, dummy))
        out = rerank_cross_encoder(model, params, tokenizer, dataset, **common)
    else:
        raise ValueError(f"unknown rerank_type {rerank_type!r}")

    print(f"Reranked {len(out['scores'])} candidate pairs")
    return out


if __name__ == "__main__":
    main()
