"""Corpus embedding generation (reference generate_embeddings.py).

Usage:
    python -m dpr_scale_tpu.cli.generate_embeddings --config conf/nq.yaml \
        task.checkpoint_path=/ckpt/params_best \
        datamodule.passages_path=psgs_w100.tsv \
        task.ctx_embeddings_dir=/out/embs \
        task.shard=0 task.num_shards=1

Setting ``task.exported_encoder_path`` instead of a checkpoint drives the
pipeline from an AOT-exported StableHLO encoder (the reference's
TorchScript-checkpoint path, GenerateEmbeddingsJitTask,
dpr_scale/task/dpr_jit_eval_task.py); ``task.quantized_checkpoint_path``
loads int8 weight-only params.
"""
from __future__ import annotations

import argparse

import jax

from dpr_scale_tpu.cli.common import check_vocab_compat, build_model_config, build_task, build_tokenizer
from dpr_scale_tpu.config import load_config
from dpr_scale_tpu.data.datamodule import PassagesDataModule, contiguous_shard
from dpr_scale_tpu.encode.embeddings import CorpusEncoder
from dpr_scale_tpu.train.checkpoint import load_params


def _init_params(task, tokenizer, checkpoint_path):
    """Template params from a dummy batch, then restore the checkpoint."""
    import numpy as np

    L = tokenizer.max_seq_len
    dummy = {
        "query_ids": np.ones((1, L), np.int32),
        "query_mask": np.ones((1, L), np.int32),
        "contexts_ids": np.ones((2, L), np.int32),
        "contexts_mask": np.ones((2, L), np.int32),
    }
    state = task.init_state(jax.random.PRNGKey(0), dummy)
    if checkpoint_path:
        params = load_params(checkpoint_path, state.params)
        state = task.load_params(state, params)
        print(f"Loaded params from {checkpoint_path}")
    else:
        import warnings

        warnings.warn(
            "task.checkpoint_path is unset: encoding with RANDOM-INIT "
            "params (this environment has no pretrained weights). "
            "Retrieval quality will be garbage unless this is a test/demo."
        )
    return state.params


def main(argv=None):
    from dpr_scale_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("--queries", action="store_true", help="encode queries instead")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    cfg = load_config(args.config, args.overrides)

    tokenizer = build_tokenizer(cfg)
    task = build_task(cfg)
    check_vocab_compat(tokenizer, task.cfg)
    exported = cfg.task.get("exported_encoder_path")
    quantized = cfg.task.get("quantized_checkpoint_path")
    if exported:
        params = None
    elif quantized:
        from dpr_scale_tpu.utils.export import load_quantized

        params = load_quantized(quantized)
        print(f"Loaded int8-quantized params from {quantized}")
    else:
        params = _init_params(task, tokenizer, cfg.task.get("checkpoint_path"))
    out_dir = cfg.task.get("ctx_embeddings_dir", "embeddings")
    fmt = cfg.task.get("embeddings_format", "pickle")

    if args.queries:
        if exported:
            raise ValueError(
                "--queries with task.exported_encoder_path is not "
                "supported: the query pipeline does not drive exported "
                "StableHLO encoders (it would silently encode with no "
                "params). Use task.checkpoint_path or "
                "task.quantized_checkpoint_path for query encoding."
            )
        from dpr_scale_tpu.cli.generate_query_embeddings import encode_queries

        return encode_queries(cfg, task, params, tokenizer, out_dir)

    d = cfg.datamodule
    dm = PassagesDataModule(
        tokenizer,
        d["passages_path"],
        batch_size=d.get("encode_batch_size", 128),
        use_title=d.get("use_title", True),
        num_workers=d.get("num_workers", 0),
        sep_token=d.get("sep_token"),
    )
    shard = cfg.task.get("shard", 0)
    num_shards = cfg.task.get("num_shards", 1)
    if exported:
        encoder = CorpusEncoder.from_exported(exported, task.mesh)
        print(f"Using exported encoder from {exported}")
    else:
        # float16 halves the device->host transfer + shard bytes; all
        # shard readers upcast (task.embeddings_dtype, default float32)
        out_dtype = {"float32": "float32", "float16": "float16"}[
            cfg.task.get("embeddings_dtype", "float32")
        ]
        encoder = CorpusEncoder(task.model, params, task.mesh, out_dtype=out_dtype)
    rows = contiguous_shard(len(dm), shard, num_shards)
    path = encoder.encode_to_dir(
        dm.batches(shard, num_shards),
        out_dir,
        shard_id=shard,
        num_shards=num_shards,
        fmt=fmt,
        corpus_offset=rows.start,
    )
    print(f"Wrote {path} ({len(rows)} rows)")
    return path


if __name__ == "__main__":
    main()
