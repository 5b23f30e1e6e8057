"""Multi-vector corpus emission: encode passages and write inverted-index
shards in the reference format (GenerateMultiVecEmbeddingsTask,
dpr_scale/task/citadel_eval_task.py:16-118).

Usage:
    python -m dpr_scale_tpu.cli.generate_multivec_embeddings --config conf/citadel.yaml \
        task.checkpoint_path=/ckpt/params_best \
        datamodule.passages_path=corpus.tsv \
        task.ctx_embeddings_dir=/out/citadel_index \
        task.weight_threshold=0.0 task.shard=0 task.num_shards=1
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from dpr_scale_tpu.cli.common import check_vocab_compat, build_model_config, build_tokenizer
from dpr_scale_tpu.config import load_config
from dpr_scale_tpu.data.datamodule import PassagesDataModule, contiguous_shard
from dpr_scale_tpu.index.inverted import InvertedExpertIndex
from dpr_scale_tpu.models.multivec import MultiVecEncoder
from dpr_scale_tpu.train.checkpoint import load_params


def build_multivec_model(cfg, tokenizer):
    mcfg = build_model_config(cfg)
    model = MultiVecEncoder(
        mcfg,
        variant=cfg.task.get("variant", "citadel"),
        tok_projection_dim=cfg.task.get("tok_projection_dim"),
        cls_projection_dim=cfg.task.get("cls_projection_dim"),
    )
    L = tokenizer.max_seq_len
    dummy = jnp.ones((1, L), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0),
        dummy,
        dummy,
        topk=cfg.task.get("context_topk", 1),
        add_cls=cfg.task.get("add_cls", False),
    )["params"]
    ckpt = cfg.task.get("checkpoint_path")
    if ckpt:
        params = load_params(ckpt, params)
        print(f"Loaded params from {ckpt}")
    return model, params


def main(argv=None):
    from dpr_scale_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    cfg = load_config(args.config, args.overrides)

    tokenizer = build_tokenizer(cfg)
    model, params = build_multivec_model(cfg, tokenizer)
    check_vocab_compat(tokenizer, model.cfg)
    d = cfg.datamodule
    dm = PassagesDataModule(
        tokenizer,
        d["passages_path"],
        batch_size=d.get("encode_batch_size", 64),
        use_title=d.get("use_title", True),
        num_workers=d.get("num_workers", 0),
        sep_token=d.get("sep_token"),
    )
    shard = cfg.task.get("shard", 0)
    num_shards = cfg.task.get("num_shards", 1)
    rows = contiguous_shard(len(dm), shard, num_shards)

    topk = cfg.task.get("context_topk", 1)
    add_cls = cfg.task.get("add_cls", False)
    encode = jax.jit(
        lambda ids, mask: model.apply(
            {"params": params}, ids, mask, topk=topk, add_cls=add_cls,
            routing_stats=False,  # training-only planes: skip compute+fetch
        )
    )

    dim = cfg.task.get("tok_projection_dim") or build_model_config(cfg).hidden_size
    index = InvertedExpertIndex(dim=dim, num_docs=len(dm))
    row_cursor = rows.start
    threshold = cfg.task.get("weight_threshold", 0.0)
    for batch in dm.batches(shard, num_shards):
        out = encode(jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"]))
        out = {k: np.asarray(v) for k, v in out.items()}
        n = batch["input_ids"].shape[0] - int(batch["pad_count"])
        out = {k: (v[:n] if np.ndim(v) > 0 else v) for k, v in out.items()}
        index.add_batch(range(row_cursor, row_cursor + n), out, threshold)
        row_cursor += n

    index.finalize(quantizer=cfg.task.get("quantizer"))
    index.save(cfg.task["ctx_embeddings_dir"], shard_id=shard)
    print(
        f"Wrote expert shard {shard} to {cfg.task['ctx_embeddings_dir']}: "
        f"{index.stats()}"
    )
    return index.stats()


if __name__ == "__main__":
    main()
