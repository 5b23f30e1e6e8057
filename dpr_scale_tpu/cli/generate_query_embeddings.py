"""Query embedding generation (reference generate_query_embeddings.py):
writes ``query_reps.pkl`` into the context embeddings dir by default
(reference dpr_eval_task.py:52-84)."""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

from dpr_scale_tpu.cli.common import check_vocab_compat, build_task, build_tokenizer
from dpr_scale_tpu.config import load_config
from dpr_scale_tpu.data.datamodule import QueriesDataModule
from dpr_scale_tpu.encode.embeddings import CorpusEncoder


def encode_queries(cfg, task, params, tokenizer, out_dir) -> str:
    d = cfg.datamodule
    dm = QueriesDataModule(
        tokenizer,
        d["test_path"],
        batch_size=d.get("encode_batch_size", 128),
        trec_format=d.get("trec_format", False),
    )
    encoder = CorpusEncoder(task.model, params, task.mesh, use_query_tower=True)
    emb, _ids = encoder.encode_batches(dm.batches())
    os.makedirs(out_dir, exist_ok=True)
    path = cfg.task.get("query_emb_output_path") or os.path.join(
        out_dir, "query_reps.pkl"
    )
    with open(path, "wb") as f:
        pickle.dump(np.ascontiguousarray(emb), f, protocol=4)
    print(f"Wrote {path} ({emb.shape[0]} queries)")
    return path


def main(argv=None):
    from dpr_scale_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    from dpr_scale_tpu.cli.generate_embeddings import _init_params

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    cfg = load_config(args.config, args.overrides)

    tokenizer = build_tokenizer(cfg)
    task = build_task(cfg)
    check_vocab_compat(tokenizer, task.cfg)
    params = _init_params(task, tokenizer, cfg.task.get("checkpoint_path"))
    out_dir = cfg.task.get("ctx_embeddings_dir", "embeddings")
    return encode_queries(cfg, task, params, tokenizer, out_dir)


if __name__ == "__main__":
    main()
