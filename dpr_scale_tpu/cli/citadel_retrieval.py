"""End-to-end CITADEL/COIL retrieval over the inverted expert index
(reference CITADELRetrievalTask, dpr_scale/task/citadel_retrieval_task.py —
whose index module is missing on the surveyed branch; behavior rebuilt in
dpr_scale_tpu.index.inverted).

Usage:
    python -m dpr_scale_tpu.cli.citadel_retrieval --config conf/citadel.yaml \
        task.checkpoint_path=/ckpt/params_best \
        task.ctx_embeddings_dir=/out/citadel_index \
        datamodule.test_path=queries.tsv datamodule.trec_format=true \
        datamodule.passages_path=corpus.tsv \
        task.output_trec_path=/out/citadel.trec
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from dpr_scale_tpu.cli.common import check_vocab_compat, build_tokenizer
from dpr_scale_tpu.cli.generate_multivec_embeddings import build_multivec_model
from dpr_scale_tpu.config import load_config
from dpr_scale_tpu.data.datamodule import QueriesDataModule
from dpr_scale_tpu.data.datasets import CSVDataset
from dpr_scale_tpu.index.inverted import InvertedExpertIndex
from dpr_scale_tpu.retrieve.writers import write_dpr_json, write_trec_run


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
    passages = CSVDataset(d["passages_path"])
    index = InvertedExpertIndex.load(
        cfg.task["ctx_embeddings_dir"],
        num_docs=len(passages),
        portion=cfg.task.get("portion", 1.0),
        quantizer=cfg.task.get("quantizer"),
    )
    print(f"Loaded inverted index: {index.stats()}")
    if cfg.task.get("device_index", False):
        # TPU-native bucketed search (the reference's `cuda`/IVFGPUIndex
        # switch, citadel_retrieval_task.py:56-60); task.expert_parallel
        # shards the expert axis over the device mesh (the reference's
        # expert_parallel flag, citadel_retrieval_task.py:29,44)
        from dpr_scale_tpu.index.inverted_device import DeviceExpertIndex

        mesh = None
        if cfg.task.get("expert_parallel", False):
            from dpr_scale_tpu.parallel import get_mesh

            mesh = get_mesh()
        # bf16 postings halve HBM (default); float32 reproduces the host
        # search bit-for-bit (debug / tight-margin corpora)
        didtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
            cfg.task.get("device_index_dtype", "bfloat16")
        ]
        index = DeviceExpertIndex.from_host_index(index, dtype=didtype, mesh=mesh)
        print(
            "Using device-resident expert index"
            + (f" (expert-parallel over {mesh.devices.size} devices)" if mesh else "")
        )

    dm = QueriesDataModule(
        tokenizer,
        d["test_path"],
        batch_size=d.get("encode_batch_size", 32),
        trec_format=d.get("trec_format", False),
    )
    questions = dm.rows()
    topk_route = cfg.task.get("query_topk", 1)
    add_cls = cfg.task.get("add_cls", False)
    encode = jax.jit(
        lambda ids, mask: model.apply(
            {"params": params}, ids, mask, topk=topk_route, add_cls=add_cls,
            routing_stats=False,  # training-only (B, vocab) planes: skip
            # computing AND fetching them over the tunnel
        )
    )

    k = cfg.task.get("topk", 100)
    all_scores, all_rows = [], []
    query_dump = [] if cfg.task.get("query_emb_output_dir") else None
    t_encode = 0.0
    for batch in dm.batches():
        tic = time.perf_counter()
        out = encode(jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"]))
        out = {key: np.asarray(v) for key, v in out.items()}
        t_encode += time.perf_counter() - tic
        n = batch["input_ids"].shape[0] - int(batch["pad_count"])
        out = {key: (v[:n] if np.ndim(v) > 0 else v) for key, v in out.items()}
        if query_dump is not None:
            query_dump.append(out)
        s, r = index.search(out, topk=k)
        all_scores.append(s)
        all_rows.append(r)

    if query_dump is not None:
        # query-side emission parity (GenerateMultiVecQueryEmbeddingsTask,
        # citadel_eval_task.py:120-213): query_repr/weight/id/cls pickles
        import os
        import pickle

        out_dir = cfg.task["query_emb_output_dir"]
        os.makedirs(out_dir, exist_ok=True)
        payloads = {
            "query_repr.pkl": np.concatenate([d["expert_repr"] for d in query_dump]),
            "query_weight.pkl": np.concatenate(
                [d["expert_weights"] for d in query_dump]
            )
            if "expert_weights" in query_dump[0]
            else None,
            "query_id.pkl": [q.get("id", i) for i, q in enumerate(questions)],
            "query_cls.pkl": np.concatenate([d["cls_repr"] for d in query_dump])
            if "cls_repr" in query_dump[0]
            else None,
        }
        for name, payload in payloads.items():
            if payload is None:
                continue
            with open(os.path.join(out_dir, name), "wb") as f:
                pickle.dump(payload, f, protocol=4)
        print(f"Wrote query-side embeddings to {out_dir}")
    scores = np.concatenate(all_scores, 0)
    rows = np.concatenate(all_rows, 0)
    index.latency["encode_time"] = t_encode
    print("latency:", dict(index.latency))

    results = []
    for qi in range(len(questions)):
        ctxs = []
        for sc, row in zip(scores[qi], rows[qi]):
            if row < 0:  # placeholder slot (query touched < k docs)
                continue
            p = passages[int(row)]
            ctxs.append(
                {
                    "id": p.get("id", str(int(row))),
                    "title": p.get("title", ""),
                    "text": p.get("text", ""),
                    "score": float(sc),
                }
            )
        results.append(ctxs)

    if cfg.task.get("output_path"):
        write_dpr_json(cfg.task["output_path"], questions, results)
        print(f"Wrote {cfg.task['output_path']}")
    if cfg.task.get("output_trec_path"):
        qids = [str(q.get("id", i)) for i, q in enumerate(questions)]
        write_trec_run(
            cfg.task["output_trec_path"],
            qids,
            [[c["id"] for c in ctxs] for ctxs in results],
            [[c["score"] for c in ctxs] for ctxs in results],
        )
        print(f"Wrote {cfg.task['output_trec_path']}")
    return results


if __name__ == "__main__":
    main()
