"""Retrieval serving endpoint.

Usage:
    python -m dpr_scale_tpu.cli.serve --config conf/nq.yaml \
        task.checkpoint_path=/ckpt/params_best \
        task.ctx_embeddings_dir=/embs \
        datamodule.passages_path=psgs_w100.tsv \
        serve.port=8080 [serve.method=approx|int8|fused|...] [serve.k=10]

    serve.method=int8 stores the corpus per-row-quantized (half the HBM,
    ~2x the MXU rate); serve.method=fused serves verified-exact results.

    curl -XPOST localhost:8080/search -d '{"questions": ["who wrote hamlet"], "k": 5}'
"""
from __future__ import annotations

import argparse

from dpr_scale_tpu.cli.common import check_vocab_compat, build_task, build_tokenizer
from dpr_scale_tpu.config import load_config
from dpr_scale_tpu.data.datasets import CSVDataset
from dpr_scale_tpu.encode.embeddings import CorpusEncoder
from dpr_scale_tpu.retrieve.retrieval import build_index
from dpr_scale_tpu.retrieve.server import Retriever, make_server


def build_retriever(cfg) -> Retriever:
    """All the serving wiring short of binding the socket (split out so
    the suite can drive the full CLI path against a port-0 server)."""
    s = cfg.get("serve", {})

    tokenizer = build_tokenizer(cfg)
    task = build_task(cfg)
    check_vocab_compat(tokenizer, task.cfg)
    from dpr_scale_tpu.cli.generate_embeddings import _init_params

    params = _init_params(task, tokenizer, cfg.task.get("checkpoint_path"))
    encoder = CorpusEncoder(task.model, params, task.mesh, use_query_tower=True)

    method = s.get("method", "approx")  # serving default: low latency
    assert method in (
        "groupmax",
        "fused",
        "auto",
        "approx",
        "exact_sort",
        "int8",
        "int4",
    ), f"unknown serve.method {method!r}"
    # int8 quantizes at add() time, so the method must be set at build.
    # serve.index_store: prequantized int8 store dir (built on first
    # start, mmap-loaded afterwards — cold starts skip the fp32 pickle
    # read + requantization); serve.device_rows caps the HBM tier for
    # hybrid >HBM serving.
    index = build_index(
        cfg.task["ctx_embeddings_dir"],
        task.mesh,
        host_resident=cfg.task.get("host_resident_index", False),
        method=method,
        index_store=s.get("index_store"),
        device_rows=s.get("device_rows"),
    )
    # serve.int8_query_planes=2: int16-precision queries over the int8
    # corpus (recovers the query-side quantization recall loss at 2x
    # query MACs; corpus HBM/stream unchanged)
    index.int8_query_planes = int(s.get("int8_query_planes", 1))
    passages = CSVDataset(cfg.datamodule["passages_path"])

    retriever = Retriever(
        encoder,
        tokenizer,
        index,
        passages,
        default_k=s.get("k", 10),
        max_batch=s.get("max_batch", 64),
        # serve.pipelined=true opts into the two-stage encode/search
        # overlap — measured SLOWER on a single chip (see
        # retrieve/server.py docstring); only for multi-device stages
        serialized=not s.get("pipelined", False),
    )
    # warm the jit caches so the first request isn't a compile; k is a
    # static jit argument, so warm at the DEFAULT k real requests will use
    retriever.search(["warmup"], k=retriever.default_k)
    return retriever


def build_citadel_retriever(cfg):
    """Multi-vector (CITADEL) serving tower behind the same coalescing
    pipeline; configured from the ``serve_citadel`` config group (same
    keys as cli.citadel_retrieval's task group)."""
    from dpr_scale_tpu.cli.generate_multivec_embeddings import build_multivec_model
    from dpr_scale_tpu.index.inverted import InvertedExpertIndex
    from dpr_scale_tpu.retrieve.server import CitadelRetriever

    sc = cfg["serve_citadel"]
    tokenizer = build_tokenizer(cfg)
    model, params = build_multivec_model(cfg, tokenizer)
    check_vocab_compat(tokenizer, model.cfg)
    passages = CSVDataset(cfg.datamodule["passages_path"])
    index = InvertedExpertIndex.load(
        sc["ctx_embeddings_dir"],
        num_docs=len(passages),
        portion=sc.get("portion", 1.0),
        quantizer=sc.get("quantizer"),
    )
    if sc.get("device_index", True):  # serving default: device-resident
        import jax.numpy as jnp

        from dpr_scale_tpu.index.inverted_device import DeviceExpertIndex

        mesh = None
        if sc.get("expert_parallel", False):
            from dpr_scale_tpu.parallel import get_mesh

            mesh = get_mesh()
        didtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
            sc.get("device_index_dtype", "bfloat16")
        ]
        index = DeviceExpertIndex.from_host_index(index, dtype=didtype, mesh=mesh)
    retriever = CitadelRetriever(
        model,
        params,
        tokenizer,
        index,
        passages,
        topk_route=sc.get("query_topk", 1),
        add_cls=sc.get("add_cls", False),
        default_k=sc.get("k", 10),
        max_batch=sc.get("max_batch", 64),
        serialized=not sc.get("pipelined", False),
    )
    retriever.search(["warmup"], k=retriever.default_k)
    return retriever


def main(argv=None):
    from dpr_scale_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    cfg = load_config(args.config, args.overrides)
    s = cfg.get("serve", {})

    dense_configured = bool(cfg.get("task", {}).get("ctx_embeddings_dir"))
    retriever = build_retriever(cfg) if dense_configured else None
    citadel = build_citadel_retriever(cfg) if cfg.get("serve_citadel") else None
    host, port = s.get("host", "0.0.0.0"), s.get("port", 8080)
    server = make_server(retriever, host, port, citadel_retriever=citadel)
    towers = [t for t, r in (("dense", retriever), ("citadel", citadel)) if r]
    primary = retriever or citadel
    print(
        f"Serving retrieval ({'+'.join(towers)}) on {host}:{port} over "
        f"{primary.num_rows} passages"
    )
    server.serve_forever()


if __name__ == "__main__":
    main()
