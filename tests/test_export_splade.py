"""Export path (AOT + int8), SPLADE bi-encoder task, contiguous sampling."""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpr_scale_tpu.models import DenseEncoder, TransformerConfig
from dpr_scale_tpu.models.encoder import SpladeBiEncoder
from dpr_scale_tpu.optim import make_optimizer
from dpr_scale_tpu.train.task import DenseRetrieverTask
from dpr_scale_tpu.utils.export import (
    export_encoder,
    load_exported_encoder,
    load_quantized,
    quantize_params,
    dequantize_params,
    save_quantized,
)

CFG = dataclasses.replace(TransformerConfig.tiny(), dtype=jnp.float32)


def test_export_roundtrip(tmp_path):
    model = DenseEncoder(CFG, projection_dim=8)
    ids = jnp.ones((2, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)

    def encode(params, input_ids, attention_mask):
        return model.apply(params, input_ids, attention_mask)

    export_encoder(encode, params, batch_size=2, seq_len=8, path=str(tmp_path / "exp"))
    assert (tmp_path / "exp" / "encoder.stablehlo").exists()

    call, loaded_params, meta = load_exported_encoder(str(tmp_path / "exp"))
    assert meta == {"batch_size": 2, "seq_len": 8}
    rng = np.random.default_rng(0)
    test_ids = jnp.asarray(rng.integers(1, 30, (2, 8)), jnp.int32)
    mask = jnp.ones_like(test_ids)
    got = call(loaded_params, test_ids, mask)
    expected = model.apply(params, test_ids, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-5)


def test_int8_quantization_roundtrip(tmp_path):
    model = DenseEncoder(CFG)
    ids = jnp.ones((2, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)["params"]
    q = quantize_params(params)
    # kernels got quantized (int8 entries exist)
    assert any("int8" in e for e in q["leaves"].values())
    deq = dequantize_params(q)
    # structure preserved; values close (per-channel int8)
    orig_leaves = jax.tree_util.tree_leaves(params)
    deq_leaves = jax.tree_util.tree_leaves(deq)
    assert len(orig_leaves) == len(deq_leaves)
    for o, d in zip(orig_leaves, deq_leaves):
        np.testing.assert_allclose(np.asarray(o), np.asarray(d), atol=0.02)
    # model outputs close after quantization
    out_q = model.apply({"params": load_quantized(save_quantized(str(tmp_path / "q.pkl"), params))}, ids)
    out_f = model.apply({"params": params}, ids)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_f), atol=0.05)


def test_splade_task_trains():
    cfg = dataclasses.replace(TransformerConfig.tiny(vocab_size=32), dtype=jnp.float32)
    task = DenseRetrieverTask(
        cfg=cfg,
        encoder_family="splade",
        optimizer=make_optimizer("adamw", 1e-3, grad_clip_norm=2.0),
    )
    rng = np.random.default_rng(0)
    B, C, L = 4, 2, 8
    batch = {
        "query_ids": rng.integers(5, 32, (B, L)).astype(np.int32),
        "query_mask": np.ones((B, L), np.int32),
        "contexts_ids": rng.integers(5, 32, (B * C, L)).astype(np.int32),
        "contexts_mask": np.ones((B * C, L), np.int32),
        "pos_ctx_indices": (np.arange(B) * C).astype(np.int32),
        "scores": np.zeros((B, C), np.float32),
        "ctx_mask": np.zeros((B * C,), bool),
    }
    state = task.init_state(jax.random.PRNGKey(0), batch)
    step = task.make_train_step()
    sb = task.shard(batch)
    state, m0 = step(state, sb)
    l0 = float(m0["train_loss"])
    for _ in range(20):
        state, m = step(state, sb)
    assert float(m["train_loss"]) < l0
    # splade embeddings are vocab-sized and non-negative
    emb = task.model.apply(
        {"params": state.params},
        jnp.asarray(batch["query_ids"]),
        jnp.asarray(batch["query_mask"]),
        method=task.model.encode_query,
    )
    assert emb.shape == (B, 32)
    assert float(jnp.min(emb)) >= 0.0


def test_contiguous_chunk_sampling(dpr10_jsonl, tiny_bert_dir):
    from dpr_scale_tpu.data import HFTokenizer
    from dpr_scale_tpu.data.datamodule import DenseRetrieverDataModule

    tok = HFTokenizer(tiny_bert_dir, max_seq_len=16)
    dm = DenseRetrieverDataModule(
        tok, train_path=dpr10_jsonl, batch_size=5, num_negative=0,
        drop_last=False, contiguous_chunks=2,
    )
    # first batch must only contain rows from the first half (chunk 0)
    batches = list(dm.train_batches(0))
    assert len(batches) == 2
    # reconstruct which questions appeared in batch 0 via token ids
    # (questions are "who wrote book {i}" with distinct i)
    # chunk 0 = rows 0-4, so batch 0 contains exactly rows 0-4 shuffled
    q0 = {tuple(row) for row in batches[0]["query_ids"].tolist()}
    from dpr_scale_tpu.data import MemoryMappedDataset
    from dpr_scale_tpu.data.example import DPRExampleBuilder

    ds = MemoryMappedDataset(dpr10_jsonl)
    import json as _json

    first_half_questions = {
        _json.loads(ds[i])["question"] for i in range(5)
    }
    got_ids, _ = tok(sorted(first_half_questions))
    assert {tuple(r) for r in got_ids.tolist()} == q0
