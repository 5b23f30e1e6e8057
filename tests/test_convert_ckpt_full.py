"""Checkpoint-parity fire drill at production (bert-base) shape.

VERDICT r2 item 7: before real reference checkpoints arrive, prove the
conversion path at the real scale — a full bert-base reference-layout
Lightning ``state_dict`` (both ``shared_model`` layouts,
reference dpr_scale/task/dpr_task.py:55-81), token-level fp32
equivalence vs torch, the converted model driven through encode ->
retrieve, and a SPAR two-checkpoint composition
(spar_task.py:25-33: dense + lexical models loaded from separate
.ckpt files and combined at query/context encode time).

bert-base on a 1-core host is slow — this module is marked
``pytest.mark.slow`` (run with ``-m slow`` or no marker filter; the
default suite includes it).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _bert_base_torch(seed=0):
    import torch
    from transformers import BertConfig, BertModel

    torch.manual_seed(seed)
    cfg = BertConfig(
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0
    )  # defaults == bert-base-uncased
    return BertModel(cfg).eval()


def _flax_cfg():
    from dpr_scale_tpu.models import TransformerConfig

    return dataclasses.replace(
        TransformerConfig.bert_base(),
        hidden_dropout=0.0,
        attention_dropout=0.0,
        dtype=jnp.float32,
    )


def _lightning_sd(q_bert, c_bert):
    sd = {}
    for name, module in (("query_encoder", q_bert), ("context_encoder", c_bert)):
        for k, v in module.state_dict().items():
            sd[f"{name}.transformer.{k}"] = v
    return sd


def _convert(tmp_path, sd, tag, shared):
    import torch

    from dpr_scale_tpu.cli.convert_checkpoint import main
    from dpr_scale_tpu.train.checkpoint import load_params

    ckpt = tmp_path / f"{tag}.ckpt"
    torch.save({"state_dict": sd, "epoch": 1}, ckpt)
    out = tmp_path / f"{tag}_converted"
    argv = [
        "--input", str(ckpt), "--output", str(out), "--arch", "bert_base"
    ]
    if not shared:
        argv.append("--separate-encoders")
    main(argv)
    return load_params(str(out))


@pytest.mark.parametrize("shared", [True, False])
def test_bert_base_lightning_roundtrip(tmp_path, shared):
    import torch

    from dpr_scale_tpu.models import BiEncoder

    q_bert = _bert_base_torch(seed=0)
    c_bert = q_bert if shared else _bert_base_torch(seed=1)
    params = _convert(
        tmp_path, _lightning_sd(q_bert, c_bert), f"shared_{shared}", shared
    )

    cfg = _flax_cfg()
    model = BiEncoder(cfg, shared=shared)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 30000, size=(2, 16)).astype(np.int32)
    ids[:, 0] = 101  # [CLS]
    mask = np.ones_like(ids)

    for method, ref_bert in (
        (model.encode_query, q_bert),
        (model.encode_context, c_bert),
    ):
        ours = np.asarray(
            model.apply(
                {"params": params}, jnp.asarray(ids), jnp.asarray(mask),
                method=method,
            )
        )
        with torch.no_grad():
            ref = ref_bert(
                torch.tensor(ids, dtype=torch.long),
                torch.tensor(mask, dtype=torch.long),
            ).last_hidden_state[:, 0].numpy()
        # token-level fp32 equivalence at production shape: 12 layers of
        # accumulation -> allow 1e-3 absolute on O(1) activations
        np.testing.assert_allclose(ours, ref, atol=1e-3)

    if shared:
        # drive the converted model through encode -> retrieve (CPU mesh)
        from dpr_scale_tpu.index import MipsIndex
        from dpr_scale_tpu.parallel import get_mesh

        corpus_ids = rng.integers(1, 30000, size=(8, 16)).astype(np.int32)
        corpus_ids[:, 0] = 101
        embs = np.asarray(
            model.apply(
                {"params": params},
                jnp.asarray(corpus_ids),
                jnp.asarray(np.ones_like(corpus_ids)),
                method=model.encode_context,
            )
        )
        index = MipsIndex(get_mesh(8), dtype=jnp.float32, method="exact_sort")
        index.add(embs)
        q = np.asarray(
            model.apply(
                {"params": params}, jnp.asarray(corpus_ids[:2]),
                jnp.asarray(np.ones((2, 16), np.int32)),
                method=model.encode_query,
            )
        )
        _s, i = index.search(q, k=3)
        # a corpus row must retrieve itself top-1 under the shared encoder
        assert i[0, 0] == 0 and i[1, 0] == 1


def test_bert_base_spar_composition(tmp_path):
    """SPAR: two independently-converted checkpoints composed at encode
    time (dense + lexical), vs the same composition done in torch."""
    import torch

    from dpr_scale_tpu.models import BiEncoder
    from dpr_scale_tpu.models.ensemble import ConcatEncoders

    dense_bert = _bert_base_torch(seed=2)
    lex_bert = _bert_base_torch(seed=3)
    p_dense = _convert(tmp_path, _lightning_sd(dense_bert, dense_bert), "dense", True)
    p_lex = _convert(tmp_path, _lightning_sd(lex_bert, lex_bert), "lex", True)

    cfg = _flax_cfg()
    m_dense = BiEncoder(cfg, shared=True)
    m_lex = BiEncoder(cfg, shared=True)
    lexical_weight = 0.7
    spar = ConcatEncoders(
        [(m_dense, p_dense), (m_lex, p_lex)],
        query_weights=[1.0, lexical_weight],
    )

    rng = np.random.default_rng(4)
    ids = rng.integers(1, 30000, size=(2, 12)).astype(np.int32)
    ids[:, 0] = 101
    mask = np.ones_like(ids)
    q = np.asarray(spar.encode_queries(jnp.asarray(ids), jnp.asarray(mask)))
    c = np.asarray(spar.encode_contexts(jnp.asarray(ids), jnp.asarray(mask)))

    with torch.no_grad():
        tq = torch.cat(
            [
                dense_bert(
                    torch.tensor(ids, dtype=torch.long),
                    torch.tensor(mask, dtype=torch.long),
                ).last_hidden_state[:, 0],
                lexical_weight
                * lex_bert(
                    torch.tensor(ids, dtype=torch.long),
                    torch.tensor(mask, dtype=torch.long),
                ).last_hidden_state[:, 0],
            ],
            dim=-1,
        ).numpy()
        tc = torch.cat(
            [
                dense_bert(
                    torch.tensor(ids, dtype=torch.long),
                    torch.tensor(mask, dtype=torch.long),
                ).last_hidden_state[:, 0],
                lex_bert(
                    torch.tensor(ids, dtype=torch.long),
                    torch.tensor(mask, dtype=torch.long),
                ).last_hidden_state[:, 0],
            ],
            dim=-1,
        ).numpy()
    np.testing.assert_allclose(q, tq, atol=1e-3)
    np.testing.assert_allclose(c, tc, atol=1e-3)
