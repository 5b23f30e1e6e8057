"""Encoder tests: shapes (parity model: reference models/tests/test_models.py)
plus numerical equivalence against the HF torch implementation — a stronger
check the reference never had.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpr_scale_tpu.models import (
    BiEncoder,
    DenseEncoder,
    TransformerConfig,
    TransformerEncoder,
)
from dpr_scale_tpu.models.hf_import import (
    convert_dense_encoder,
    convert_encoder,
    torch_state_dict_to_numpy,
)


def fp32(cfg: TransformerConfig) -> TransformerConfig:
    return dataclasses.replace(cfg, dtype=jnp.float32)


@pytest.mark.parametrize("batch_size", [1, 2])
def test_dense_encoder_shapes(batch_size):
    cfg = fp32(TransformerConfig.tiny())
    model = DenseEncoder(cfg)
    ids = jnp.ones((batch_size, 8), dtype=jnp.int32)
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    out = model.apply(params, ids, mask)
    assert out.shape == (batch_size, 16)
    assert out.dtype == jnp.float32


def test_dense_encoder_projection():
    cfg = fp32(TransformerConfig.tiny())
    ids = jnp.ones((2, 8), dtype=jnp.int32)
    for proj, expected in [(8, 8), (-1, 16)]:
        model = DenseEncoder(cfg, projection_dim=proj)
        params = model.init(jax.random.PRNGKey(0), ids)
        assert model.apply(params, ids).shape == (2, expected)


def test_biencoder_shared_vs_separate():
    cfg = fp32(TransformerConfig.tiny())
    ids = jnp.ones((2, 8), dtype=jnp.int32)
    mask = jnp.ones_like(ids)

    shared = BiEncoder(cfg, shared=True)
    p = shared.init(jax.random.PRNGKey(0), ids, mask, ids, mask)
    assert "query_encoder" not in p["params"]
    q, c = shared.apply(p, ids, mask, ids, mask)
    np.testing.assert_allclose(q, c, rtol=1e-5)  # same tower, same input

    sep = BiEncoder(cfg, shared=False)
    p2 = sep.init(jax.random.PRNGKey(0), ids, mask, ids, mask)
    assert "query_encoder" in p2["params"]
    q2, c2 = sep.apply(p2, ids, mask, ids, mask)
    assert not np.allclose(q2, c2)


def test_padding_invariance():
    """Extending a sequence with masked pad tokens must not change the CLS."""
    cfg = fp32(TransformerConfig.tiny())
    model = DenseEncoder(cfg)
    rng = np.random.default_rng(0)
    ids_short = np.concatenate([rng.integers(5, 30, size=(1, 6)), np.zeros((1, 2))], 1)
    mask_short = np.asarray([[1] * 6 + [0] * 2])
    ids_long = np.concatenate([ids_short[:, :6], np.zeros((1, 6))], 1)
    mask_long = np.asarray([[1] * 6 + [0] * 6])
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids_short, jnp.int32))
    out_s = model.apply(params, jnp.asarray(ids_short, jnp.int32), jnp.asarray(mask_short))
    out_l = model.apply(params, jnp.asarray(ids_long, jnp.int32), jnp.asarray(mask_long))
    np.testing.assert_allclose(out_s, out_l, atol=1e-5)


def _random_hf_bert(seed=0):
    import torch
    from transformers import BertConfig, BertModel

    torch.manual_seed(seed)
    hf_cfg = BertConfig(
        vocab_size=64,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=32,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    return BertModel(hf_cfg).eval(), hf_cfg


def test_matches_hf_torch_bert():
    """Imported HF weights reproduce torch BertModel hidden states."""
    import torch

    hf_model, hf_cfg = _random_hf_bert()
    cfg = TransformerConfig(
        vocab_size=64,
        hidden_size=32,
        num_layers=2,
        num_heads=2,
        intermediate_size=64,
        max_position_embeddings=32,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        dtype=jnp.float32,
    )
    sd = torch_state_dict_to_numpy(hf_model.state_dict())
    params = convert_encoder(sd, cfg)

    rng = np.random.default_rng(1)
    ids = rng.integers(1, 64, size=(3, 10)).astype(np.int32)
    mask = np.ones_like(ids)
    mask[1, 7:] = 0
    ids[1, 7:] = 0

    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state.numpy()

    model = TransformerEncoder(cfg)
    ours = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    # only compare unmasked positions (masked positions are junk in both)
    np.testing.assert_allclose(
        np.asarray(ours)[mask.astype(bool)], ref[mask.astype(bool)], atol=5e-4
    )


def test_dense_encoder_import_with_projection():
    """DenseEncoder-level import incl. the reference's Sequential projection
    naming (`project.0` Linear / `project.1` LayerNorm; hf_model.py:24-31)."""
    import torch

    hf_model, _ = _random_hf_bert(seed=3)
    sd = torch_state_dict_to_numpy(hf_model.state_dict())
    # fabricate a reference-style projection head
    torch.manual_seed(7)
    lin = torch.nn.Linear(32, 16)
    ln = torch.nn.LayerNorm(16)
    sd["project.0.weight"] = lin.weight.detach().numpy()
    sd["project.0.bias"] = lin.bias.detach().numpy()
    sd["project.1.weight"] = ln.weight.detach().numpy()
    sd["project.1.bias"] = ln.bias.detach().numpy()

    cfg = TransformerConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, max_position_embeddings=32,
        hidden_dropout=0.0, attention_dropout=0.0, dtype=jnp.float32,
    )
    params = convert_dense_encoder(sd, cfg)
    model = DenseEncoder(cfg, projection_dim=16)
    ids = jnp.asarray(np.arange(1, 9)[None].astype(np.int32))
    ours = model.apply({"params": params}, ids)

    with torch.no_grad():
        hidden = hf_model(torch.tensor(np.asarray(ids), dtype=torch.long)).last_hidden_state
        ref = ln(lin(hidden[:, 0])).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4)


def test_matches_hf_torch_roberta():
    """Imported HF weights reproduce torch RobertaModel hidden states —
    incl. RoBERTa's pad-aware position ids (positions start at
    padding_idx+1; pad positions pinned to padding_idx). DRAGON-RoBERTa
    (reference dragon/README.md:25) ships in this layout."""
    import torch
    from transformers import RobertaConfig, RobertaModel

    torch.manual_seed(3)
    hf_cfg = RobertaConfig(
        vocab_size=64,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=34,  # 32 + pad offset 2
        type_vocab_size=1,
        layer_norm_eps=1e-5,
        pad_token_id=1,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    hf_model = RobertaModel(hf_cfg).eval()
    cfg = TransformerConfig(
        vocab_size=64,
        hidden_size=32,
        num_layers=2,
        num_heads=2,
        intermediate_size=64,
        max_position_embeddings=34,
        type_vocab_size=1,
        layer_norm_eps=1e-5,
        pad_token_id=1,
        position_offset=2,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        dtype=jnp.float32,
    )
    sd = torch_state_dict_to_numpy(hf_model.state_dict())
    params = convert_encoder(sd, cfg)

    rng = np.random.default_rng(4)
    ids = rng.integers(2, 64, size=(3, 10)).astype(np.int32)
    mask = np.ones_like(ids)
    mask[1, 6:] = 0
    ids[1, 6:] = 1  # RoBERTa pad id
    mask[2, 9:] = 0
    ids[2, 9:] = 1

    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state.numpy()

    model = TransformerEncoder(cfg)
    ours = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(ours)[mask.astype(bool)], ref[mask.astype(bool)], atol=5e-4
    )
