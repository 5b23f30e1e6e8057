"""Reference Lightning-checkpoint conversion end-to-end: fabricate a
reference-format .ckpt from a tiny torch BERT, convert via the CLI, and
check numerical equivalence of the encoder towers."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _tiny_torch_biencoder(shared: bool, seed=0):
    """Mimic the reference DenseRetrieverTask state_dict layout:
    {query,context}_encoder.transformer.<hf bert> + project Sequential
    (dpr_task.py:55-81, hf_model.py:24-35)."""
    import torch
    from transformers import BertConfig, BertModel

    torch.manual_seed(seed)
    cfg = BertConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=32, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    q_bert = BertModel(cfg).eval()
    c_bert = q_bert if shared else BertModel(cfg).eval()
    sd = {}
    for name, module in (("query_encoder", q_bert), ("context_encoder", c_bert)):
        for k, v in module.state_dict().items():
            sd[f"{name}.transformer.{k}"] = v
    return sd, q_bert, c_bert


def test_convert_reference_ckpt_with_projection_head():
    """Regression: the converter pre-stripped 'transformer.' from the
    encoder dicts, silently DROPPING the trained projection head that the
    reference stores alongside it (project.0 Linear / project.1 LayerNorm,
    hf_model.py:24-34) — e.g. every DrBoost dim-32 weak learner."""
    import torch

    from dpr_scale_tpu.models import BiEncoder, TransformerConfig
    from dpr_scale_tpu.models.hf_import import convert_reference_biencoder_ckpt

    sd, q_bert, _ = _tiny_torch_biencoder(shared=True)
    torch.manual_seed(7)
    linear = torch.nn.Linear(32, 8)
    linear.weight.data.normal_(mean=0.0, std=0.02)
    project = torch.nn.Sequential(linear, torch.nn.LayerNorm(8)).eval()
    for k, v in project.state_dict().items():
        sd[f"query_encoder.project.{k}"] = v
        sd[f"context_encoder.project.{k}"] = v

    cfg = TransformerConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, max_position_embeddings=32,
        hidden_dropout=0.0, attention_dropout=0.0, dtype=jnp.float32,
    )
    sd_np = {k: v.numpy() for k, v in sd.items()}
    params = convert_reference_biencoder_ckpt(sd_np, cfg, shared=True)
    assert "project" in params["context_encoder"], sorted(
        params["context_encoder"]
    )
    assert "project_ln" in params["context_encoder"]

    model = BiEncoder(cfg, projection_dim=8, shared=True)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 64, size=(3, 10)).astype(np.int32)
    mask = np.ones_like(ids)
    out = model.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask),
        method=model.encode_context,
    )
    with torch.no_grad():
        cls = q_bert(
            torch.tensor(ids, dtype=torch.long),
            torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state[:, 0]
        ref = project(cls).numpy()
    assert out.shape == (3, 8)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4)


@pytest.mark.parametrize("shared", [True, False])
def test_convert_reference_ckpt(tmp_path, shared):
    import torch

    from dpr_scale_tpu.cli.convert_checkpoint import main
    from dpr_scale_tpu.models import BiEncoder, TransformerConfig
    from dpr_scale_tpu.train.checkpoint import load_params

    sd, q_bert, c_bert = _tiny_torch_biencoder(shared)
    ckpt_path = tmp_path / "checkpoint_best.ckpt"
    torch.save({"state_dict": sd, "epoch": 3}, ckpt_path)

    out = tmp_path / "converted"
    argv = ["--input", str(ckpt_path), "--output", str(out), "--arch", "tiny"]
    if not shared:
        argv.append("--separate-encoders")
    # tiny arch preset has different dims; build a matching config instead
    import dpr_scale_tpu.cli.convert_checkpoint as cc

    cfg = TransformerConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, max_position_embeddings=32,
        hidden_dropout=0.0, attention_dropout=0.0, dtype=jnp.float32,
    )
    cc_arches = dict(cc.ARCHES)
    cc.ARCHES["tiny"] = lambda: cfg
    try:
        main(argv)
    finally:
        cc.ARCHES.update(cc_arches)

    params = load_params(str(out))
    model = BiEncoder(cfg, shared=shared)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 64, size=(3, 10)).astype(np.int32)
    mask = np.ones_like(ids)

    flax_params = {"params": params}
    c_out = model.apply(
        flax_params, jnp.asarray(ids), jnp.asarray(mask), method=model.encode_context
    )
    with torch.no_grad():
        ref_c = c_bert(
            torch.tensor(ids, dtype=torch.long), torch.tensor(mask, dtype=torch.long)
        ).last_hidden_state[:, 0].numpy()
    np.testing.assert_allclose(np.asarray(c_out), ref_c, atol=5e-4)

    q_out = model.apply(
        flax_params, jnp.asarray(ids), jnp.asarray(mask), method=model.encode_query
    )
    with torch.no_grad():
        ref_q = q_bert(
            torch.tensor(ids, dtype=torch.long), torch.tensor(mask, dtype=torch.long)
        ).last_hidden_state[:, 0].numpy()
    np.testing.assert_allclose(np.asarray(q_out), ref_q, atol=5e-4)
