"""Dense retrieval encoders: CLS pooling + optional projection head.

Parity target: reference ``HFEncoder`` (dpr_scale/models/hf_model.py:12-41) —
AutoModel encoder, [CLS] (position 0) pooling, optional
``Linear(hidden, projection_dim) + LayerNorm`` head with init std 0.02;
``projection_dim == -1`` means "project to hidden_size".
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from dpr_scale_tpu.models.transformer import TransformerConfig, TransformerEncoder


class DenseEncoder(nn.Module):
    """Token ids -> one embedding per sequence (B, D)."""

    cfg: TransformerConfig
    projection_dim: int = 0  # 0: no projection; -1: project to hidden; >0: dim

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        hidden = TransformerEncoder(self.cfg, name="transformer")(
            input_ids, attention_mask, deterministic
        )
        pooled = hidden[:, 0]  # [CLS]
        if self.projection_dim:
            dim = (
                self.cfg.hidden_size if self.projection_dim == -1 else self.projection_dim
            )
            pooled = nn.Dense(
                dim,
                dtype=self.cfg.dtype,
                kernel_init=nn.initializers.normal(0.02),
                name="project",
            )(pooled)
            pooled = nn.LayerNorm(
                epsilon=self.cfg.layer_norm_eps, dtype=self.cfg.dtype, name="project_ln"
            )(pooled)
        # embeddings leave the encoder in fp32: the similarity matmul and
        # the MIPS index accumulate in fp32 regardless of activation dtype
        return pooled.astype(jnp.float32)


class SpladeBiEncoder(nn.Module):
    """SPLADE as a single-vector bi-encoder: the ``max log(1+relu(MLM))``
    vocab vector (reference SPLADEEncoder, splade_model.py:26-32) exposed
    through the same encode_query/encode_context API as BiEncoder, so the
    dense contrastive task, corpus encoder, and MIPS engine work unchanged
    (the "sparse" vector is a dense (B, V) tensor on TPU)."""

    cfg: TransformerConfig
    shared: bool = True

    def setup(self):
        from dpr_scale_tpu.models.multivec import MultiVecEncoder

        self.context_encoder = MultiVecEncoder(
            self.cfg, variant="splade", name="context_encoder"
        )
        if self.shared:
            self.query_encoder = self.context_encoder
        else:
            self.query_encoder = MultiVecEncoder(
                self.cfg, variant="splade", name="query_encoder"
            )

    def encode_query(self, input_ids, attention_mask=None, deterministic=True):
        out = self.query_encoder(
            input_ids, attention_mask, deterministic=deterministic
        )
        return out["splade_repr"]

    def encode_context(self, input_ids, attention_mask=None, deterministic=True):
        out = self.context_encoder(
            input_ids, attention_mask, deterministic=deterministic
        )
        return out["splade_repr"]

    def __call__(
        self, query_ids, query_mask, contexts_ids, contexts_mask, deterministic=True
    ):
        q = self.encode_query(query_ids, query_mask, deterministic)
        c = self.encode_context(contexts_ids, contexts_mask, deterministic)
        return q, c


class BiEncoder(nn.Module):
    """Query + context towers, optionally weight-shared.

    Parity: ``shared_model`` flag in the reference task setup
    (dpr_scale/task/dpr_task.py:55-81).
    """

    cfg: TransformerConfig
    projection_dim: int = 0
    shared: bool = True
    query_cfg: Optional[TransformerConfig] = None  # only when not shared

    def setup(self):
        self.context_encoder = DenseEncoder(
            self.cfg, self.projection_dim, name="context_encoder"
        )
        if self.shared:
            self.query_encoder = self.context_encoder
        else:
            qcfg = self.query_cfg or self.cfg
            self.query_encoder = DenseEncoder(
                qcfg, self.projection_dim, name="query_encoder"
            )

    def encode_query(self, input_ids, attention_mask=None, deterministic=True):
        return self.query_encoder(input_ids, attention_mask, deterministic)

    def encode_context(self, input_ids, attention_mask=None, deterministic=True):
        return self.context_encoder(input_ids, attention_mask, deterministic)

    def __call__(
        self,
        query_ids,
        query_mask,
        contexts_ids,
        contexts_mask,
        deterministic: bool = True,
    ):
        q = self.encode_query(query_ids, query_mask, deterministic)
        c = self.encode_context(contexts_ids, contexts_mask, deterministic)
        return q, c
