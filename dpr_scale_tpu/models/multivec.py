"""Multi-vector / late-interaction encoder family: CITADEL, COIL, ColBERT,
SPLADE, plus the cross-encoder scorer.

Behavior parity (reference dpr_scale/models/citadel_models/*):

  * ``CITADELEncoder`` (citadel_model.py:46-82): MLM logits ->
    ``log(1+relu)`` router; top-k expert routing per token; projected token
    vectors; load-balancing statistics; optional CLS head.
  * ``COILEncoder`` (coil_model.py:45-61): projected token vectors gated by
    *lexical* exact match — expert id IS the input token id.
  * ``ColBERTEncoder`` (colbert_model.py:37-43): projected token vectors,
    plain MaxSim.
  * ``SPLADEEncoder`` (splade_model.py:26-32): ``max_t log(1+relu(logits))``
    sparse vocab vector — a single-vector model that plugs into the dense
    bi-encoder machinery.
  * ``CrossEncoder`` (cross_encoder.py:11-26): sequence-classification
    scorer for reranking.

All outputs are fixed-shape dicts (position 0 = [CLS] removed, sequence
padded to max_seq_len), so the SPMD train step needs none of the
reference's dynamic-shape gather machinery (citadel_task.py:68-95).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dpr_scale_tpu.models.transformer import TransformerConfig, TransformerEncoder


class MLMHead(nn.Module):
    """BERT MLM head: Dense -> gelu -> LayerNorm -> vocab decoder.

    The decoder is untied (its kernel is imported from the HF checkpoint,
    where it is numerically identical to the tied word embeddings).
    """

    cfg: TransformerConfig

    @nn.compact
    def __call__(self, hidden: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = nn.Dense(
            cfg.hidden_size, dtype=cfg.dtype, name="transform",
            kernel_init=nn.initializers.normal(0.02),
        )(hidden)
        x = nn.gelu(x, approximate=False)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="transform_ln"
        )(x)
        logits = nn.Dense(
            cfg.vocab_size, dtype=cfg.dtype, name="decoder",
            kernel_init=nn.initializers.normal(0.02),
        )(x)
        return logits


class MultiVecEncoder(nn.Module):
    """Shared trunk for the multi-vector family.

    variant: "citadel" | "coil" | "colbert" | "splade"
    """

    cfg: TransformerConfig
    variant: str = "citadel"
    tok_projection_dim: Optional[int] = None
    cls_projection_dim: Optional[int] = None

    def setup(self):
        self.transformer = TransformerEncoder(self.cfg, name="transformer")
        if self.variant in ("citadel", "splade"):
            self.mlm_head = MLMHead(self.cfg, name="mlm_head")
        if self.tok_projection_dim and self.variant in ("citadel", "coil", "colbert"):
            self.tok_project = nn.Dense(
                self.tok_projection_dim,
                dtype=self.cfg.dtype,
                kernel_init=nn.initializers.normal(0.02),
                name="tok_project",
            )
        if self.cls_projection_dim:
            self.cls_project = nn.Dense(
                self.cls_projection_dim,
                dtype=self.cfg.dtype,
                kernel_init=nn.initializers.normal(0.02),
                name="cls_project",
            )

    def __call__(
        self,
        input_ids: jnp.ndarray,  # (B, L)
        attention_mask: Optional[jnp.ndarray] = None,
        topk: int = 1,
        add_cls: bool = False,
        deterministic: bool = True,
        routing_stats: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """``routing_stats=False`` (inference) skips the training-only
        CITADEL outputs — router_repr / router_mask / router_softmax_repr
        are each (B, vocab) fp32 (~3.9 MB per 32 queries), which CLI
        callers would otherwise fetch over the ~0.1 MB/s tunnel for
        losses that never run at inference."""
        if attention_mask is None:
            attention_mask = (input_ids != self.cfg.pad_token_id).astype(jnp.int32)
        hidden = self.transformer(input_ids, attention_mask, deterministic)
        # position 0 is [CLS]; token-level machinery works on positions 1:
        toks = hidden[:, 1:, :].astype(jnp.float32)
        tok_mask = attention_mask[:, 1:].astype(jnp.float32)  # (B, T)
        ret: Dict[str, jnp.ndarray] = {"attention_mask": tok_mask}

        if add_cls:
            cls = hidden[:, 0, :].astype(jnp.float32)
            if self.cls_projection_dim:
                cls = self.cls_project(cls).astype(jnp.float32)
            ret["cls_repr"] = cls

        if self.variant == "splade":
            logits = self.mlm_head(hidden[:, 1:, :]).astype(jnp.float32)
            sat = jnp.log1p(jax.nn.relu(logits)) * tok_mask[..., None]
            ret["splade_repr"] = jnp.max(sat, axis=1)  # (B, V)
            return ret

        if self.variant == "colbert":
            expert = toks
            if self.tok_projection_dim:
                expert = self.tok_project(toks).astype(jnp.float32)
            ret["expert_repr"] = expert * tok_mask[..., None]
            return ret

        if self.variant == "coil":
            expert = toks
            if self.tok_projection_dim:
                expert = self.tok_project(toks).astype(jnp.float32)
            ret["expert_repr"] = expert * tok_mask[..., None]
            # lexical routing: the expert id IS the token id; pad positions
            # get id -1 so they never exact-match
            ids = input_ids[:, 1:]
            ret["expert_ids"] = jnp.where(tok_mask > 0, ids, -1)
            return ret

        # citadel
        logits = self.mlm_head(hidden[:, 1:, :]).astype(jnp.float32)  # (B, T, V)
        full_router = jnp.log1p(jax.nn.relu(logits)) * tok_mask[..., None]
        if routing_stats:
            ret["router_repr"] = jnp.max(full_router, axis=1)  # (B, V)
        expert_weights, expert_ids = jax.lax.top_k(full_router, topk)  # (B, T, K)
        # pad positions: weights are already 0 there; give ids -1 so they
        # never match real experts
        expert_ids = jnp.where(tok_mask[..., None] > 0, expert_ids, -1)
        ret["expert_weights"] = expert_weights
        ret["expert_ids"] = expert_ids
        expert = toks
        if self.tok_projection_dim:
            expert = self.tok_project(toks).astype(jnp.float32)
        ret["expert_repr"] = expert * tok_mask[..., None]

        if not routing_stats:
            return ret
        # routing statistics (citadel_model.py:62-73); scatter-add instead
        # of a (B, T, K, V) one-hot to keep HBM use at (B, V)
        active = (expert_weights > 0.0).astype(jnp.float32)  # (B, T, K)
        safe_ids = jnp.where(expert_ids < 0, 0, expert_ids)

        def scatter_row(ids_tk, act_tk):
            return jnp.zeros((self.cfg.vocab_size,), jnp.float32).at[
                ids_tk.reshape(-1)
            ].add(act_tk.reshape(-1))

        router_mask = jax.vmap(scatter_row)(safe_ids, active)  # (B, V)
        ret["router_mask"] = router_mask
        ret["avg_cond_num_experts"] = jnp.mean(jnp.sum(router_mask, axis=1))
        ret["avg_marg_num_experts"] = jnp.sum(jnp.max(router_mask, axis=0))
        ret["router_softmax_repr"] = jnp.sum(
            jax.nn.softmax(logits, axis=-1), axis=1
        )  # (B, V)
        return ret


class CrossEncoder(nn.Module):
    """Question+passage concatenated scoring (cross_encoder.py:11-26):
    transformer CLS -> pooler tanh -> classifier logits."""

    cfg: TransformerConfig
    num_labels: int = 2

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, deterministic: bool = True):
        hidden = TransformerEncoder(self.cfg, name="transformer")(
            input_ids, attention_mask, deterministic
        )
        pooled = nn.tanh(
            nn.Dense(
                self.cfg.hidden_size, dtype=self.cfg.dtype, name="pooler",
                kernel_init=nn.initializers.normal(0.02),
            )(hidden[:, 0])
        )
        pooled = nn.Dropout(self.cfg.hidden_dropout)(pooled, deterministic=deterministic)
        logits = nn.Dense(
            self.num_labels, dtype=self.cfg.dtype, name="classifier",
            kernel_init=nn.initializers.normal(0.02),
        )(pooled)
        # reference scores with max over logits (cross_encoder_eval_task.py:21-26)
        return logits.astype(jnp.float32)
