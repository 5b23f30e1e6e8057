"""BERT-family transformer encoder in Flax linen, TPU-first.

Replaces the reference's dependence on ``transformers.AutoModel``
(dpr_scale/models/hf_model.py:12-41, hf_bert.py:11-28) with a first-party
encoder so the whole forward is one fused XLA program:

  * bf16 activations / fp32 params by default (MXU-native);
  * attention as a single ``einsum`` chain — XLA tiles it onto the MXU;
  * static shapes end to end (padding handled by additive mask);
  * optional ``jax.checkpoint`` rematerialization per layer for large
    global batches (contrastive training wants huge batch, not params);
  * post-layer-norm (original BERT) so HF checkpoints import exactly.

Weights use HF-compatible logical names via :mod:`dpr_scale_tpu.models.hf_import`.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    pad_token_id: int = 0
    position_offset: int = 0  # RoBERTa uses 2 (positions start at pad+1)
    dtype: jnp.dtype = jnp.bfloat16  # activation dtype
    remat: bool = False
    # fused Pallas attention (softmax + dropout in VMEM, dropout bits
    # drawn in-kernel — see dpr_scale_tpu.ops.attention). On CPU the
    # kernel runs interpreted, so dropout>0 there falls back to einsum.
    fused_attention: bool = False
    # fused Pallas FFN (matmul + GELU + matmul + dropout, bwd split into
    # dgrad/wgrad kernels — see dpr_scale_tpu.ops.ffn). Same CPU fallback
    # rule as fused_attention.
    fused_ffn: bool = False

    @staticmethod
    def tiny(vocab_size: int = 32) -> "TransformerConfig":
        """Test-scale config mirroring the reference's ``create_bert_tiny``
        fixture (BertConfig(vocab=32, hidden=16, layers=2, heads=1, ffn=4);
        reference datamodule/tests/test_datamodule.py:13-18)."""
        return TransformerConfig(
            vocab_size=vocab_size,
            hidden_size=16,
            num_layers=2,
            num_heads=1,
            intermediate_size=4,
            max_position_embeddings=64,
            hidden_dropout=0.0,
            attention_dropout=0.0,
        )

    @staticmethod
    def bert_base() -> "TransformerConfig":
        return TransformerConfig()

    @staticmethod
    def bert_large() -> "TransformerConfig":
        return TransformerConfig(
            hidden_size=1024, num_layers=24, num_heads=16, intermediate_size=4096
        )

    @staticmethod
    def roberta_base() -> "TransformerConfig":
        return TransformerConfig(
            vocab_size=50265,
            max_position_embeddings=514,
            type_vocab_size=1,
            layer_norm_eps=1e-5,
            pad_token_id=1,
            position_offset=2,
        )


class SelfAttention(nn.Module):
    cfg: TransformerConfig

    @nn.compact
    def __call__(self, x, attn_bias, deterministic: bool):
        cfg = self.cfg
        h, nh = cfg.hidden_size, cfg.num_heads
        hd = h // nh
        # q/k/v as ONE (H, 3H) matmul: identical math per output column
        # (so bit-identical results and gradients vs three DenseGenerals)
        # but 1 MXU dispatch instead of 3 and one read of x instead of
        # three. Params keep the DenseGeneral layout (query/key/value
        # {kernel (H, nh, hd), bias (nh, hd)}) for checkpoint interop.
        wq, bq = _DenseParams((h, nh, hd), name="query")()
        wk, bk = _DenseParams((h, nh, hd), name="key")()
        wv, bv = _DenseParams((h, nh, hd), name="value")()
        w_qkv = jnp.concatenate(
            [w.reshape(h, h) for w in (wq, wk, wv)], axis=1
        ).astype(cfg.dtype)
        b_qkv = jnp.concatenate(
            [b.reshape(h) for b in (bq, bk, bv)]
        ).astype(cfg.dtype)
        B, L, _ = x.shape
        qkv = jnp.dot(x.astype(cfg.dtype), w_qkv) + b_qkv
        q, k, v = (
            t.reshape(B, L, nh, hd) for t in jnp.split(qkv, 3, axis=-1)
        )
        rate = 0.0 if deterministic else cfg.attention_dropout
        on_cpu = jax.default_backend() == "cpu"
        if cfg.fused_attention and not (rate > 0.0 and on_cpu):
            from dpr_scale_tpu.ops.attention import fused_attention

            if rate > 0.0:
                bits = jax.random.bits(self.make_rng("dropout"), (), "uint32")
                seed = jax.lax.bitcast_convert_type(bits, jnp.int32)[None]
            else:
                seed = jnp.zeros((1,), jnp.int32)
            ctx = fused_attention(
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                # the kernel's VJP has no bias cotangent — only a
                # mask-derived (non-trainable) bias may flow through it
                jax.lax.stop_gradient(attn_bias[:, 0]),  # (B, 1, L) additive
                seed,
                rate,
                on_cpu,  # interpret mode for simulated-mesh CPU tests
            ).transpose(0, 2, 1, 3)
        else:
            # (B, nh, L, L) logits in fp32 for stable softmax
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
            logits = logits / jnp.sqrt(hd).astype(jnp.float32)
            logits = logits + attn_bias  # additive -inf mask, (B,1,1,L)
            probs = jax.nn.softmax(logits, axis=-1).astype(cfg.dtype)
            probs = nn.Dropout(cfg.attention_dropout)(
                probs, deterministic=deterministic
            )
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = nn.DenseGeneral(
            h, axis=(-2, -1), dtype=cfg.dtype, name="output",
            kernel_init=nn.initializers.normal(0.02),
        )(ctx)
        return out


class _DenseParams(nn.Module):
    """Owns an nn.Dense/DenseGeneral-layout (kernel, bias) param pair
    without the matmul — lets fused paths (fused_ffn, merged q/k/v)
    share checkpoints with the module-per-matmul layout. kernel shape is
    ``shape``; bias shape is ``shape[1:]`` (Dense: (out,); DenseGeneral
    with features (nh, hd): (nh, hd))."""

    shape: tuple

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.normal(0.02), self.shape, jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, self.shape[1:], jnp.float32)
        return kernel, bias


class _LNParams(nn.Module):
    """nn.LayerNorm-layout (scale, bias) params without the normalize —
    the LN-fused FFN path's checkpoint-interop analog of _DenseParams."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return scale, bias


class TransformerLayer(nn.Module):
    cfg: TransformerConfig

    @nn.compact
    def __call__(self, x, attn_bias, deterministic: bool):
        cfg = self.cfg
        attn = SelfAttention(cfg, name="attention")(x, attn_bias, deterministic)
        attn = nn.Dropout(cfg.hidden_dropout)(attn, deterministic=deterministic)
        rate = 0.0 if deterministic else cfg.hidden_dropout
        on_cpu = jax.default_backend() == "cpu"
        if cfg.fused_ffn and deterministic:
            from dpr_scale_tpu.ops.ffn import fused_ffn_ln

            # INFERENCE forward only: the LN-fused kernel wins ~2% on the
            # forward (61.10 vs 62.47 ms per 12-layer stack at B=256
            # L=128) but its XLA backward re-derives the LN chain and
            # loses ~2% fwd+bwd (169.44 vs 166.15 ms) — measured r04,
            # tools/bench_step_parts.py full_layer vs full_layer_lnfused.
            # Training takes the fused_ffn + XLA-glue branch below.
            # Param tree identical to the einsum path's modules
            # (attention_ln/output_ln {scale,bias}, intermediate/
            # ffn_output {kernel,bias}) so checkpoints interop
            # regardless of the fused_ffn flag
            g1, be1 = _LNParams(cfg.hidden_size, name="attention_ln")()
            g2, be2 = _LNParams(cfg.hidden_size, name="output_ln")()
            w1, b1 = _DenseParams(
                (cfg.hidden_size, cfg.intermediate_size), name="intermediate"
            )()
            w2, b2 = _DenseParams(
                (cfg.intermediate_size, cfg.hidden_size), name="ffn_output"
            )()
            seed = jnp.zeros((1,), jnp.int32)  # deterministic: rate == 0
            B, L, H = x.shape
            return fused_ffn_ln(
                (x + attn).reshape(B * L, H).astype(cfg.dtype),
                w1, b1, w2, b2, g1, be1, g2, be2, seed, rate,
                cfg.layer_norm_eps,
                on_cpu,  # interpret mode for simulated-mesh CPU tests
            ).reshape(B, L, H)
        if cfg.fused_ffn and not (rate > 0.0 and on_cpu):
            # TRAINING (or dropout-free non-deterministic) composition:
            # Pallas fused_ffn (custom split backward, 187.9 TF/s fwd+bwd
            # vs einsum FFN 108.9) with the LN/residual glue left to XLA —
            # measured 2% faster under grad than fusing the glue into the
            # kernel (see the branch above).
            from dpr_scale_tpu.ops.ffn import fused_ffn

            if rate > 0.0:
                bits = jax.random.bits(self.make_rng("dropout"), (), "uint32")
                seed = jax.lax.bitcast_convert_type(bits, jnp.int32)[None]
            else:
                seed = jnp.zeros((1,), jnp.int32)
            x = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                name="attention_ln",
            )(x + attn)
            B, L, H = x.shape
            ffn = fused_ffn(
                x.reshape(B * L, H).astype(cfg.dtype),
                *_DenseParams(
                    (cfg.hidden_size, cfg.intermediate_size),
                    name="intermediate",
                )(),
                *_DenseParams(
                    (cfg.intermediate_size, cfg.hidden_size),
                    name="ffn_output",
                )(),
                seed, rate,
                on_cpu,
            ).reshape(B, L, H)
            return nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="output_ln"
            )(x + ffn)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="attention_ln"
        )(x + attn)
        ffn = nn.Dense(
            cfg.intermediate_size, dtype=cfg.dtype, name="intermediate",
            kernel_init=nn.initializers.normal(0.02),
        )(x)
        ffn = nn.gelu(ffn, approximate=False)
        ffn = nn.Dense(
            cfg.hidden_size, dtype=cfg.dtype, name="ffn_output",
            kernel_init=nn.initializers.normal(0.02),
        )(ffn)
        ffn = nn.Dropout(cfg.hidden_dropout)(ffn, deterministic=deterministic)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="output_ln"
        )(x + ffn)
        return x


class TransformerEncoder(nn.Module):
    """Token ids -> contextual hidden states (B, L, H)."""

    cfg: TransformerConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,  # (B, L) int32
        attention_mask: Optional[jnp.ndarray] = None,  # (B, L) {0,1}
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        B, L = input_ids.shape
        if attention_mask is None:
            attention_mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)

        emb_init = nn.initializers.normal(0.02)
        word = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
            embedding_init=emb_init, name="word_embeddings",
        )(input_ids)
        if cfg.position_offset:  # RoBERTa-style: pad-aware position ids
            pos_ids = jnp.cumsum(attention_mask, axis=1) * attention_mask
            pos_ids = pos_ids + (cfg.position_offset - 1)
        else:
            pos_ids = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), (B, L))
        pos = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, dtype=cfg.dtype,
            embedding_init=emb_init, name="position_embeddings",
        )(pos_ids)
        x = word + pos
        if cfg.type_vocab_size > 0:
            tok_type = nn.Embed(
                cfg.type_vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                embedding_init=emb_init, name="token_type_embeddings",
            )(jnp.zeros_like(input_ids))
            x = x + tok_type
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="embeddings_ln"
        )(x)
        x = nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)

        # additive attention bias (B, 1, 1, L): 0 keep, big negative drop
        attn_bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -1e9

        layer_cls = TransformerLayer
        if cfg.remat:
            layer_cls = nn.remat(TransformerLayer, static_argnums=(3,))
        for i in range(cfg.num_layers):
            x = layer_cls(cfg, name=f"layer_{i}")(x, attn_bias, deterministic)
        return x
