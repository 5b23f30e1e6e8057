"""Attribute the train-step MFU: time layer sub-stacks fwd+bwd on TPU.

    python tools/bench_step_parts.py [--arch bert_base] [--batch 256]

Times, scan-chained device-only (one dispatch per measurement, one
scalar fetch), 12-layer stacks of: the fused FFN block, the einsum FFN
block, the fused-attention block (merged QKV + kernel + out-proj), the
LN/residual glue, and the full TransformerLayer — each fwd-only and
under jax.grad — at the production context shape. Each line reports
ms/pass and TF/s against ITS OWN matmul FLOPs, so the gap between a
sub-stack's rate and the train step's measured rate (docs/STATUS.md
gap #3) is attributable line by line.
"""
from __future__ import annotations

import argparse
import math
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def timed(fn, args, iters, n_chain=4):
    """ms/pass: chains n_chain calls through a tiny data dependence on x
    (l0 * 1e-30 is not constant-foldable, so nothing DCEs)."""

    @jax.jit
    def chained(x, rest):
        def body(h, _):
            out = fn(h, *rest)
            l0 = jax.tree_util.tree_leaves(out)[0]
            return (
                h.astype(jnp.float32) + l0.astype(jnp.float32) * 1e-30
            ).astype(h.dtype), None

        h, _ = jax.lax.scan(body, x, None, length=n_chain)
        return h

    x, rest = args[0], tuple(args[1:])
    out = chained(x, rest)
    float(jnp.sum(out[..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = chained(x, rest)
    float(jnp.sum(out[..., :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / (iters * n_chain) * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="bert_base")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--seq", type=int, default=128)
    p.add_argument("--layers", type=int, default=12)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--only", default=None, help="comma list of case names")
    args = p.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from dpr_scale_tpu.models.transformer import TransformerConfig
    from dpr_scale_tpu.ops.attention import fused_attention
    from dpr_scale_tpu.ops.ffn import fused_ffn

    cfg = getattr(TransformerConfig, args.arch)()
    H, F, nh, NL = (
        cfg.hidden_size, cfg.intermediate_size, cfg.num_heads, args.layers,
    )
    hd = H // nh
    B, L = args.batch, args.seq
    N = B * L
    rate = args.dropout
    key = jax.random.PRNGKey(0)
    x2 = jax.random.normal(key, (N, H), jnp.bfloat16)
    x3 = x2.reshape(B, L, H)
    W1 = jax.random.normal(key, (NL, H, F), jnp.float32) * 0.02
    Bi1 = jnp.zeros((NL, F), jnp.float32)
    W2 = jax.random.normal(key, (NL, F, H), jnp.float32) * 0.02
    Bi2 = jnp.zeros((NL, H), jnp.float32)
    Wqkv = jax.random.normal(key, (NL, H, 3 * H), jnp.float32) * 0.02
    Wo = jax.random.normal(key, (NL, H, H), jnp.float32) * 0.02
    gains = jnp.ones((NL, 2, H), jnp.float32)
    seed0 = jnp.zeros((1,), jnp.int32)
    bias = jnp.zeros((B, 1, L), jnp.float32)

    # per-token matmul FLOPs (fwd); x3 for fwd+bwd
    f_ffn = 4 * H * F
    f_qkv = 2 * H * 3 * H + 2 * H * H  # merged qkv + out proj
    f_attn = 4 * H * L  # scores + ctx, all heads

    def _ln(v, g):
        m = jnp.mean(v.astype(jnp.float32), axis=-1, keepdims=True)
        c = v.astype(jnp.float32) - m
        var = jnp.mean(c * c, axis=-1, keepdims=True)
        return (c * jax.lax.rsqrt(var + 1e-12) * g).astype(v.dtype)

    def ffn_fused(x, W1, Bi1, W2, Bi2):
        def layer(h, w):
            w1, b1, w2, b2 = w
            return fused_ffn(h, w1, b1, w2, b2, seed0, rate, False), None

        return jax.lax.scan(layer, x, (W1, Bi1, W2, Bi2))[0]

    def ffn_einsum(x, W1, Bi1, W2, Bi2):
        def layer(h, w):
            w1, b1, w2, b2 = w
            z = jnp.dot(h, w1.astype(h.dtype)) + b1.astype(h.dtype)
            z = jax.nn.gelu(z.astype(jnp.float32), approximate=False)
            z = jnp.dot(z.astype(h.dtype), w2.astype(h.dtype)) + b2.astype(
                h.dtype
            )
            return z, None

        return jax.lax.scan(layer, x, (W1, Bi1, W2, Bi2))[0]

    def _attn_block(h, wqkv, wo):
        qkv = jnp.dot(h.astype(jnp.bfloat16), wqkv.astype(jnp.bfloat16))
        q, k, v = (
            t.reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
            for t in jnp.split(qkv, 3, axis=-1)
        )
        ctx = fused_attention(q, k, v, bias, seed0, rate, False)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, H)
        return jnp.dot(ctx, wo.astype(jnp.bfloat16))

    def attn_fused(x, Wqkv, Wo):
        def layer(h, w):
            return _attn_block(h, *w), None

        return jax.lax.scan(layer, x, (Wqkv, Wo))[0]

    def _attn_block_einsum(h, wqkv, wo, lkey):
        qkv = jnp.dot(h.astype(jnp.bfloat16), wqkv.astype(jnp.bfloat16))
        q, k, v = (
            t.reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
            for t in jnp.split(qkv, 3, axis=-1)
        )
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (1.0 / math.sqrt(hd)) + bias[:, None]
        p = jax.nn.softmax(s, axis=-1)
        if rate > 0.0:
            keep = jax.random.bernoulli(lkey, 1.0 - rate, p.shape)
            p = jnp.where(keep, p / (1.0 - rate), 0.0)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", p.astype(jnp.bfloat16), v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, H)
        return jnp.dot(ctx, wo.astype(jnp.bfloat16))

    def attn_einsum(x, Wqkv, Wo):
        base = jax.random.key(0, impl="rbg")

        def layer(h, w):
            wqkv, wo, i = w
            return _attn_block_einsum(h, wqkv, wo, jax.random.fold_in(base, i)), None

        return jax.lax.scan(
            layer, x, (Wqkv, Wo, jnp.arange(NL, dtype=jnp.int32))
        )[0]

    def attn_projs_only(x, Wqkv, Wo):
        """qkv + out-proj matmuls with the attention core replaced by a
        head-mean (isolates the projection ceiling from the kernel)."""

        def layer(h, w):
            wqkv, wo = w
            qkv = jnp.dot(h.astype(jnp.bfloat16), wqkv.astype(jnp.bfloat16))
            q, k, v = jnp.split(qkv, 3, axis=-1)
            ctx = v + 0.5 * q + 0.25 * k
            return jnp.dot(ctx, wo.astype(jnp.bfloat16)), None

        return jax.lax.scan(layer, x, (Wqkv, Wo))[0]

    def glue_ln(x, gains):
        def layer(h, g):
            h = _ln(h + h * 1.0009765625, g[0])
            return _ln(h + h * 0.9990234375, g[1]), None

        return jax.lax.scan(layer, x, gains)[0]

    def full_layer(x, W1, Bi1, W2, Bi2, Wqkv, Wo, gains):
        def layer(h, w):
            w1, b1, w2, b2, wqkv, wo, g = w
            a = _attn_block(h, wqkv, wo)
            h = _ln(h + a, g[0])
            f = fused_ffn(
                h.reshape(N, H), w1, b1, w2, b2, seed0, rate, False
            ).reshape(B, L, H)
            return _ln(h + f, g[1]), None

        return jax.lax.scan(
            layer, x, (W1, Bi1, W2, Bi2, Wqkv, Wo, gains)
        )[0]

    # the production composition since fused_ffn_ln shipped
    # (models/transformer.py: cfg.fused_ffn selects it): attention block
    # + ONE kernel for attention_ln + FFN + output_ln + both residual
    # adds. Compare against full_layer (separate XLA glue) to measure
    # whether the fusion actually absorbed the 18.6 ms LN/residual glue.
    biases = jnp.zeros((NL, 2, H), jnp.float32)

    def full_layer_lnfused(x, W1, Bi1, W2, Bi2, Wqkv, Wo, gains, biases):
        from dpr_scale_tpu.ops.ffn import fused_ffn_ln

        def layer(h, w):
            w1, b1, w2, b2, wqkv, wo, g, be = w
            a = _attn_block(h, wqkv, wo)
            out = fused_ffn_ln(
                (h + a).reshape(N, H).astype(jnp.bfloat16),
                w1, b1, w2, b2, g[0], be[0], g[1], be[1], seed0, rate,
            ).reshape(B, L, H)
            return out, None

        return jax.lax.scan(
            layer, x, (W1, Bi1, W2, Bi2, Wqkv, Wo, gains, biases)
        )[0]

    cases = [
        ("ffn_fused", ffn_fused, (x2, W1, Bi1, W2, Bi2), f_ffn),
        ("ffn_einsum", ffn_einsum, (x2, W1, Bi1, W2, Bi2), f_ffn),
        ("attn_fused", attn_fused, (x3, Wqkv, Wo), f_qkv + f_attn),
        ("attn_einsum", attn_einsum, (x3, Wqkv, Wo), f_qkv + f_attn),
        ("attn_projs_only", attn_projs_only, (x3, Wqkv, Wo), f_qkv),
        ("glue_ln", glue_ln, (x3, gains), 1),
        (
            "full_layer",
            full_layer,
            (x3, W1, Bi1, W2, Bi2, Wqkv, Wo, gains),
            f_ffn + f_qkv + f_attn,
        ),
        (
            "full_layer_lnfused",
            full_layer_lnfused,
            (x3, W1, Bi1, W2, Bi2, Wqkv, Wo, gains, biases),
            f_ffn + f_qkv + f_attn,
        ),
    ]
    only = set(args.only.split(",")) if args.only else None
    print(f"{args.arch} B={B} L={L} tokens={N} layers={NL} rate={rate}")
    for name, fn, a, ftok in cases:
        if only and name not in only:
            continue
        ms_f = timed(fn, a, args.iters)

        def loss(*z):
            return jnp.sum(fn(*z).astype(jnp.float32))

        g = jax.grad(loss, argnums=tuple(range(len(a))))
        ms_b = timed(lambda *z: g(*z), a, args.iters)
        tf_f = ftok * N * NL / ms_f / 1e9
        tf_b = 3 * ftok * N * NL / ms_b / 1e9
        print(
            f"{name:12s} fwd {ms_f:7.2f} ms ({tf_f:6.1f} TF/s)   "
            f"fwd+bwd {ms_b:7.2f} ms ({tf_b:6.1f} TF/s)"
        )


if __name__ == "__main__":
    main()
