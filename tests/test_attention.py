"""Fused Pallas attention vs the einsum reference path (interpret mode).

The dropout path (in-kernel PRNG) has no CPU lowering; it is validated
on the real chip by tools/validate_fused_attention.py. Here: exact
forward/VJP parity of the deterministic path, plus encoder-level
equivalence including padding masks.
"""
import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from dpr_scale_tpu.models.transformer import TransformerConfig, TransformerEncoder
from dpr_scale_tpu.ops.attention import fused_attention


def test_fused_attention_matches_reference_vjp():
    B, nh, L, hd = 2, 2, 16, 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, nh, L, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, nh, L, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, nh, L, hd)), jnp.float32)
    bias = jnp.zeros((B, 1, L), jnp.float32).at[0, 0, 12:].set(-1e9)
    seed = jnp.zeros((1,), jnp.int32)
    g = jnp.asarray(rng.normal(size=(B, nh, L, hd)), jnp.float32)

    def ref(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd) + bias[:, None]
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    def fused(q, k, v):
        return fused_attention(q, k, v, bias, seed, 0.0, True)

    o0, vjp0 = jax.vjp(ref, q, k, v)
    o1, vjp1 = jax.vjp(fused, q, k, v)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=2e-6)
    for a, b in zip(vjp0(g), vjp1(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)


def test_encoder_fused_attention_equivalence():
    """Full-encoder forward equality and grad agreement (fp32, padded
    batch). Per-leaf embedding grads nearly cancel, so grads are compared
    via a directional derivative against a random tangent."""
    cfg0 = dataclasses.replace(
        TransformerConfig.tiny(),
        num_heads=2,
        hidden_size=32,
        intermediate_size=16,
        dtype=jnp.float32,
    )
    cfg1 = dataclasses.replace(cfg0, fused_attention=True)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 32, size=(4, 24)).astype(np.int32)
    ids[2, 17:] = 0  # padded tail
    mask = (ids != 0).astype(np.int32)
    m0, m1 = TransformerEncoder(cfg0), TransformerEncoder(cfg1)
    params = m0.init(jax.random.PRNGKey(0), jnp.asarray(ids))["params"]

    o0 = m0.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    o1 = m1.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=1e-5)

    def loss(m):
        def f(p):
            o = m.apply({"params": p}, jnp.asarray(ids), jnp.asarray(mask))
            return jnp.sum(o**2)

        return f

    leaves = jax.tree_util.tree_leaves(params)
    tang = [
        jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(1), i), l.shape)
        for i, l in enumerate(leaves)
    ]

    def dirder(m):
        g = jax.tree_util.tree_leaves(jax.grad(loss(m))(params))
        return sum(float(jnp.vdot(a, t)) for a, t in zip(g, tang))

    d0, d1 = dirder(m0), dirder(m1)
    assert abs(d0 - d1) <= 1e-4 * max(1.0, abs(d0)), (d0, d1)


def test_encoder_fused_attention_bf16_close():
    """bf16 activations: fused and einsum paths agree to bf16 tolerance."""
    cfg0 = dataclasses.replace(
        TransformerConfig.tiny(), num_heads=2, hidden_size=32, intermediate_size=16
    )
    cfg1 = dataclasses.replace(cfg0, fused_attention=True)
    rng = np.random.default_rng(3)
    ids = rng.integers(1, 32, size=(3, 40)).astype(np.int32)
    mask = np.ones_like(ids)
    m0, m1 = TransformerEncoder(cfg0), TransformerEncoder(cfg1)
    params = m0.init(jax.random.PRNGKey(0), jnp.asarray(ids))["params"]
    o0 = m0.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    o1 = m1.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(o0, np.float32), np.asarray(o1, np.float32), atol=0.05, rtol=0.05
    )
