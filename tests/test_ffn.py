"""Fused Pallas FFN vs the einsum reference path (interpret mode).

The dropout path (in-kernel PRNG) has no CPU lowering; it is validated
on the real chip by tools/validate_tpu.py. Here: forward/VJP parity of
the deterministic path (fp32 exact-ish, bf16 to storage tolerance),
padding correctness, checkpoint-tree parity with the einsum layout, and
encoder-level equivalence.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpr_scale_tpu.models.transformer import TransformerConfig, TransformerEncoder
from dpr_scale_tpu.ops.ffn import fused_ffn


def _mats(N, H, F, dtype, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(N, H)) * 0.5, dtype),
        jnp.asarray(rng.normal(size=(H, F)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(F,)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(F, H)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(H,)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(N, H)), jnp.float32),
    )


def _ref(x, w1, b1, w2, b2):
    h = jnp.dot(x, w1.astype(x.dtype), preferred_element_type=jnp.float32) + b1
    h = jax.nn.gelu(h, approximate=False).astype(x.dtype)
    return jnp.dot(h, w2.astype(x.dtype), preferred_element_type=jnp.float32) + b2


@pytest.mark.parametrize("N", [200, 700])  # 700 > row tile: exercises padding
def test_fused_ffn_matches_reference_vjp_fp32(N):
    H, F = 128, 256
    x, w1, b1, w2, b2, g = _mats(N, H, F, jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)

    def fused(x, w1, b1, w2, b2):
        return fused_ffn(x, w1, b1, w2, b2, seed, 0.0, True)

    o0, vjp0 = jax.vjp(_ref, x, w1, b1, w2, b2)
    o1, vjp1 = jax.vjp(fused, x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=2e-5)
    for name, a, b in zip(["dx", "dw1", "db1", "dw2", "db2"], vjp0(g), vjp1(g)):
        scale = max(1.0, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=2e-5 * scale, err_msg=name,
        )


def test_fused_ffn_bf16_close():
    """bf16 activations: fwd + weight grads agree to bf16-residual
    tolerance (pre is stored bf16, matching what the einsum path's
    Dense(dtype=bf16) computes)."""
    N, H, F = 300, 128, 256
    x, w1, b1, w2, b2, g = _mats(N, H, F, jnp.bfloat16, seed=1)
    seed = jnp.zeros((1,), jnp.int32)

    def fused(x, w1, b1, w2, b2):
        return fused_ffn(x, w1, b1, w2, b2, seed, 0.0, True)

    o0, vjp0 = jax.vjp(_ref, x, w1, b1, w2, b2)
    o1, vjp1 = jax.vjp(fused, x, w1, b1, w2, b2)
    np.testing.assert_allclose(
        np.asarray(o0, np.float32), np.asarray(o1, np.float32),
        atol=0.02, rtol=0.02,
    )
    for name, a, b in zip(
        ["dx", "dw1", "db1", "dw2", "db2"],
        vjp0(g.astype(o0.dtype)),
        vjp1(g.astype(o1.dtype)),
    ):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = max(1e-3, float(np.abs(a).max()))
        assert np.abs(a - b).max() / denom < 0.02, name


def test_encoder_fused_ffn_param_tree_and_equivalence():
    """fused_ffn=True creates the SAME param tree as the einsum path
    (checkpoint interop) and the same forward/gradients (fp32)."""
    cfg0 = dataclasses.replace(
        TransformerConfig.tiny(),
        num_heads=2, hidden_size=32, intermediate_size=16, dtype=jnp.float32,
    )
    cfg1 = dataclasses.replace(cfg0, fused_ffn=True)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 32, size=(4, 24)).astype(np.int32)
    ids[2, 17:] = 0  # padded tail
    mask = (ids != 0).astype(np.int32)
    m0, m1 = TransformerEncoder(cfg0), TransformerEncoder(cfg1)
    params = m0.init(jax.random.PRNGKey(0), jnp.asarray(ids))["params"]
    params1 = m1.init(jax.random.PRNGKey(0), jnp.asarray(ids))["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params1
    )

    o0 = m0.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    o1 = m1.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=1e-5)

    # sum(o^2) is DEGENERATE here: with output_ln at scale=1/bias=0 each
    # row of o is normalized, so sum(o^2) == B*L*H is constant and every
    # upstream gradient is analytically ~0 (pure cancellation noise). A
    # random linear functional keeps all gradients well-defined.
    w_loss = jnp.asarray(rng.normal(size=(32,)), jnp.float32)

    def loss(m):
        def f(p):
            o = m.apply({"params": p}, jnp.asarray(ids), jnp.asarray(mask))
            return jnp.sum(o * w_loss)

        return f

    g0 = jax.grad(loss(m0))(params)
    g1 = jax.grad(loss(m1))(params)
    for (k0, a), (k1, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(g0), key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(g1), key=lambda kv: str(kv[0])),
    ):
        scale = max(1.0, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5 * scale, err_msg=str(k0)
        )


def test_fused_ffn_ln_matches_composite_vjp_fp32():
    """fused_ffn_ln vs LN1 -> FFN -> (+res) -> LN2 in plain jnp: fwd and
    all nine cotangents (fp32, interpret mode)."""
    from dpr_scale_tpu.ops.ffn import fused_ffn_ln

    N, H, F = 200, 128, 256
    rng = np.random.default_rng(3)
    r, w1, b1, w2, b2, g = _mats(N, H, F, jnp.float32, seed=3)
    g1 = jnp.asarray(rng.normal(size=(H,)) * 0.1 + 1.0, jnp.float32)
    be1 = jnp.asarray(rng.normal(size=(H,)) * 0.05, jnp.float32)
    g2 = jnp.asarray(rng.normal(size=(H,)) * 0.1 + 1.0, jnp.float32)
    be2 = jnp.asarray(rng.normal(size=(H,)) * 0.05, jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)
    eps = 1e-12

    def ln(v, sc, bi):
        mu = v.mean(-1, keepdims=True)
        var = (v * v).mean(-1, keepdims=True) - mu * mu
        return (v - mu) * jax.lax.rsqrt(var + eps) * sc + bi

    def ref(r, w1, b1, w2, b2, g1, be1, g2, be2):
        x1 = ln(r, g1, be1)
        z = jnp.dot(
            jax.nn.gelu(jnp.dot(x1, w1) + b1, approximate=False), w2
        ) + b2
        return ln(x1 + z, g2, be2)

    def fused(r, w1, b1, w2, b2, g1, be1, g2, be2):
        return fused_ffn_ln(
            r, w1, b1, w2, b2, g1, be1, g2, be2, seed, 0.0, eps, True
        )

    args = (r, w1, b1, w2, b2, g1, be1, g2, be2)
    o0, vjp0 = jax.vjp(ref, *args)
    o1, vjp1 = jax.vjp(fused, *args)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=2e-5)
    names = ["dr", "dw1", "db1", "dw2", "db2", "dg1", "dbe1", "dg2", "dbe2"]
    for name, a, b in zip(names, vjp0(g), vjp1(g)):
        scale = max(1.0, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5 * scale, err_msg=name
        )


def test_fused_kernels_mesh_parity():
    """mesh(8) == mesh(1) after real train steps with fused_attention AND
    fused_ffn on (interpret-mode Pallas under GSPMD — repo convention:
    every sharded code path gets a simulated-mesh test). Deterministic
    (tiny cfg has zero dropout), so the fused paths stay active on CPU."""
    from dpr_scale_tpu.optim import make_optimizer
    from dpr_scale_tpu.parallel import get_mesh
    from dpr_scale_tpu.train import DenseRetrieverTask

    cfg = dataclasses.replace(
        TransformerConfig.tiny(), dtype=jnp.float32,
        fused_attention=True, fused_ffn=True,
    )
    rng = np.random.default_rng(5)
    B, C, L = 8, 2, 8
    mk = lambda n: rng.integers(5, 32, size=(n, L)).astype(np.int32)
    batch = {
        "query_ids": mk(B),
        "query_mask": np.ones((B, L), np.int32),
        "contexts_ids": mk(B * C),
        "contexts_mask": np.ones((B * C, L), np.int32),
        "pos_ctx_indices": (np.arange(B) * C).astype(np.int32),
        "scores": np.zeros((B, C), np.float32),
        "ctx_mask": np.zeros((B * C,), bool),
    }

    states, losses = [], []
    for ndev in (8, 1):
        task = DenseRetrieverTask(
            cfg=cfg,
            optimizer=make_optimizer("adamw", 1e-3, grad_clip_norm=2.0),
            mesh=get_mesh(ndev),
        )
        state = task.init_state(jax.random.PRNGKey(0), batch)
        step = task.make_train_step()
        for _ in range(2):
            state, m = step(state, task.shard(batch))
        states.append(state)
        losses.append(float(m["train_loss"]))
    np.testing.assert_allclose(losses[0], losses[1], rtol=2e-5)
    flat8 = jax.tree_util.tree_leaves_with_path(states[0].params)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(states[1].params))
    for path, leaf8 in flat8:
        np.testing.assert_allclose(
            np.asarray(leaf8), np.asarray(flat1[path]),
            rtol=3e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )
