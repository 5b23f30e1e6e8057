"""GradCache-style chunked training step, shared by the dense and
multi-vector tasks (``grad_cache_chunks`` on both).

Exact large-batch contrastive gradients at O(B/chunks) activation memory
(plain optax-MultiSteps accumulation — the reference's
accumulate_grad_batches — loses cross-chunk in-batch negatives; this
keeps them):

  phase 1  encode the batch in a scanned chunk loop with NO grad graph
           (one chunk's activations live at a time), caching the encoder
           outputs — (B, D) embeddings for the dense task, token-level
           dicts for the multi-vector family;
  phase 2  differentiate the loss w.r.t. the cached float outputs
           (cheap: the loss sees only the cached reprs, not the trunk);
  phase 3  re-encode each chunk under ``jax.vjp`` against its cotangent
           slice and accumulate param grads (gradient linearity).

Gradients equal the monolithic step: the loss depends on params only
through the encoder outputs, integer outputs (routing ids) carry no
gradient in the monolithic step either, and dropout bits are chunk-seeded
so phases 1 and 3 see identical masks. Cost: one extra forward (~4/3 of
the step FLOPs).

Chunking is STRIDED — chunk g takes rows {g, C+g, 2C+g, ...} — so the
reshape splits the block-sharded leading axis locally and every chunk
stays evenly data-sharded on the mesh (no cross-device data movement).

Encoder outputs are dicts per side; every FLOAT leaf with a batch axis is
differentiated through (token reprs, router planes, expert weights,
masks), integer leaves ride as loss constants, per-chunk scalar leaves
are dropped (the loss callback recomputes batch stats from the unchunked
planes when it needs them).
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp


def wrap_rng(key, impl: str):
    """Re-wrap a threefry key for the TPU's fast native bit generator
    (mask bits then may differ across shardings and jax versions — fine
    for dropout noise); ``impl="threefry"`` returns the key unchanged."""
    if impl == "rbg":
        data = jax.random.key_data(key)
        key = jax.random.wrap_key_data(jnp.tile(data, 2)[:4], impl="rbg")
    return key


def _diff_part(repr_dict: Dict) -> Dict:
    """The differentiated slice of an encoder output dict: float leaves
    with a batch axis, in sorted-key order (stable structure between the
    phase-2 grad and the phase-3 cotangent)."""
    return {
        k: v
        for k in sorted(repr_dict)
        if jnp.issubdtype((v := repr_dict[k]).dtype, jnp.floating)
        and v.ndim >= 1
    }


def grad_cache_grads(
    params,
    batch: Dict,
    base_rng,
    chunks: int,
    encode_chunk: Callable,  # (params, qi, qm, ci, cm, key) -> (q_dict, c_dict)
    loss_on_reprs: Callable,  # (q_full_dict, c_full_dict) -> (loss, aux)
) -> Tuple[jnp.ndarray, Dict, any]:
    """(loss, aux, grads) equal to the monolithic step (module docstring)."""
    C = chunks
    B = batch["query_ids"].shape[0]
    nctx = batch["contexts_ids"].shape[0]
    ratio = nctx // B
    assert B % C == 0 and nctx == B * ratio, (B, nctx, C)
    chunk_keys = jax.random.split(base_rng, C)

    def q_chunks(x):
        return x.reshape(B // C, C, *x.shape[1:]).swapaxes(0, 1)

    def c_chunks(x):
        xr = x.reshape(B // C, C, ratio, *x.shape[1:]).swapaxes(0, 1)
        return xr.reshape(C, (B // C) * ratio, *x.shape[1:])

    def q_unchunk(x):
        return x.swapaxes(0, 1).reshape(B, *x.shape[2:])

    def c_unchunk(x):
        xr = x.reshape(C, B // C, ratio, *x.shape[2:]).swapaxes(0, 1)
        return xr.reshape(nctx, *x.shape[2:])

    xs = (
        q_chunks(batch["query_ids"]),
        q_chunks(batch["query_mask"]),
        c_chunks(batch["contexts_ids"]),
        c_chunks(batch["contexts_mask"]),
        chunk_keys,
    )

    # phase 1: cache the encoder outputs, no grad graph
    def enc(_, x):
        return None, encode_chunk(params, *x)

    _, (q_stack, c_stack) = jax.lax.scan(enc, None, xs)

    def unchunk(stack, un):
        # per-chunk scalars (stacked to (C,)) are dropped; the loss
        # callback recomputes batch stats from the unchunked planes
        return {k: un(v) for k, v in stack.items() if v.ndim >= 2}

    q_full = unchunk(q_stack, q_unchunk)
    c_full = unchunk(c_stack, c_unchunk)

    # phase 2: loss + cotangents w.r.t. the float batch-leading leaves
    q_diff, c_diff = _diff_part(q_full), _diff_part(c_full)
    q_stat = {k: v for k, v in q_full.items() if k not in q_diff}
    c_stat = {k: v for k, v in c_full.items() if k not in c_diff}

    def emb_loss(qd, cd):
        return loss_on_reprs({**q_stat, **qd}, {**c_stat, **cd})

    (loss, aux), (dq, dc) = jax.value_and_grad(
        emb_loss, argnums=(0, 1), has_aux=True
    )(q_diff, c_diff)

    # phase 3: re-encode each chunk under vjp against its cotangent slice
    dq_chunks = jax.tree_util.tree_map(q_chunks, dq)
    dc_chunks = jax.tree_util.tree_map(c_chunks, dc)

    def chunk_grad(acc, x):
        qi, qm, ci, cm, key, dq_i, dc_i = x

        def diff_out(p):
            q_repr, c_repr = encode_chunk(p, qi, qm, ci, cm, key)
            return _diff_part(q_repr), _diff_part(c_repr)

        _, vjp = jax.vjp(diff_out, params)
        (g,) = vjp((dq_i, dc_i))
        return jax.tree_util.tree_map(jnp.add, acc, g), None

    zero = jax.tree_util.tree_map(
        lambda p: jnp.zeros(p.shape, jnp.float32), params
    )
    grads, _ = jax.lax.scan(chunk_grad, zero, (*xs, dq_chunks, dc_chunks))
    grads = jax.tree_util.tree_map(
        lambda g, p: g.astype(p.dtype), grads, params
    )
    return loss, aux, grads
