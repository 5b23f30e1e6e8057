"""MADGRAD (momentumized adaptive dual averaging) as an optax transform.

First-party parity with the reference's full implementation
(dpr_scale/optim/madgrad.py:11-199, the facebookresearch MADGRAD method,
https://arxiv.org/abs/2101.11075). Dense-path update:

    lamb_k = lr_k * sqrt(k + 1)
    g      = grad + weight_decay * param            (classic L2, as reference)
    s_k+1  = s_k + lamb_k * g
    v_k+1  = v_k + lamb_k * g*g
    z_k+1  = x0 - s_k+1 / (v_k+1^(1/3) + eps)
    x_k+1  = (1 - c) x_k + c z_k+1,   c = 1 - momentum

(The reference's sparse-gradient branch, :125-155, has no TPU counterpart:
embedding grads are dense under XLA.)
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Union

import chex
import jax
import jax.numpy as jnp
import optax


class MadgradState(NamedTuple):
    count: chex.Array
    grad_sum: optax.Updates  # s
    grad_sum_sq: optax.Updates  # v
    x0: optax.Params


def madgrad(
    learning_rate: Union[float, Callable] = 1e-2,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    eps: float = 1e-6,
) -> optax.GradientTransformation:
    if not 0.0 <= momentum < 1.0:
        raise ValueError(f"momentum must be in [0,1): {momentum}")

    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return MadgradState(
            count=jnp.zeros([], jnp.int32),
            grad_sum=zeros,
            grad_sum_sq=jax.tree_util.tree_map(jnp.zeros_like, params),
            x0=jax.tree_util.tree_map(jnp.asarray, params),
        )

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("madgrad requires params")
        k = state.count
        lr = learning_rate(k) if callable(learning_rate) else learning_rate
        lamb = lr * jnp.sqrt(k.astype(jnp.float32) + 1.0)

        if weight_decay:
            updates = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, updates, params
            )
        new_s = jax.tree_util.tree_map(
            lambda s, g: s + lamb * g, state.grad_sum, updates
        )
        new_v = jax.tree_util.tree_map(
            lambda v, g: v + lamb * g * g, state.grad_sum_sq, updates
        )
        ck = 1.0 - momentum

        def step(p, s, v, x0):
            z = x0 - s / (jnp.cbrt(v) + eps)
            new_p = (1.0 - ck) * p + ck * z
            return new_p - p

        deltas = jax.tree_util.tree_map(step, params, new_s, new_v, state.x0)
        return deltas, MadgradState(
            count=k + 1, grad_sum=new_s, grad_sum_sq=new_v, x0=state.x0
        )

    return optax.GradientTransformation(init_fn, update_fn)
