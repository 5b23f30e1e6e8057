"""Optimizer registry (reference conf/task/optim/*: adamw, lamb, madgrad)."""
from __future__ import annotations

from typing import Callable, Optional, Union

import optax

from dpr_scale_tpu.optim.madgrad import madgrad


def make_optimizer(
    name: str = "adamw",
    learning_rate: Union[float, Callable] = 1e-5,
    weight_decay: float = 0.0,
    betas=(0.9, 0.999),
    eps: Optional[float] = None,  # None = per-optimizer default
    # (1e-8 adam-family, 1e-6 madgrad — the reference defaults)
    grad_clip_norm: Optional[float] = None,
    accumulate_steps: int = 1,
) -> optax.GradientTransformation:
    name = name.lower()
    adam_eps = 1e-8 if eps is None else eps
    if name == "adamw":
        opt = optax.adamw(
            learning_rate, b1=betas[0], b2=betas[1], eps=adam_eps,
            weight_decay=weight_decay,
        )
    elif name == "lamb":
        opt = optax.lamb(
            learning_rate, b1=betas[0], b2=betas[1], eps=adam_eps,
            weight_decay=weight_decay,
        )
    elif name == "madgrad":
        opt = madgrad(
            learning_rate, weight_decay=weight_decay,
            eps=1e-6 if eps is None else eps,
        )
    elif name == "adam":
        opt = optax.adam(learning_rate, b1=betas[0], b2=betas[1], eps=adam_eps)
    else:
        raise ValueError(f"unknown optimizer {name!r}")

    chain = []
    if grad_clip_norm:  # reference default: gradient_clip_val 2.0 (slurm.yaml)
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    chain.append(opt)
    tx = optax.chain(*chain) if len(chain) > 1 else chain[0]
    if accumulate_steps > 1:  # reference accumulate_grad_batches
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx
