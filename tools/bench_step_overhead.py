"""Decompose the NON-LAYER cost of the dense train step on TPU.

    python tools/bench_step_overhead.py [--arch bert_base] [--batch 128]

docs/STATUS.md gap #3 attributes the train-step residue to ~23 ms/step
of non-layer work (embeddings fwd+bwd, contrastive loss, AdamW update,
grad_norm). This times, on the real chip, the same production step
(fused attention + fused FFN, dropout 0.1, grad-clip 2.0) under
surgical variants:

  full        the production step (clipped AdamW + grad_norm metric)
  sgd         optimizer swapped for plain SGD   -> AdamW+clip HBM traffic
  no_gnorm    grad_norm metric dropped          -> the extra grad read
  grads_all   value_and_grad keeping EVERY grad leaf alive, NO optimizer
              update -> (no_gnorm - grads_all) is the optimizer+apply
              cost, (grads_all - grads_only) is the pure WGRAD share
  grads_only  value_and_grad keeping ONE grad leaf alive -> XLA DCEs the
              other params' wgrad matmuls; (grads_only - fwd_only) is
              the DGRAD-only share of the backward (wgrads DCE'd), NOT
              the full backward -- that is (grads_all - fwd_only)
  fwd_only    loss forward only

Each variant is a separate jit with donated state, timed over --steps
dispatches with a scalar fetch (tunnel-safe). Differences between rows
attribute the overhead line by line; the part of (full - the 12-layer
stack time from tools/bench_step_parts.py) not explained here is
embedding gather/scatter + pooling + loss, which ride in every variant.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="bert_base")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--negatives", type=int, default=1)
    p.add_argument("--qlen", type=int, default=32)
    p.add_argument("--clen", type=int, default=128)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--dropout", type=float, default=0.1)
    args = p.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from dpr_scale_tpu.cli.common import ARCH_PRESETS
    from dpr_scale_tpu.optim import make_optimizer
    from dpr_scale_tpu.train import DenseRetrieverTask
    from dpr_scale_tpu.train.schedule import linear_warmup_decay

    cfg = dataclasses.replace(
        ARCH_PRESETS[args.arch](),
        hidden_dropout=args.dropout,
        attention_dropout=args.dropout,
        fused_attention=True,
        fused_ffn=True,
    )
    B, C = args.batch, 1 + args.negatives
    rng = np.random.default_rng(0)
    batch = {
        "query_ids": rng.integers(1, cfg.vocab_size, (B, args.qlen)).astype(np.int32),
        "query_mask": np.ones((B, args.qlen), np.int32),
        "contexts_ids": rng.integers(1, cfg.vocab_size, (B * C, args.clen)).astype(
            np.int32
        ),
        "contexts_mask": np.ones((B * C, args.clen), np.int32),
        "pos_ctx_indices": (np.arange(B) * C).astype(np.int32),
        "scores": np.zeros((B, C), np.float32),
        "ctx_mask": np.zeros((B * C,), bool),
    }
    sched = linear_warmup_decay(2e-5, 100, 10000)

    def build_task(optimizer):
        return DenseRetrieverTask(cfg=cfg, optimizer=optimizer)

    task_full = build_task(make_optimizer("adamw", sched, grad_clip_norm=2.0))
    sb = task_full.shard(batch)

    def fresh_state():
        # every variant jit donates its state, so each needs its own
        return task_full.init_state(jax.random.PRNGKey(0), batch)

    def timed(step, state, name=""):
        state, m = step(state, sb)
        float(jax.tree_util.tree_leaves(m)[0])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, m = step(state, sb)
        float(jax.tree_util.tree_leaves(m)[0])
        ms = (time.perf_counter() - t0) / args.steps * 1e3
        print(f"# {name}: {ms:.2f} ms/step", file=sys.stderr, flush=True)
        return ms, state

    results = {}
    full_ms, _ = timed(task_full.make_train_step(), fresh_state(), 'full')
    results["full"] = full_ms

    # sgd: same loss/backward, no moment traffic / clip / schedule
    task_sgd = build_task(optax.sgd(2e-5))
    results["sgd"], _ = timed(
        task_sgd.make_train_step(),
        task_sgd.init_state(jax.random.PRNGKey(0), batch),
        "sgd",
    )

    # no_gnorm: full step minus the grad_norm metric read
    def step_no_gnorm(state, b):
        step_rng = task_full._step_dropout_rng(state)
        (loss, _s), grads = jax.value_and_grad(
            task_full._loss_fn, has_aux=True
        )(state.params, b, step_rng)
        updates, new_opt = task_full.optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(
            params=new_params, opt_state=new_opt, step=state.step + 1
        ), {"train_loss": loss}

    results["no_gnorm"], _ = timed(
        jax.jit(step_no_gnorm, donate_argnums=(0,)), fresh_state(), "no_gnorm"
    )

    # grads_all: EVERY grad leaf alive (one element read per leaf keeps
    # XLA from DCE-ing any wgrad matmul) but no optimizer update/apply --
    # the clean "full backward" row
    def step_grads_all(state, b):
        step_rng = task_full._step_dropout_rng(state)
        (loss, _s), grads = jax.value_and_grad(
            task_full._loss_fn, has_aux=True
        )(state.params, b, step_rng)
        keep = sum(l.ravel()[0] for l in jax.tree_util.tree_leaves(grads))
        return state.replace(step=state.step + 1), {
            "train_loss": loss,
            "gsum": keep,
        }

    results["grads_all"], _ = timed(
        jax.jit(step_grads_all, donate_argnums=(0,)), fresh_state(), "grads_all"
    )

    # grads_only: one live grad leaf -- the rest of the wgrads DCE away
    def step_grads(state, b):
        step_rng = task_full._step_dropout_rng(state)
        (loss, _s), grads = jax.value_and_grad(
            task_full._loss_fn, has_aux=True
        )(state.params, b, step_rng)
        return state.replace(step=state.step + 1), {
            "train_loss": loss,
            "g0": jax.tree_util.tree_leaves(grads)[0].ravel()[0],
        }

    results["grads_only"], _ = timed(
        jax.jit(step_grads, donate_argnums=(0,)), fresh_state(), "grads_only"
    )

    # fwd_only: loss forward, no backward
    def step_fwd(state, b):
        step_rng = task_full._step_dropout_rng(state)
        loss, _s = task_full._loss_fn(state.params, b, step_rng)
        return state.replace(step=state.step + 1), {"train_loss": loss}

    results["fwd_only"], _ = timed(jax.jit(step_fwd, donate_argnums=(0,)), fresh_state(), "fwd_only")

    # same matmul-flops model as bench_train.py
    h, L, ffn = cfg.hidden_size, cfg.num_layers, cfg.intermediate_size
    per_tok = L * (4 * h * h + 2 * h * ffn) * 2
    tokens = B * args.qlen + B * C * args.clen
    attn = L * 2 * 2 * h * (B * args.qlen**2 + B * C * args.clen**2)
    step_tflop = 3 * (per_tok * tokens + attn) / 1e12

    print(
        json.dumps(
            {
                "metric": f"step_overhead_{args.arch}_B{args.batch}",
                "unit": "ms/step",
                **{k: round(v, 2) for k, v in results.items()},
                "adamw_clip_cost_ms": round(results["full"] - results["sgd"], 2),
                "gnorm_cost_ms": round(results["full"] - results["no_gnorm"], 2),
                "opt_apply_ms": round(
                    results["no_gnorm"] - results["grads_all"], 2
                ),
                "wgrad_ms": round(
                    results["grads_all"] - results["grads_only"], 2
                ),
                "dgrad_cost_ms": round(
                    results["grads_only"] - results["fwd_only"], 2
                ),
                "bwd_full_ms": round(
                    results["grads_all"] - results["fwd_only"], 2
                ),
                "full_tflops": round(step_tflop / (full_ms * 1e-3), 1),
            }
        )
    )


if __name__ == "__main__":
    main()
