"""Training-step throughput harness (queries/sec) on the attached TPU.

    python bench_train.py [--arch bert_base] [--batch 128] [--negatives 1]
                          [--qlen 32] [--clen 128]

Runs the full jitted SPMD train step (forward + global contrastive loss +
backward + AdamW) on synthetic batches; reports steps/s and queries/s.
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from bench import _probe_device

    _probe_device()  # fail fast instead of hanging on a dead tunnel
    parser = argparse.ArgumentParser()
    parser.add_argument("--arch", default="bert_base")
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--negatives", type=int, default=1)
    parser.add_argument("--qlen", type=int, default=32)
    parser.add_argument("--clen", type=int, default=128)
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--remat", action="store_true", help="per-layer jax.checkpoint")
    parser.add_argument("--dropout", type=float, default=None, help="override both dropout rates")
    parser.add_argument(
        "--fused-attention", action="store_true",
        help="Pallas fused attention with in-kernel dropout",
    )
    parser.add_argument(
        "--fused-ffn", action="store_true",
        help="Pallas fused FFN (matmul+GELU+matmul+dropout)",
    )
    parser.add_argument(
        "--grad-cache", type=int, default=1, metavar="C",
        help="GradCache chunks: exact full-batch contrastive gradients "
        "with activation memory bounded by B/C (enables batches past "
        "the no-remat HBM ceiling; ~4/3 step FLOPs)",
    )
    args = parser.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from dpr_scale_tpu.cli.common import ARCH_PRESETS
    from dpr_scale_tpu.optim import make_optimizer
    from dpr_scale_tpu.train import DenseRetrieverTask
    from dpr_scale_tpu.train.schedule import linear_warmup_decay

    import dataclasses

    cfg = ARCH_PRESETS[args.arch]()
    over = {}
    if args.remat:
        over["remat"] = True
    if args.fused_attention:
        over["fused_attention"] = True
    if args.fused_ffn:
        over["fused_ffn"] = True
    if args.dropout is not None:
        over["hidden_dropout"] = args.dropout
        over["attention_dropout"] = args.dropout
    if over:
        cfg = dataclasses.replace(cfg, **over)
    task = DenseRetrieverTask(
        cfg=cfg,
        optimizer=make_optimizer(
            "adamw", linear_warmup_decay(2e-5, 100, 10000), grad_clip_norm=2.0
        ),
        grad_cache_chunks=args.grad_cache,
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
    state = task.init_state(jax.random.PRNGKey(0), batch)
    step = task.make_train_step()
    sb = task.shard(batch)

    state, m = step(state, sb)  # compile
    float(m["train_loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, m = step(state, sb)
    float(m["train_loss"])
    dt = time.perf_counter() - t0
    # matmul-flops model: fwd ~2*P_block*tokens (+attention), train ~3x fwd
    h, L, ffn = cfg.hidden_size, cfg.num_layers, cfg.intermediate_size
    per_tok = L * (4 * h * h + 2 * h * ffn) * 2
    tokens = B * args.qlen + B * C * args.clen
    attn = L * 2 * 2 * h * (B * args.qlen**2 + B * C * args.clen**2)
    step_tflop = 3 * (per_tok * tokens + attn) / 1e12
    print(
        json.dumps(
            {
                "metric": f"train_qps_{args.arch}_b{B}_c{C}_q{args.qlen}_c{args.clen}"
                + ("_remat" if args.remat else "")
                + ("_fa" if args.fused_attention else "")
                + ("_ffn" if args.fused_ffn else "")
                + (f"_gc{args.grad_cache}" if args.grad_cache > 1 else ""),
                "value": round(args.steps * B / dt, 1),
                "unit": "queries/s",
                "steps_per_s": round(args.steps / dt, 2),
                "model_tflops_per_s": round(step_tflop * args.steps / dt, 1),
                "loss": round(float(m["train_loss"]), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
