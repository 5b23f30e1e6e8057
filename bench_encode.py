"""Corpus-encoding throughput harness (passages/sec) — the second
first-class perf metric from BASELINE.md. Not run by the driver (which
runs bench.py); invoke manually:

    python bench_encode.py [--arch bert_base] [--batch 256] [--seq 256]

Measures the steady-state jitted encode step on synthetic token batches
(device-resident, so tokenization/host IO is excluded — see the input
pipeline's own prefetch tests for host-side throughput).
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
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--seq", type=int, default=256)
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument(
        "--fused-attention", action="store_true",
        help="Pallas fused attention (softmax stays in VMEM)",
    )
    args = parser.parse_args()

    from dpr_scale_tpu.cli.common import ARCH_PRESETS
    from dpr_scale_tpu.models import DenseEncoder

    cfg = ARCH_PRESETS[args.arch]()
    if args.fused_attention:
        import dataclasses

        cfg = dataclasses.replace(cfg, fused_attention=True)
    model = DenseEncoder(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(
        rng.integers(1, cfg.vocab_size, (args.iters, args.batch, args.seq)), jnp.int32
    )
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.PRNGKey(0), ids[0], mask[0])

    @jax.jit
    def run(params, ids, mask):
        def body(c, x):
            i, m = x
            emb = model.apply(params, i, m)
            return c + emb.sum(), None

        c, _ = jax.lax.scan(body, jnp.float32(0), (ids, mask))
        return c

    float(run(params, ids, mask))  # compile
    t0 = time.perf_counter()
    float(run(params, ids, mask))
    dt = time.perf_counter() - t0
    psgs_per_s = args.iters * args.batch / dt
    # encoder FLOPs ~ 2 * params * tokens (dense transformer approximation)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    flops = 2 * n_params * args.iters * args.batch * args.seq / dt
    print(
        json.dumps(
            {
                "metric": f"encode_psgs_per_s_{args.arch}_L{args.seq}"
                + ("_fa" if args.fused_attention else ""),
                "value": round(psgs_per_s, 1),
                "unit": "passages/s",
                "tflops": round(flops / 1e12, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
