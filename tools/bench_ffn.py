"""Isolated FFN-block fwd+bwd throughput on the attached TPU.

    python tools/bench_ffn.py [--arch bert_base] [--tokens 36864] [--rate 0.1]

Times value_and_grad over a single transformer FFN block (Dense -> gelu ->
Dense -> dropout) for (a) the XLA einsum path and (b) the fused Pallas
kernel (ops/ffn.py), at the token count of a production train step
(bert_base B=128 c=128 step = 128*32 + 256*128 = 36,864 tokens).

Reports model TF/s for each (matmul-flops model: 3 * 2 * 2*N*H*F), so the
numbers are directly comparable to bench_train.py's MFU accounting.
Tunnel-safe: times N chained steps, fetches one scalar.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

ARCH = {
    "bert_base": (768, 3072),
    "bert_large": (1024, 4096),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="bert_base")
    p.add_argument("--tokens", type=int, default=36864)
    p.add_argument("--rate", type=float, default=0.1)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--paths", default="xla,fused")
    args = p.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    H, F = ARCH[args.arch]
    N = args.tokens
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, H)) * 0.5, jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(H, F)) * 0.02, jnp.float32)
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(F, H)) * 0.02, jnp.float32)
    b2 = jnp.zeros((H,), jnp.float32)
    g = jnp.asarray(rng.normal(size=(N, H)) * 0.5, jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    def xla_ffn(params, x, key):
        w1, b1, w2, b2 = params
        h = jnp.dot(x, w1.astype(jnp.bfloat16)) + b1.astype(jnp.bfloat16)
        h = jax.nn.gelu(h, approximate=False)
        y = jnp.dot(h, w2.astype(jnp.bfloat16)) + b2.astype(jnp.bfloat16)
        if args.rate > 0.0:
            keep = jax.random.bernoulli(key, 1.0 - args.rate, y.shape)
            y = jnp.where(keep, y / (1.0 - args.rate), 0.0).astype(y.dtype)
        return y

    results = {}
    flops = 3 * 2 * 2 * N * H * F  # fwd 2 matmuls + bwd ~2x
    paths = args.paths.split(",")

    def run(name, step_fn):
        params = (w1, b1, w2, b2)
        out = step_fn(params, x, key)  # compile
        jax.block_until_ready(out)
        float(out[0].reshape(-1)[0])
        t0 = time.perf_counter()
        o = None
        for _ in range(args.steps):
            o = step_fn(params, x, key)
        float(o[0].reshape(-1)[0])
        dt = time.perf_counter() - t0
        results[name] = round(flops * args.steps / dt / 1e12, 1)

    if "xla" in paths:
        @jax.jit
        def step_xla(params, x, key):
            def loss(params):
                return jnp.sum(xla_ffn(params, x, key) * g.astype(jnp.float32))
            l, grads = jax.value_and_grad(loss)(params)
            return grads[0], l

        run("xla", step_xla)

    if "fused" in paths:
        from dpr_scale_tpu.ops.ffn import fused_ffn

        @jax.jit
        def step_fused(params, x, key):
            w1, b1, w2, b2 = params
            bits = jax.random.bits(key, (), "uint32")
            seed = jax.lax.bitcast_convert_type(bits, jnp.int32)[None]

            def loss(params):
                w1, b1, w2, b2 = params
                y = fused_ffn(x, w1, b1, w2, b2, seed, args.rate)
                return jnp.sum(y * g.astype(jnp.float32))

            l, grads = jax.value_and_grad(loss)(params)
            return grads[0], l

        run("fused", step_fused)

    if "fused_fwd" in paths:  # fwd kernel alone (1/3 of the flops model)
        from dpr_scale_tpu.ops.ffn import fused_ffn

        @jax.jit
        def fwd_only(params, x, key):
            w1, b1, w2, b2 = params
            bits = jax.random.bits(key, (), "uint32")
            seed = jax.lax.bitcast_convert_type(bits, jnp.int32)[None]
            y = fused_ffn(x, w1, b1, w2, b2, seed, args.rate)
            return y, y[0, 0]

        run("fused_fwd", fwd_only)
        results["fused_fwd"] = round(results["fused_fwd"] / 3.0, 1)

    if "xla_fwd" in paths:
        @jax.jit
        def xfwd_only(params, x, key):
            y = xla_ffn(params, x, key)
            return y, y[0, 0]

        run("xla_fwd", xfwd_only)
        results["xla_fwd"] = round(results["xla_fwd"] / 3.0, 1)

    print(
        json.dumps(
            {
                "metric": f"ffn_tflops_{args.arch}_n{N}_r{args.rate}",
                "unit": "model TF/s (3x fwd-matmul flops)",
                **results,
            }
        )
    )


if __name__ == "__main__":
    main()
