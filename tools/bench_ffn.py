"""Isolated FFN-block fwd+bwd throughput on the attached TPU.

    python tools/bench_ffn.py [--arch bert_base] [--tokens 36864] [--rate 0.1]
                              [--paths xla,fused,xla_fwd,fused_fwd]

Times a single transformer FFN block (Dense -> gelu -> Dense -> dropout)
for the XLA einsum path and the fused Pallas kernels (ops/ffn.py), at the
token count of a production train step (bert_base B=128 c=128 step =
128*32 + 256*128 = 36,864 tokens).

All iterations run inside ONE jitted lax.scan with a data dependence
(x_{t+1} = x_t + eps * dx_t), so the tunnel's per-dispatch overhead
(~16-32 ms/call) is paid once — the measurement is device-only.

Reports model TF/s (grad paths: 3 * 2*2*N*H*F per iter; fwd paths:
2*2*N*H*F), directly comparable to bench_train.py's MFU accounting.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

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
    x0 = jnp.asarray(rng.normal(size=(N, H)) * 0.5, jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(H, F)) * 0.02, jnp.float32)
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(F, H)) * 0.02, jnp.float32)
    b2 = jnp.zeros((H,), jnp.float32)
    g = jnp.asarray(rng.normal(size=(N, H)) * 0.5, jnp.float32)
    params = (w1, b1, w2, b2)
    key = jax.random.PRNGKey(0)

    def xla_ffn(x, w1, b1, w2, b2, key):
        h = jnp.dot(x, w1.astype(jnp.bfloat16)) + b1.astype(jnp.bfloat16)
        h = jax.nn.gelu(h, approximate=False)
        y = jnp.dot(h, w2.astype(jnp.bfloat16)) + b2.astype(jnp.bfloat16)
        if args.rate > 0.0:
            keep = jax.random.bernoulli(key, 1.0 - args.rate, y.shape)
            y = jnp.where(keep, y / (1.0 - args.rate), 0.0).astype(y.dtype)
        return y

    def fused(x, w1, b1, w2, b2, key):
        from dpr_scale_tpu.ops.ffn import fused_ffn

        bits = jax.random.bits(key, (), "uint32")
        seed = jax.lax.bitcast_convert_type(bits, jnp.int32)[None]
        return fused_ffn(x, w1, b1, w2, b2, seed, args.rate)

    results = {}

    def run(name, iter_fn, flops_per_iter):
        @jax.jit
        def many(params, x, key):
            def body(carry, _):
                return iter_fn(params, carry, key), ()

            x, _ = jax.lax.scan(body, x, None, length=args.steps)
            return x[0, 0].astype(jnp.float32)

        float(many(params, x0, key))  # compile
        t0 = time.perf_counter()
        out = float(many(params, x0, key))
        dt = time.perf_counter() - t0
        assert np.isfinite(out), (name, out)
        results[name] = round(flops_per_iter * args.steps / dt / 1e12, 1)

    grad_flops = 3 * 2 * 2 * N * H * F
    fwd_flops = 2 * 2 * N * H * F
    paths = args.paths.split(",")

    def make_grad_iter(ffn_fn):
        def it(params, x, key):
            def loss(x, params):
                return jnp.sum(ffn_fn(x, *params, key).astype(jnp.float32) * g)

            dx, dparams = jax.grad(loss, argnums=(0, 1))(x, params)
            # fold the weight grads into the carry so wgrad is not DCE'd
            wsum = sum(jnp.sum(d).astype(jnp.float32) for d in dparams)
            return x + (0.001 * dx.astype(jnp.float32) + 1e-20 * wsum).astype(
                x.dtype
            )

        return it

    def make_fwd_iter(ffn_fn):
        def it(params, x, key):
            y = ffn_fn(x, *params, key)
            return (0.1 * y.astype(jnp.float32)).astype(x.dtype)

        return it

    if "xla" in paths:
        run("xla", make_grad_iter(xla_ffn), grad_flops)
    if "fused" in paths:
        run("fused", make_grad_iter(fused), grad_flops)
    if "xla_fwd" in paths:
        run("xla_fwd", make_fwd_iter(xla_ffn), fwd_flops)
    if "fused_fwd" in paths:
        run("fused_fwd", make_fwd_iter(fused), fwd_flops)

    print(
        json.dumps(
            {
                "metric": f"ffn_tflops_{args.arch}_n{N}_r{args.rate}",
                "unit": "model TF/s (grad: 3x fwd matmul flops)",
                **results,
            }
        )
    )


if __name__ == "__main__":
    main()
