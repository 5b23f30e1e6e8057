"""FFN kernel tile sweep in ONE process (one TPU tunnel claim).

    python tools/bench_ffn_tiles.py [--configs 512x512,1024x512,...]

Times the fused grad path (scan-chained, device-only) for several
(TN, TF) tile configs sequentially, reusing the same process so the
tunnel is claimed once. DPR_FFN_TN/TF are read by ops/ffn._tiles at
trace time; each config gets a fresh jit closure.
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="bert_base")
    p.add_argument("--tokens", type=int, default=36864)
    p.add_argument("--rate", type=float, default=0.1)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument(
        "--configs",
        default="512x512,512x768,1024x768,512x1536,1024x1536,2048x1536",
    )
    args = p.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from tools.bench_ffn import ARCH

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
    grad_flops = 3 * 2 * 2 * N * H * F

    from dpr_scale_tpu.ops.ffn import fused_ffn

    results = {}
    for cfgs in args.configs.split(","):
        tn, tf = cfgs.split("x")
        if F % int(tf):
            results[cfgs] = "skip (TF !| F)"
            continue
        os.environ["DPR_FFN_TN"] = tn
        os.environ["DPR_FFN_TF"] = tf

        def iter_fn(params, x, key):
            bits = jax.random.bits(key, (), "uint32")
            seed = jax.lax.bitcast_convert_type(bits, jnp.int32)[None]

            def loss(x, params):
                y = fused_ffn(x, *params, seed, args.rate)
                return jnp.sum(y.astype(jnp.float32) * g)

            dx, dparams = jax.grad(loss, argnums=(0, 1))(x, params)
            wsum = sum(jnp.sum(d).astype(jnp.float32) for d in dparams)
            return x + (0.001 * dx.astype(jnp.float32) + 1e-20 * wsum).astype(
                x.dtype
            )

        @jax.jit
        def many(params, x, key, _iter=iter_fn):
            def body(carry, _):
                return _iter(params, carry, key), ()

            x, _ = jax.lax.scan(body, x, None, length=args.steps)
            return x[0, 0].astype(jnp.float32)

        try:
            t_c0 = time.perf_counter()
            out = float(many(params, x0, key))
            compile_s = time.perf_counter() - t_c0
            t0 = time.perf_counter()
            out = float(many(params, x0, key))
            dt = time.perf_counter() - t0
            assert np.isfinite(out)
            results[cfgs] = round(grad_flops * args.steps / dt / 1e12, 1)
            print(
                f"[tiles] {cfgs}: {results[cfgs]} TF/s "
                f"(compile {compile_s:.0f}s)",
                file=sys.stderr, flush=True,
            )
        except Exception as e:  # noqa: BLE001
            results[cfgs] = f"FAIL {type(e).__name__}"
            print(f"[tiles] {cfgs}: {e}", file=sys.stderr, flush=True)

    print(
        json.dumps(
            {
                "metric": f"ffn_tile_sweep_{args.arch}_n{N}_r{args.rate}",
                "unit": "model TF/s (3x fwd matmul flops)",
                **results,
            }
        )
    )


if __name__ == "__main__":
    main()
