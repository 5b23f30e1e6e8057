"""Benchmark harness: exact top-100 MIPS over an HBM-resident corpus.

Prints ONE JSON line. The reference publishes no speed numbers
(BASELINE.md); the north-star is exact top-100 over 21M passages at
>10k QPS on a v5e-8. This harness measures per-chip row-throughput on
whatever chips are present and normalizes:

  vs_baseline = (QPS * corpus_rows / n_chips) / (10_000 * 21M / 8)

i.e. 1.0 == on-track for the 8-chip north-star at equal per-chip work.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os

CORPUS_ROWS = int(_os.environ.get("BENCH_ROWS", 2_097_152))
DIM = 768
QUERY_BATCH = 512
ITERS = int(_os.environ.get("BENCH_ITERS", 32))
K = 100
NORTH_STAR_ROWSCORES_PER_CHIP = 10_000 * 21_000_000 / 8


def _probe_device(timeout_s: int = 300) -> None:
    """Fail FAST when the accelerator is unreachable. jax.devices() on a
    dead tunnel hangs indefinitely inside the backend — probing in a
    bounded subprocess turns an indefinite hang into a clear error the
    harness/driver can see."""
    import subprocess
    import sys

    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            check=True, timeout=timeout_s, capture_output=True,
        )
    except subprocess.TimeoutExpired:
        print(
            f"[bench] device backend unreachable after {timeout_s}s "
            "(tunnel down?) — aborting instead of hanging",
            file=sys.stderr,
        )
        raise SystemExit(2)
    except subprocess.CalledProcessError as e:
        print(
            f"[bench] device probe failed: {e.stderr.decode()[-500:]}",
            file=sys.stderr,
        )
        raise SystemExit(2)


def main():
    import sys

    _probe_device()
    # persistent compilation cache: repeat bench runs skip the ~1-2 min
    # XLA compiles (safe no-op where unsupported)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from dpr_scale_tpu.index import MipsIndex
    from dpr_scale_tpu.parallel import get_mesh

    def note(msg, _t=[time.perf_counter()]):
        now = time.perf_counter()
        print(f"[bench +{now - _t[0]:.1f}s] {msg}", file=sys.stderr, flush=True)
        _t[0] = now

    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = get_mesh()
    n_chips = mesh.devices.size
    rng = np.random.default_rng(0)
    queries = rng.standard_normal((ITERS, QUERY_BATCH, DIM), dtype=np.float32)
    note("queries generated")

    import functools
    import os

    method = os.environ.get("BENCH_MIPS_METHOD", "fused")
    row_sharded = NamedSharding(mesh, P("data", None))
    index = MipsIndex(mesh, dtype=jnp.bfloat16, method=method)
    if method in ("int8", "int4") and CORPUS_ROWS > 4_194_304:
        # int8/int4 capacity mode: the intermediate bf16 corpus would not
        # fit HBM, so synthesize + quantize chunk-by-chunk into a donated
        # quantized buffer (peak = quantized corpus + one bf16 chunk).
        # int4 packs two 4-bit values per byte (column-block layout) —
        # the whole 21M north-star corpus fits one v5e at 8.05 GB.
        CH = 1_048_576
        assert CORPUS_ROWS % CH == 0
        int4 = method == "int4"
        qmax = 7.0 if int4 else 127.0
        width = DIM // 2 if int4 else DIM
        q8 = jax.jit(
            lambda: jnp.zeros((CORPUS_ROWS, width), jnp.int8),
            out_shardings=row_sharded,
        )()
        sc = jax.jit(
            lambda: jnp.ones((CORPUS_ROWS,), jnp.float32),
            out_shardings=NamedSharding(mesh, P("data")),
        )()

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def fill(q8, sc, key, lo):
            e = jax.random.normal(key, (CH, DIM), jnp.bfloat16)
            s = jnp.max(jnp.abs(e.astype(jnp.float32)), axis=1) / qmax
            s = jnp.where(s == 0.0, 1.0, s)
            q = jnp.clip(
                jnp.rint(e.astype(jnp.float32) / s[:, None]), -qmax, qmax
            ).astype(jnp.int8)
            if int4:
                half = DIM // 2
                q = jnp.bitwise_or(
                    jnp.left_shift(q[:, half:], 4),
                    jnp.bitwise_and(q[:, :half], 0xF),
                )
            q8 = jax.lax.dynamic_update_slice(q8, q, (lo, 0))
            sc = jax.lax.dynamic_update_slice(sc, s, (lo,))
            return q8, sc

        for ci, lo in enumerate(range(0, CORPUS_ROWS, CH)):
            q8, sc = fill(
                q8, sc, jax.random.PRNGKey(ci), jnp.int32(lo)
            )
        jax.block_until_ready(q8)
        note(f"{method} corpus synthesized on device (chunked)")
        if int4:
            index.add_device_packed4(q8, sc)
        else:
            index.add_device_quantized(q8, sc)
    else:
        # synthesize the corpus directly on-device, row-sharded (a real
        # corpus arrives via encode shards; for the bench the 6GB
        # host->device upload through the axon tunnel would cost ~1min)
        corpus_dev = jax.jit(
            lambda key: jax.random.normal(key, (CORPUS_ROWS, DIM), jnp.bfloat16),
            out_shardings=row_sharded,
        )(jax.random.PRNGKey(0))
        jax.block_until_ready(corpus_dev)
        note("corpus synthesized on device")
        index.add_device(corpus_dev)
    note("index built")

    # on-device timing of the verified-exact pipeline (the axon tunnel's
    # ~32ms roundtrip + slow download would otherwise dominate)
    result = index.benchmark(queries, k=K)
    note(f"benchmark done: {result}")

    qps = result["qps"]
    row_scores_per_chip = qps * CORPUS_ROWS / n_chips
    print(
        json.dumps(
            {
                "metric": f"exact_top{K}_qps_{CORPUS_ROWS//1_000_000}M_d{DIM}"
                + ("" if result["all_exact"] else "_UNVERIFIED"),
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(
                    row_scores_per_chip / NORTH_STAR_ROWSCORES_PER_CHIP, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
