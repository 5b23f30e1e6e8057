"""Isolate the CITADEL bucket-scoring kernels: streamed vs DMA-gather.

    python tools/microbench_stream_scorer.py [--bucket 512] [--nexp 8000]

Times, device-only, ONE bucket at the synthetic MS MARCO layout of
tools/bench_citadel_device.py: the stream-and-pick kernel
(`_scores_streamed`, sequential posting-group sweep driven by a scalar
-prefetched step table) against the per-entry DMA kernel
(`_scores_pallas`) and the plain XLA gather+einsum, reporting ms and
effective GB/s over the bytes each approach must move.
"""
from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bucket", type=int, default=512)
    p.add_argument("--nexp", type=int, default=8000)
    p.add_argument("--entries", type=int, default=2753)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--iters", type=int, default=16)
    args = p.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from dpr_scale_tpu.index.inverted_device import (
        DeviceExpertIndex, STREAM_M, _stream_cfg, _stream_steps,
    )

    L, n_exp, D, E = args.bucket, args.nexp, args.dim, args.entries
    vecs = jax.random.normal(
        jax.random.PRNGKey(0), (n_exp, L, D), jnp.bfloat16
    )
    rng = np.random.default_rng(1)
    slots_r = np.sort(rng.integers(0, n_exp, size=E)).astype(np.int32)
    n_pad = max(STREAM_M, 1 << (E - 1).bit_length())
    slots = np.full((n_pad,), n_exp, np.int32)
    slots[:E] = slots_r
    qvecs = np.zeros((n_pad, D), np.float32)
    qvecs[:E] = rng.normal(size=(E, D)).astype(np.float32)
    G, TL = _stream_cfg(n_exp, L, D, 2)
    steps = _stream_steps(slots, E, n_pad, G)
    # distinct consecutive v-block fetches (Pallas skips unchanged index)
    pgs = steps[:, 0]
    distinct = int(1 + (pgs[1:] != pgs[:-1]).sum()) * (L // TL)
    gb_stream = distinct * G * TL * D * 2 / 1e9
    gb_gather = E * L * D * 2 / 1e9
    print(
        f"bucket L={L} n_exp={n_exp} E={E} G={G} TL={TL} "
        f"steps={steps.shape[0]} distinct_blocks={distinct} "
        f"stream_bytes={gb_stream:.2f}GB gather_bytes={gb_gather:.2f}GB"
    )

    steps_d = jnp.asarray(steps)
    slots_d = jnp.asarray(slots)
    qvecs_d = jnp.asarray(qvecs)

    stream = jax.jit(
        lambda v, q, s, st: DeviceExpertIndex._scores_streamed(v, q, s, st)
    )
    dma = jax.jit(
        lambda v, s, q: DeviceExpertIndex._scores_pallas(v, s, q)
    )

    def xla(v, s, q):
        pv = v[s]
        return jnp.einsum(
            "ed,eld->el", q.astype(pv.dtype), pv,
            preferred_element_type=jnp.float32,
        )

    xla_j = jax.jit(xla)

    def timed(fn, *a):
        out = fn(*a)
        float(jnp.sum(out[: E or 1, :1]))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        float(jnp.sum(out[: E or 1, :1]))
        return (time.perf_counter() - t0) / args.iters * 1e3

    # DMA/XLA paths pad with slot 0 (in-bounds; the manual DMA does not
    # clamp) — matches what search() feeds them
    slots0 = slots.copy()
    slots0[E:] = 0
    slots0_d = jnp.asarray(slots0)

    ms_s = timed(stream, vecs, qvecs_d, slots_d, steps_d)
    print(f"streamed {ms_s:8.2f} ms  {gb_stream / ms_s * 1e3:7.1f} GB/s")
    ms_d = timed(dma, vecs, slots0_d, qvecs_d)
    print(f"dma      {ms_d:8.2f} ms  {gb_gather / ms_d * 1e3:7.1f} GB/s")
    ms_x = timed(xla_j, vecs, slots0_d, qvecs_d)
    print(f"xla      {ms_x:8.2f} ms  {gb_gather / ms_x * 1e3:7.1f} GB/s")
    # numerics: streamed == dma on the real entries
    a = np.asarray(stream(vecs, qvecs_d, slots_d, steps_d))[:E]
    b = np.asarray(dma(vecs, slots0_d, qvecs_d))[:E]
    err = np.abs(a - b).max()
    print(f"max |stream - dma| over real entries: {err:.3e}")


if __name__ == "__main__":
    main()
