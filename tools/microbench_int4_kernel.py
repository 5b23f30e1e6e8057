"""Feasibility microbench for a fused int4 unpack+matmul Pallas kernel.

The int4 capacity sweep (MipsIndex._int4_search_impl) scans 1M-row
chunks: XLA unpacks each packed (ch, D/2) int8 chunk to (ch, D) int8 in
HBM, then dots it — per chunk that is 0.4 GB packed read + 0.8 GB unpack
write + 0.8 GB unpack read, a 5x traffic premium over the packed bytes
(the dot's approx_max_k consumer fuses, so scores never materialize).
At 21M rows the sweep measures 172 ms (2,975 QPS, docs/REHEARSAL notes).

A Pallas kernel that unpacks nibbles in VMEM and feeds the MXU directly
eliminates the 1.6 GB/chunk round-trip — IF Mosaic lowers an int8 x int8
-> int32 dot onto the MXU at its double rate. This tool measures exactly
that question, in three steps:

  1. mosaic int8 dot rate: (2048, 768) x (768, 256) int8 dot in a
     pallas_call grid over a 4M-row block, vs the same dot via XLA.
  2. in-kernel unpack correctness: nibble unpack (arithmetic >>4 for the
     high nibble, (x & 0xF ^ 8) - 8 for the low) vs the host unpack.
  3. the candidate kernel end to end: packed sweep -> per-8-row group
     max+argmax, compared for value/row agreement vs the XLA reference
     and timed.

Timing is device-resident (scan-chained, one scalar fetched) — the axon
tunnel's 32 ms dispatch would otherwise dominate.

Usage: python tools/microbench_int4_kernel.py [--rows 4194304]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

DIM = 768
B = 256


def log(msg, _t=[time.perf_counter()]):
    now = time.perf_counter()
    print(f"[i4k +{now - _t[0]:.1f}s] {msg}", file=sys.stderr, flush=True)
    _t[0] = now


def timed_loop(fn, *args, iters=8):
    """Scan-chain fn over iters on device; returns seconds/iter."""
    jitted = jax.jit(
        lambda a: jax.lax.scan(
            lambda c, _: (jax.tree.map(lambda x: x, c), fn(*a)[0, 0]),
            a,
            None,
            length=iters,
        )[1].sum()
    )
    jitted(args).block_until_ready()  # compile
    t0 = time.perf_counter()
    float(jitted(args))
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=4_194_304)
    args = p.parse_args()
    rows = args.rows

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    out = {"rows": rows}

    # device-synthesized packed block + scales + int8 queries
    @jax.jit
    def synth(key):
        kq, kc, ks = jax.random.split(key, 3)
        q8 = jax.random.randint(kq, (B, DIM), -127, 128, jnp.int8)
        packed = jax.random.randint(kc, (rows, DIM // 2), -128, 128, jnp.int8)
        sc = jax.random.uniform(ks, (rows,), jnp.float32, 0.5, 1.5)
        return q8, packed, sc

    q8, packed, sc = jax.block_until_ready(synth(jax.random.PRNGKey(0)))
    log("inputs synthesized")

    TN = 2048

    # ---- 1) plain int8 dot rate: pallas vs XLA (no unpack) -------------
    x8_full = jax.jit(
        lambda p: jnp.concatenate(
            [((p.astype(jnp.int32) & 0xF) ^ 8) - 8, p.astype(jnp.int32) >> 4],
            axis=1,
        ).astype(jnp.int8)
    )(packed)
    jax.block_until_ready(x8_full)

    def _dot_kernel(qt_ref, c_ref, o_ref):
        s = jnp.dot(c_ref[:], qt_ref[:], preferred_element_type=jnp.int32)
        o_ref[:] = jnp.max(s, axis=0, keepdims=True)

    def pallas_dot(qt, x8):
        return pl.pallas_call(
            _dot_kernel,
            grid=(rows // TN,),
            in_specs=[
                pl.BlockSpec((DIM, B), lambda j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TN, DIM), lambda j: (j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, B), lambda j: (j, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows // TN, B), jnp.int32),
        )(qt, x8)

    qt = jnp.asarray(np.asarray(q8).T)
    flops = 2.0 * B * rows * DIM
    try:
        s = timed_loop(pallas_dot, qt, x8_full)
        out["pallas_int8_dot_tops"] = round(flops / s / 1e12, 1)
        log(f"pallas int8 dot: {out['pallas_int8_dot_tops']} TOPS")
    except Exception as e:  # noqa: BLE001
        out["pallas_int8_dot_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        log(f"pallas int8 dot FAILED: {out['pallas_int8_dot_error']}")

    def xla_dot(q8, x8):
        s = jax.lax.dot_general(
            x8, q8, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
        return jnp.max(s.reshape(rows // TN, TN, B), axis=1)

    s = timed_loop(xla_dot, q8, x8_full)
    out["xla_int8_dot_tops"] = round(flops / s / 1e12, 1)
    log(f"xla int8 dot: {out['xla_int8_dot_tops']} TOPS")

    # ---- 2+3) fused unpack + dot + per-8-row group max/argmax ----------
    G = 8

    def _i4_kernel(qt_ref, p_ref, sc_ref, qsc_ref, val_ref, row_ref):
        j = pl.program_id(0)
        p = p_ref[:].astype(jnp.int32)
        lo = ((p & 0xF) ^ 8) - 8
        hi = p >> 4
        x8 = jnp.concatenate([lo, hi], axis=1).astype(jnp.int8)  # (TN, D)
        s32 = jnp.dot(x8, qt_ref[:], preferred_element_type=jnp.int32)
        sf = s32.astype(jnp.float32) * sc_ref[:] * qsc_ref[:]  # (TN, B)
        t = sf.reshape(TN // G, G, B)
        val_ref[:] = jnp.max(t, axis=1)
        arg = jnp.argmax(t, axis=1).astype(jnp.int32)  # (TN//G, B)
        base = j * TN + jax.lax.broadcasted_iota(jnp.int32, (TN // G, B), 0) * G
        row_ref[:] = base + arg

    def i4_groupmax(qt, packed, sc, qsc):
        return pl.pallas_call(
            _i4_kernel,
            grid=(rows // TN,),
            in_specs=[
                pl.BlockSpec((DIM, B), lambda j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TN, DIM // 2), lambda j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TN, 1), lambda j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B), lambda j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((TN // G, B), lambda j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TN // G, B), lambda j: (j, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((rows // G, B), jnp.float32),
                jax.ShapeDtypeStruct((rows // G, B), jnp.int32),
            ),
        )(qt, packed, sc, qsc)

    qsc = jnp.ones((1, B), jnp.float32)
    sc2 = sc[:, None]
    try:
        v, r = jax.block_until_ready(
            jax.jit(i4_groupmax)(qt, packed, sc2, qsc)
        )
        # correctness vs XLA reference on the first 64k rows
        nref = 65_536
        sf_ref = (
            jnp.dot(
                x8_full[:nref].astype(jnp.float32), qt.astype(jnp.float32)
            )
            * sc2[:nref]
        )
        t = sf_ref.reshape(nref // G, G, B)
        v_ref = np.asarray(jnp.max(t, axis=1))
        r_ref = np.asarray(
            jnp.argmax(t, axis=1).astype(jnp.int32)
            + jax.lax.broadcasted_iota(jnp.int32, (nref // G, B), 0) * G
        )
        v_np = np.asarray(v[: nref // G])
        r_np = np.asarray(r[: nref // G])
        verr = float(np.abs(v_np - v_ref).max() / np.abs(v_ref).max())
        rbad = int((r_np != r_ref).sum())
        # fp32 vs int32*scale associativity can tie-swap argmax within a
        # group on equal scores — only value disagreement is a failure
        out["i4_kernel_val_rel_err"] = round(verr, 7)
        out["i4_kernel_row_mismatches"] = rbad
        assert verr < 1e-5, verr

        def timed_fn(qt, packed, sc2, qsc):
            v, _ = i4_groupmax(qt, packed, sc2, qsc)
            return v

        s = timed_loop(timed_fn, qt, packed, sc2, qsc)
        out["i4_kernel_ms"] = round(s * 1e3, 2)
        out["i4_kernel_tops"] = round(flops / s / 1e12, 1)
        log(f"i4 fused kernel: {out['i4_kernel_ms']} ms = {out['i4_kernel_tops']} TOPS")
    except Exception as e:  # noqa: BLE001
        out["i4_kernel_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        log(f"i4 fused kernel FAILED: {out['i4_kernel_error']}")

    # ---- current XLA path (unpack + dot + approx_max_k) for reference --
    def xla_current(q8, packed, sc, qsc):
        p32 = packed.astype(jnp.int32)
        x8 = jnp.concatenate(
            [((p32 & 0xF) ^ 8) - 8, p32 >> 4], axis=1
        ).astype(jnp.int8)
        s32 = jnp.dot(q8, x8.T, preferred_element_type=jnp.int32)
        sf = s32.astype(jnp.float32) * sc[None, :] * qsc[:, None]
        return jax.lax.approx_max_k(sf, 512)[0]

    s = timed_loop(xla_current, q8, packed, sc, jnp.ones((B,), jnp.float32))
    out["xla_unpack_dot_approx_ms"] = round(s * 1e3, 2)
    out["xla_unpack_dot_approx_tops"] = round(flops / s / 1e12, 1)
    log(
        f"xla unpack+dot+approx: {out['xla_unpack_dot_approx_ms']} ms = "
        f"{out['xla_unpack_dot_approx_tops']} TOPS"
    )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
