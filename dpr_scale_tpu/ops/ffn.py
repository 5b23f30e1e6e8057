"""Fused transformer FFN Pallas kernels (matmul + GELU + matmul + dropout).

TPU-first replacement for the einsum FFN block in
:class:`dpr_scale_tpu.models.transformer.TransformerLayer` (itself the
re-expression of the reference's HF encoder MLP,
dpr_scale/models/hf_model.py:12-41). The FFN pair is ~2/3 of a BERT train
step's matmul FLOPs, and docs/STATUS.md attributes the measured ~47% MFU
plateau to backward-matmul efficiency plus the pointwise chains around
them — exactly what these kernels take over from XLA:

  * **forward** — one kernel, grid ``(N tiles, F tiles)``: per step,
    ``pre = x @ w1 + b1`` (fp32 MXU accumulation), exact GELU in fp32 on
    the VPU, second matmul accumulated across F tiles in an fp32 VMEM
    scratch, bias + inverted dropout applied in-register at the last F
    tile with the TPU-native PRNG — the (N, F) intermediate is written
    once in bf16 as the bwd residual, and no dropout mask tensor exists;
  * **backward** — plain XLA. Measured on v5e (tools/bench_ffn.py,
    scan-chained device-only): the Pallas forward beats XLA 96.5 vs
    76.5 TF/s, but XLA runs the backward matmuls at ~148 TF/s vs 125
    for a hand-split Pallas dgrad/wgrad (tried and removed — git
    history) — so the VJP delegates to XLA dots, recovering the dropout
    mask from the saved output's zero pattern (inverted dropout zeroes
    exactly the dropped entries) instead of re-running the PRNG;
  * residuals are ``x``, the bf16 ``pre``, and ``y`` — close to the
    footprint the XLA path saves, so memory behavior is unchanged.

Semantics match the einsum path: bf16 matmul inputs with fp32
accumulation, exact (erf) GELU, dropout AFTER the second bias add with
inverted scaling. Dropout realizations differ from ``nn.Dropout``
(different generator), immaterial to training. NOT differentiable in
``seed`` (float0) — and like all dropout, fwd/bwd must see the same seed.

Shapes: x ``(N, H)``; w1 ``(H, F)``; b1 ``(F,)``; w2 ``(F, H)``;
b2 ``(H,)``; seed ``(1,)`` int32. N is padded internally to the row-tile
multiple; H and F must be multiples of 128 (bert/roberta families all
are). Weight gradients are returned in fp32.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_INV_SQRT2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _erf(x):
    """erf via Abramowitz-Stegun 7.1.26 (max abs error 1.5e-7 — far below
    bf16 resolution). Pallas TPU has no lowering for lax.erf, so the
    kernel carries its own; exp IS lowered."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu(pre):
    """Exact GELU in fp32 (matches nn.gelu(approximate=False))."""
    return pre * 0.5 * (1.0 + _erf(pre * _INV_SQRT2))


def _dgelu(pre):
    """d/dx of exact GELU: Phi(x) + x * phi(x)."""
    phi = jnp.exp(pre * pre * -0.5) * _INV_SQRT2PI
    return 0.5 * (1.0 + _erf(pre * _INV_SQRT2)) + pre * phi


def _keep_mask(shape, rate):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thr = jnp.uint32(min(int(round(rate * 2**32)), 2**32 - 1))
    return bits >= thr


def _tiles(N: int, H: int, F: int, itemsize: int):
    """(TN, TF): row/F-tile sizes fitting the fwd+bwd VMEM working sets."""
    import os

    env_tn, env_tf = os.environ.get("DPR_FFN_TN"), os.environ.get("DPR_FFN_TF")
    if env_tn or env_tf:  # benchmark experimentation only
        return int(env_tn or 512), int(env_tf or F)
    TN = 512 if N >= 512 else max(8, -(-N // 8) * 8)
    if F < 128:  # test-scale configs (interpret mode only)
        return TN, F
    # F tile: largest 128-multiple divisor of F such that the wgrad
    # working set (the fattest: x, pre, dpre, dz blocks + fp32 dw1/dw2/db1
    # accumulators, double-buffered inputs) stays under ~10 MB
    budget = 10 * 1024 * 1024
    best = 128
    for tf in range(F, 127, -128):
        if F % tf:
            continue
        inputs = 2 * (TN * H + 2 * TN * tf + TN * H) * itemsize  # dbl-buffered
        accs = 4 * (H * tf + tf * H + tf)  # fp32 resident outputs
        if inputs + accs <= budget:
            best = tf
            break
    return TN, best


# ------------------------------------------------------------------ #
# forward


def _fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                y_ref, pre_ref, acc_ref, *, rate, nF):
    j = pl.program_id(1)
    pre = jnp.dot(
        x_ref[:], w1_ref[:], preferred_element_type=jnp.float32
    ) + b1_ref[:].astype(jnp.float32)
    pre_ref[:] = pre.astype(pre_ref.dtype)
    h = _gelu(pre).astype(x_ref.dtype)
    part = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = part

    @pl.when(j > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(j == nF - 1)
    def _():
        y = acc_ref[:] + b2_ref[:].astype(jnp.float32)
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0], pl.program_id(0))
            keep = _keep_mask(y.shape, rate)
            y = jnp.where(keep, y * (1.0 / (1.0 - rate)), 0.0)
        y_ref[:] = y.astype(y_ref.dtype)


def _fwd_impl(x, w1, b1, w2, b2, seed, rate, interpret):
    N, H = x.shape
    F = w1.shape[1]
    TN, TF = _tiles(N, H, F, x.dtype.itemsize)
    Np = -(-N // TN) * TN
    if Np != N:
        x = jnp.pad(x, ((0, Np - N), (0, 0)))
    nN, nF = Np // TN, F // TF
    w1c = w1.astype(x.dtype)
    w2c = w2.astype(x.dtype)
    b1r = b1.reshape(1, F).astype(x.dtype)
    b2r = b2.reshape(1, H).astype(x.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nN, nF),
        in_specs=[
            pl.BlockSpec((TN, H), lambda i, j, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, TF), lambda i, j, s: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TF), lambda i, j, s: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TF, H), lambda i, j, s: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i, j, s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TN, H), lambda i, j, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, TF), lambda i, j, s: (i, j), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((TN, H), jnp.float32)],
    )
    y, pre = pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate, nF=nF),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((Np, H), x.dtype),
            jax.ShapeDtypeStruct((Np, F), x.dtype),
        ),
        interpret=interpret,
    )(seed, x, w1c, b1r, w2c, b2r)
    return y[:N], pre, Np


# ------------------------------------------------------------------ #
# custom VJP


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_ffn(x, w1, b1, w2, b2, seed, rate: float = 0.0,
              interpret: bool = False):
    """``dropout(gelu(x @ w1 + b1) @ w2 + b2)`` as fused Pallas kernels.

    x: (N, H); w1: (H, F); b1: (F,); w2: (F, H); b2: (H,); seed: (1,)
    int32 (ignored when rate == 0). ``rate``/``interpret`` are static.
    ``rate > 0`` requires a real TPU (the in-kernel PRNG has no
    interpret-mode lowering). Weight/bias gradients come back in fp32;
    dx in x.dtype. NOT differentiable in ``seed`` (float0 cotangent).
    """
    y, _pre, _Np = _fwd_impl(x, w1, b1, w2, b2, seed, rate, interpret)
    return y


def _ffn_core_bwd(x_in, w1, w2, pre, dz):
    """Shared FFN backward core (used by both fused_ffn VJPs): given the
    post-dropout output cotangent ``dz`` (compute dtype), return
    (dx, dw1, dw2, db1) — all fp32 accumulations. ``db2 = sum(dz)`` and
    the dropout-mask recovery stay in the callers (their dz dtypes
    differ)."""
    w1c = w1.astype(x_in.dtype)
    w2c = w2.astype(x_in.dtype)
    pre_f = pre.astype(jnp.float32)
    # dh = dz @ w2^T ; dpre = dh * gelu'(pre)
    dh = jax.lax.dot_general(
        dz, w2c, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dpre = (dh * _dgelu(pre_f)).astype(x_in.dtype)
    dx = jax.lax.dot_general(
        dpre, w1c, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dw1 = jax.lax.dot_general(
        x_in, dpre, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    h = _gelu(pre_f).astype(x_in.dtype)
    dw2 = jax.lax.dot_general(
        h, dz, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db1 = jnp.sum(dpre.astype(jnp.float32), axis=0)
    return dx, dw1, dw2, db1


def _fused_ffn_fwd(x, w1, b1, w2, b2, seed, rate, interpret):
    y, pre, Np = _fwd_impl(x, w1, b1, w2, b2, seed, rate, interpret)
    return y, (x, w1, w2, pre, y, seed, Np)


def _fused_ffn_bwd(rate, interpret, res, g):
    """Backward in PLAIN XLA (measured on v5e: XLA runs the FFN backward
    matmuls at ~148 TF/s vs 125 for the Pallas dgrad/wgrad split, while
    the Pallas FORWARD beats XLA 96.5 vs 76.5 — so fuse the forward,
    delegate the backward). The dropout mask is recovered from the saved
    output's zero pattern (inverted dropout zeroes exactly the dropped
    entries; a genuine pre-dropout zero has measure zero in fp), so the
    in-kernel PRNG never needs a CPU/XLA twin."""
    x, w1, w2, pre, y, seed, Np = res
    N = x.shape[0]
    pre = pre[:N]
    if rate > 0.0:
        dz = jnp.where(y != 0, g * (1.0 / (1.0 - rate)), 0).astype(x.dtype)
    else:
        dz = g.astype(x.dtype)
    dx, dw1, dw2, db1 = _ffn_core_bwd(x, w1, w2, pre, dz)
    dx = dx.astype(x.dtype)
    db2 = jnp.sum(dz.astype(jnp.float32), axis=0)
    import numpy as np

    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return (
        dx,
        dw1.astype(w1.dtype),
        db1.astype(w1.dtype),
        dw2.astype(w2.dtype),
        db2.astype(w2.dtype),
        dseed,
    )


fused_ffn.defvjp(_fused_ffn_fwd, _fused_ffn_bwd)


# ------------------------------------------------------------------ #
# LN-fused variant: LN1(residual) -> FFN + dropout -> LN2, one kernel
#
# Post-LN BERT glue (attention_ln / output_ln + the two residual adds)
# measured 18.6 ms of a 166 ms 12-layer fwd+bwd stack at B=256 c=128
# (tools/bench_step_parts.py, docs/STATUS.md round 3): each LN is an
# extra HBM read+write of the (N, H) activations. Folding both LNs and
# both residual adds into the FFN kernel means r is read once, x1/out
# are written once, and the LN math rides the VPU while the MXU runs
# the matmuls. The backward stays plain XLA (same measured reasoning as
# fused_ffn: XLA's backward dots run ~148 TF/s) — LN backwards are
# elementwise chains XLA fuses into the dots' epilogues.


def _ln_f32(v, g, b, eps):
    """LayerNorm over the last axis in fp32 (stats + affine).

    Variance via E[v^2] - E[v]^2, matching flax nn.LayerNorm's default
    ``use_fast_variance`` — keeps fused-vs-einsum encoder outputs at
    rounding-level agreement (the two-pass form differs by ~1e-6, which
    two stacked layers amplify into grad mismatches)."""
    mu = jnp.mean(v, axis=-1, keepdims=True)
    var = jnp.mean(v * v, axis=-1, keepdims=True) - mu * mu
    return (v - mu) * jax.lax.rsqrt(var + eps) * g + b


def _fwd_ln_kernel(seed_ref, r_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   g1_ref, be1_ref, g2_ref, be2_ref,
                   out_ref, x1_ref, pre_ref, z_ref, acc_ref, x1s_ref,
                   *, rate, nF, eps):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        x1 = _ln_f32(
            r_ref[:].astype(jnp.float32),
            g1_ref[:].astype(jnp.float32),
            be1_ref[:].astype(jnp.float32),
            eps,
        )
        # bf16 x1 is BOTH the matmul input and the saved residual — the
        # backward recomputes s = x1 + z from the saved copies, so the
        # forward must build s from the same rounded values
        x1s_ref[:] = x1.astype(x1s_ref.dtype)
        x1_ref[:] = x1.astype(x1_ref.dtype)

    pre = jnp.dot(
        x1s_ref[:], w1_ref[:], preferred_element_type=jnp.float32
    ) + b1_ref[:].astype(jnp.float32)
    pre_ref[:] = pre.astype(pre_ref.dtype)
    h = _gelu(pre).astype(x1s_ref.dtype)
    part = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = part

    @pl.when(j > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(j == nF - 1)
    def _():
        y = acc_ref[:] + b2_ref[:].astype(jnp.float32)
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0], pl.program_id(0))
            keep = _keep_mask(y.shape, rate)
            y = jnp.where(keep, y * (1.0 / (1.0 - rate)), 0.0)
        z = y.astype(z_ref.dtype)
        z_ref[:] = z
        s = x1s_ref[:].astype(jnp.float32) + z.astype(jnp.float32)
        out = _ln_f32(
            s,
            g2_ref[:].astype(jnp.float32),
            be2_ref[:].astype(jnp.float32),
            eps,
        )
        out_ref[:] = out.astype(out_ref.dtype)


def _fwd_ln_impl(r, w1, b1, w2, b2, g1, be1, g2, be2, seed, rate, eps,
                 interpret):
    N, H = r.shape
    F = w1.shape[1]
    TN, TF = _tiles(N, H, F, r.dtype.itemsize)
    Np = -(-N // TN) * TN
    if Np != N:
        r = jnp.pad(r, ((0, Np - N), (0, 0)))
    nN, nF = Np // TN, F // TF
    w1c = w1.astype(r.dtype)
    w2c = w2.astype(r.dtype)
    row = lambda v, n: v.reshape(1, n).astype(jnp.float32)  # noqa: E731
    vec_spec = lambda jmap: pl.BlockSpec(  # noqa: E731
        (1, H), jmap, memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nN, nF),
        in_specs=[
            pl.BlockSpec((TN, H), lambda i, j, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, TF), lambda i, j, s: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TF), lambda i, j, s: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TF, H), lambda i, j, s: (j, 0), memory_space=pltpu.VMEM),
            vec_spec(lambda i, j, s: (0, 0)),
            vec_spec(lambda i, j, s: (0, 0)),
            vec_spec(lambda i, j, s: (0, 0)),
            vec_spec(lambda i, j, s: (0, 0)),
            vec_spec(lambda i, j, s: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((TN, H), lambda i, j, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, H), lambda i, j, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, TF), lambda i, j, s: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, H), lambda i, j, s: (i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((TN, H), jnp.float32),
            pltpu.VMEM((TN, H), r.dtype),
        ],
    )
    out, x1, pre, z = pl.pallas_call(
        functools.partial(_fwd_ln_kernel, rate=rate, nF=nF, eps=eps),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((Np, H), r.dtype),
            jax.ShapeDtypeStruct((Np, H), r.dtype),
            jax.ShapeDtypeStruct((Np, F), r.dtype),
            jax.ShapeDtypeStruct((Np, H), r.dtype),
        ),
        interpret=interpret,
    )(
        seed, r, w1c, b1.reshape(1, F).astype(r.dtype),
        w2c, b2.reshape(1, H).astype(r.dtype),
        row(g1, H), row(be1, H), row(g2, H), row(be2, H),
    )
    return out[:N], x1, pre, z


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def fused_ffn_ln(r, w1, b1, w2, b2, g1, be1, g2, be2, seed,
                 rate: float = 0.0, eps: float = 1e-12,
                 interpret: bool = False):
    """``LN2(x1 + dropout(gelu(x1 @ w1 + b1) @ w2 + b2))`` with
    ``x1 = LN1(r)`` — the whole post-LN transformer FFN half-layer
    (attention_ln + FFN + output_ln + both residual adds) as one Pallas
    kernel.

    r: (N, H) residual sum entering attention_ln (x + attention output
    after dropout); g1/be1, g2/be2: LN scale/bias pairs (H,) fp32.
    Other arguments/constraints as :func:`fused_ffn`. ``eps`` is static.
    """
    out, _x1, _pre, _z = _fwd_ln_impl(
        r, w1, b1, w2, b2, g1, be1, g2, be2, seed, rate, eps, interpret
    )
    return out


def _fused_ffn_ln_fwd(r, w1, b1, w2, b2, g1, be1, g2, be2, seed,
                      rate, eps, interpret):
    out, x1, pre, z = _fwd_ln_impl(
        r, w1, b1, w2, b2, g1, be1, g2, be2, seed, rate, eps, interpret
    )
    return out, (r, w1, w2, g1, g2, x1, pre, z, seed)


def _ln_bwd_f32(v, g, dout, eps):
    """VJP of ``_ln_f32`` w.r.t. (v, scale, bias): returns (dv, dg, db).
    All fp32; one fused elementwise+reduce chain for XLA. Stats use the
    same fast-variance form as the forward."""
    mu = jnp.mean(v, axis=-1, keepdims=True)
    c = v - mu
    var = jnp.mean(v * v, axis=-1, keepdims=True) - mu * mu
    inv = jax.lax.rsqrt(var + eps)
    n = c * inv
    dg = jnp.sum(dout * n, axis=0)
    db = jnp.sum(dout, axis=0)
    dn = dout * g
    dv = inv * (
        dn
        - jnp.mean(dn, axis=-1, keepdims=True)
        - n * jnp.mean(dn * n, axis=-1, keepdims=True)
    )
    return dv, dg, db


def _fused_ffn_ln_bwd(rate, eps, interpret, res, g):
    """XLA backward through LN2 -> dropout -> FFN -> (+residual) -> LN1.
    Dropout mask recovered from z's zero pattern (see _fused_ffn_bwd)."""
    r, w1, w2, g1, g2, x1, pre, z, seed = res
    N = r.shape[0]
    x1 = x1[:N]
    pre = pre[:N]
    z = z[:N]
    x1f = x1.astype(jnp.float32)
    s = x1f + z.astype(jnp.float32)
    ds, dg2, dbe2 = _ln_bwd_f32(
        s, g2.astype(jnp.float32), g.astype(jnp.float32), eps
    )
    if rate > 0.0:
        dz = jnp.where(z != 0, ds * (1.0 / (1.0 - rate)), 0.0)
    else:
        dz = ds
    dzc = dz.astype(x1.dtype)
    dx1_ffn, dw1, dw2, db1 = _ffn_core_bwd(x1, w1, w2, pre, dzc)
    db2 = jnp.sum(dz, axis=0)  # fp32 dz (pre-cast), unlike _fused_ffn_bwd
    dx1 = ds + dx1_ffn  # LN2 residual branch + FFN branch
    dr, dg1, dbe1 = _ln_bwd_f32(
        r.astype(jnp.float32), g1.astype(jnp.float32), dx1, eps
    )
    import numpy as np

    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return (
        dr.astype(r.dtype),
        dw1.astype(w1.dtype),
        db1.astype(w1.dtype),
        dw2.astype(w2.dtype),
        db2.astype(w2.dtype),
        dg1.astype(g1.dtype),
        dbe1.astype(g1.dtype),
        dg2.astype(g2.dtype),
        dbe2.astype(g2.dtype),
        dseed,
    )


fused_ffn_ln.defvjp(_fused_ffn_ln_fwd, _fused_ffn_ln_bwd)
