"""Fused multi-head attention Pallas kernel with in-kernel dropout.

TPU-first replacement for the einsum attention chain in
:class:`dpr_scale_tpu.models.transformer.SelfAttention` (itself the
re-expression of the reference's HF encoder attention,
dpr_scale/models/hf_model.py:12-41). Motivation, measured on v5e
(docs/STATUS.md): dropout dominated the train step — attention dropout
alone was ~25% of step time because XLA materializes the fp32
``(B, nh, L, L)`` logits, probs, AND a same-shaped dropout mask in HBM.
This kernel keeps the whole per-sequence attention in VMEM:

  * one grid step per (sequence, head-chunk); logits/softmax in fp32 on
    MXU/VPU, nothing bigger than ``(L, hd)`` ever reaches HBM;
  * dropout bits are drawn INSIDE the kernel with the TPU-native PRNG
    (``pltpu.prng_random_bits``) — no mask tensor exists anywhere;
  * the backward pass is a second Pallas kernel that regenerates the
    same bits (same per-(sequence, chunk) seeding, same call order) and
    recomputes softmax — rematerialization instead of residuals.

Semantics match the reference path: fp32 softmax of ``q@k.T/sqrt(hd) +
additive bias``, inverted-dropout scaling ``kept/(1-rate)``, bf16 probs
for the value matmul. Dropout REALIZATIONS differ from ``nn.Dropout``
(different generator), which is immaterial to training.

Shapes: q, k, v are ``(B, nh, L, hd)``; bias is ``(B, 1, L)`` additive
(0 keep / -1e9 drop); returns ``(B, nh, L, hd)`` in the input dtype.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for picking the per-grid-step (seq, head) chunk (bytes;
# ~16 MB physical per core, leave headroom for Mosaic's own buffers)
_VMEM_BUDGET = 12 * 1024 * 1024


def _chunks(B: int, nh: int, L: int, hd: int, itemsize: int):
    """(NB, hch): sequences and heads per grid step.

    The attention core at BERT shapes is LATENCY-bound, not FLOP-bound:
    per (seq, head) the matmuls are (L, hd) x (hd, L) with L<=256,
    hd=64 — a few microseconds of fixed per-grid-step cost dwarfs the
    ~2us of MXU work (measured via tools/bench_step_parts.py: the core
    ran at ~8 TF/s effective with one sequence per step). So pack as
    many (seq, head) pairs per step as VMEM allows: all heads first
    (keeps a block contiguous over whole sequences), then multiple
    sequences. At L=32 (query encode) this cuts grid steps ~8x.
    """
    # per (seq, head): ~4 live fp32 (L, L) intermediates in the bwd
    # kernel (s/p/dp/ds) + in/out (L, hd) blocks, double-buffered
    per_unit = 4 * L * L * 4 + L * hd * itemsize * 14
    if per_unit > _VMEM_BUDGET:
        # a single (seq, head) unit no longer fits: launching anyway
        # would fail deep inside Mosaic — fail at the op boundary with
        # the actual limit instead (BERT-family shapes are L<=512;
        # longer sequences need a flash-style L-tiled kernel)
        raise ValueError(
            f"fused_attention: one (seq, head) unit needs {per_unit} B of "
            f"VMEM (> {_VMEM_BUDGET} B budget) at L={L}, head_dim={hd}. "
            "Use the unfused attention path (cfg.fused_attention=False) "
            "for sequences this long."
        )
    hch = 1
    for h in range(nh, 0, -1):
        if nh % h == 0 and h * per_unit <= _VMEM_BUDGET:
            hch = h
            break
    NB = 1
    for n in range(B, 0, -1):
        if B % n == 0 and n * hch * per_unit <= _VMEM_BUDGET:
            NB = n
            break
    return NB, hch


def _softmax_probs(q, k, bias, scale):
    """(hch, Lq, hd) x (hch, Lk, hd) -> fp32 softmax probs (hch, Lq, Lk).

    ONE batched dot_general over the head chunk instead of a Python loop
    of per-head (L, hd) dots: the per-(seq, head) matmuls here are tiny
    (128x128x64 at bert-base) and per-op overhead dominated the kernel —
    the loop formulation measured ~8 TF/s effective on the attention
    core (tools/bench_step_parts.py) with the MXU idling between dots.
    """
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    s = s * scale + bias  # bias (1, 1, Lk) broadcasts over heads + rows
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _keep_mask(shape, rate):
    """Draw the per-entry keep mask from the in-kernel PRNG stream. Must
    be called in the same order in fwd and bwd so the streams line up."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thr = jnp.uint32(min(int(round(rate * 2**32)), 2**32 - 1))
    return bits >= thr


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *, rate, scale, nb):
    if rate > 0.0:
        step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        pltpu.prng_seed(seed_ref[0], step)
    for s in range(nb):  # same seq order as bwd: PRNG streams line up
        bias = bias_ref[s][None]  # (1, 1, Lk) fp32
        p = _softmax_probs(q_ref[s], k_ref[s], bias, scale)
        if rate > 0.0:
            keep = _keep_mask(p.shape, rate)
            p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
        o_ref[s] = jax.lax.dot_general(
            p.astype(q_ref.dtype), v_ref[s], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _bwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, bias_ref, g_ref, dq_ref, dk_ref, dv_ref,
    *, rate, scale, nb,
):
    if rate > 0.0:
        step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        pltpu.prng_seed(seed_ref[0], step)
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    # batched over the head chunk, looped over the seq chunk — the keep
    # mask is drawn per seq with the same (hch, Lq, Lk) shape and order
    # as fwd, so the PRNG streams line up
    for s in range(nb):
        bias = bias_ref[s][None]  # (1, 1, Lk)
        q, k, v, g = q_ref[s], k_ref[s], v_ref[s], g_ref[s]
        p = _softmax_probs(q, k, bias, scale)
        if rate > 0.0:
            keep = _keep_mask(p.shape, rate)
            pd = jnp.where(keep, p * inv_keep, 0.0)
        else:
            pd = p
        # dV = pd.T @ g per head, contracted over query rows
        dv_ref[s] = jax.lax.dot_general(
            pd.astype(q_ref.dtype), g, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        # d(pd) = g @ v.T; chain through the dropout scaling, then the
        # softmax vjp — with the FULL p (dropped entries still receive
        # the -p_j * <dp, p> term)
        dpd = jax.lax.dot_general(
            g, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        dp = jnp.where(keep, dpd * inv_keep, 0.0) if rate > 0.0 else dpd
        dsum = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - dsum)
        ds_lp = (ds * scale).astype(q_ref.dtype)
        dq_ref[s] = jax.lax.dot_general(
            ds_lp, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype)
        dk_ref[s] = jax.lax.dot_general(
            ds_lp, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ).astype(dk_ref.dtype)


def _specs(B, nh, L, hd, nb, hch):
    blk = pl.BlockSpec(
        (nb, hch, L, hd), lambda b, c, seed: (b, c, 0, 0), memory_space=pltpu.VMEM
    )
    bias_blk = pl.BlockSpec(
        (nb, 1, L), lambda b, c, seed: (b, 0, 0), memory_space=pltpu.VMEM
    )
    return blk, bias_blk


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_attention(q, k, v, bias, seed, rate: float = 0.0, interpret: bool = False):
    """Fused attention with in-kernel dropout; differentiable via a
    rematerializing Pallas backward kernel.

    q/k/v: (B, nh, L, hd); bias: (B, 1, L) additive fp32; seed: (1,) int32
    (ignored when rate == 0). ``rate``/``interpret`` are static.
    ``rate > 0`` requires a real TPU (the in-kernel PRNG has no
    interpret-mode lowering).

    NOT differentiable in ``bias``: the VJP returns a ZERO bias cotangent
    (the true gradient through the softmax is nonzero). Fine for the
    intended caller — an additive mask derived from non-trainable integer
    attention masks — but do NOT feed a learned bias (e.g. relative
    position biases) through this op; wrap it in ``lax.stop_gradient`` at
    the call site to make the intent explicit.
    """
    return _fused_attention_fwd_impl(q, k, v, bias, seed, rate, interpret)


def _fused_attention_fwd_impl(q, k, v, bias, seed, rate, interpret):
    B, nh, L, hd = q.shape
    nb, hch = _chunks(B, nh, L, hd, q.dtype.itemsize)
    blk, bias_blk = _specs(B, nh, L, hd, nb, hch)
    kern = functools.partial(
        _fwd_kernel, rate=rate, scale=1.0 / math.sqrt(hd), nb=nb
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // nb, nh // hch),
        in_specs=[blk, blk, blk, bias_blk],
        out_specs=blk,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(seed, q, k, v, bias)


def _fused_attention_fwd(q, k, v, bias, seed, rate, interpret):
    out = _fused_attention_fwd_impl(q, k, v, bias, seed, rate, interpret)
    return out, (q, k, v, bias, seed)


def _fused_attention_bwd(rate, interpret, res, g):
    q, k, v, bias, seed = res
    B, nh, L, hd = q.shape
    nb, hch = _chunks(B, nh, L, hd, q.dtype.itemsize)
    blk, bias_blk = _specs(B, nh, L, hd, nb, hch)
    kern = functools.partial(
        _bwd_kernel, rate=rate, scale=1.0 / math.sqrt(hd), nb=nb
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // nb, nh // hch),
        in_specs=[blk, blk, blk, bias_blk, blk],
        out_specs=(blk, blk, blk),
    )
    dq, dk, dv = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        interpret=interpret,
    )(seed, q, k, v, bias, g.astype(q.dtype))
    import numpy as np

    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, jnp.zeros_like(bias), dseed


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)
