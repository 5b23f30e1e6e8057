"""Pallas TPU kernels for the exact-MIPS hot path.

These fuse the corpus-streaming matmul with its reduction so the
``B x chunk`` score tile never round-trips HBM between ops:

  * :func:`count_above_kernel` — the exactness-verification pass of
    :class:`dpr_scale_tpu.index.mips.MipsIndex` (count scores above a
    per-query threshold): matmul (MXU) + compare + accumulate (VPU), one
    pass over the corpus, scores live only in VMEM;
  * :func:`tile_max_scores` — per-corpus-tile max score per query (the
    building block of blocked max-pruning exact MIPS, cf.
    "To Index or Not to Index" — see PAPERS.md): matmul + row-max.

Both operate on one device's corpus rows; the MipsIndex wraps them in
``shard_map`` for the mesh dimension. Pallas's grid pipeline
double-buffers the HBM->VMEM corpus tile DMA against the MXU
automatically (grid iterations are sequential per core).

Status: measured on a v5e chip with amortized in-jit timing, the 2D-grid
count kernel reaches 127.7 TFLOP/s vs 123 TFLOP/s for the XLA ``lax.scan``
formulation — both matmul-bound and effectively equal. The scan path stays
MipsIndex's default (one less moving part); these kernels are the
maintained Pallas alternates and the basis for a future fully-fused top-k.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_ROWS = 4096  # corpus rows per grid step (bf16 tile: 4096 x D)
TILE_B = 256  # query rows per grid step (scores tile: 256 x 4096 fp32)


def _count_kernel(q_ref, thr_ref, c_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # scores: (TILE_B, TILE_ROWS) fp32 on the MXU, never leaves VMEM
    scores = jnp.dot(q_ref[:], c_ref[:].T, preferred_element_type=jnp.float32)
    above = (scores > thr_ref[:]).astype(jnp.int32)  # thr: (TILE_B, 1) broadcast
    out_ref[:] += jnp.sum(above, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret", "vma"))
def count_above_kernel(
    queries: jax.Array,  # (B, D) any float dtype, B % TILE_B == 0 or B < TILE_B
    corpus: jax.Array,  # (N, D) bf16/fp32, N % TILE_ROWS == 0
    thresholds: jax.Array,  # (B,) fp32
    interpret: bool = False,
    vma=None,  # mesh axes the output varies over when called inside shard_map
) -> jax.Array:  # (B,) int32
    B, D = queries.shape
    N = corpus.shape[0]
    assert N % TILE_ROWS == 0, f"corpus rows {N} must be a multiple of {TILE_ROWS}"
    tile_b = min(TILE_B, B)
    assert B % tile_b == 0, f"batch {B} must be a multiple of {tile_b}"
    out_shape = (
        jax.ShapeDtypeStruct((B, 1), jnp.int32, vma=frozenset(vma))
        if vma
        else jax.ShapeDtypeStruct((B, 1), jnp.int32)
    )
    # grid order: corpus tiles (j) innermost so the output block stays
    # resident while corpus tiles stream through VMEM (double-buffered)
    out = pl.pallas_call(
        _count_kernel,
        grid=(B // tile_b, N // TILE_ROWS),
        in_specs=[
            pl.BlockSpec((tile_b, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (TILE_ROWS, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=out_shape,
        interpret=interpret,
    )(queries.astype(corpus.dtype), thresholds[:, None].astype(jnp.float32), corpus)
    return out[:, 0]


GROUP_ROWS = 256  # rescue granularity of the fused pipeline
GROUP_TILE_ROWS = 2048  # corpus rows per grid step of the groups kernel
# (fits VMEM: 2x3MB corpus double-buffer + 2MB scores + 2MB compare)


def _count_groups_kernel(qt_ref, thr_ref, c_ref, out_ref):
    # transposed scores: (TILE_ROWS, tile_b) fp32 on the MXU — row-major
    # leading-dim reshape makes the per-512-row-group reduction free, and
    # the (groups, tile_b) output block is lane-aligned
    scores = jnp.dot(c_ref[:], qt_ref[:], preferred_element_type=jnp.float32)
    above = (scores > thr_ref[:]).astype(jnp.int32)
    g = GROUP_TILE_ROWS // GROUP_ROWS
    out_ref[:] = jnp.sum(above.reshape(g, GROUP_ROWS, above.shape[1]), axis=1)


@functools.partial(jax.jit, static_argnames=("interpret", "vma"))
def count_above_groups_kernel(
    queries: jax.Array,  # (B, D), B % TILE_B == 0 or B < TILE_B
    corpus: jax.Array,  # (N, D) bf16/fp32, N % GROUP_TILE_ROWS == 0
    thresholds: jax.Array,  # (B,) fp32
    interpret: bool = False,
    vma=None,  # mesh axes the output varies over when called inside shard_map
) -> jax.Array:  # (B, N // GROUP_ROWS) int32 counts of scores > threshold
    """Per-query, per-GROUP_ROWS(=256)-row-group exact count of scores above a threshold.

    The verification + rescue pass of the fused exact-MIPS pipeline
    (:meth:`dpr_scale_tpu.index.mips.MipsIndex`, method="fused"): one
    matmul-bound sweep over the corpus whose only output is a tiny
    (B, N/GROUP_ROWS) count matrix — group-level discrepancies against the
    approx candidates point the rescue gather at exactly the corpus
    groups holding missed elements. Replaces the reference's second
    FAISS semantics guarantee (exact IndexFlatIP, run_retrieval.py:48-57)
    without a second score materialization.
    """
    B, D = queries.shape
    N = corpus.shape[0]
    assert N % GROUP_TILE_ROWS == 0, f"corpus rows {N} must be a multiple of {GROUP_TILE_ROWS}"
    tile_b = min(TILE_B, B)
    assert B % tile_b == 0, f"batch {B} must be a multiple of {tile_b}"
    g = GROUP_TILE_ROWS // GROUP_ROWS
    n_groups = N // GROUP_ROWS
    out_shape = (
        jax.ShapeDtypeStruct((n_groups, B), jnp.int32, vma=frozenset(vma))
        if vma
        else jax.ShapeDtypeStruct((n_groups, B), jnp.int32)
    )
    out = pl.pallas_call(
        _count_groups_kernel,
        grid=(B // tile_b, N // GROUP_TILE_ROWS),
        in_specs=[
            pl.BlockSpec((D, tile_b), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (GROUP_TILE_ROWS, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (g, tile_b), lambda i, j: (j, i), memory_space=pltpu.VMEM
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(
        queries.astype(corpus.dtype).T,
        thresholds[None, :].astype(jnp.float32),
        corpus,
    )
    return out.T


GMAX_ROWS = 8  # corpus rows per tier-1 max group (selection granularity)
GMAX_TIER2 = 16  # tier-1 groups per tier-2 group (128 rows)
GMAX_TILE_ROWS = 2048  # corpus rows per grid step


def _groupmax_kernel(qt_ref, c_ref, t1_ref, t2_ref):
    # transposed scores (TILE_ROWS, tile_b) fp32 on the MXU; the row-major
    # leading-dim reshape makes the per-8-row group max a cheap sublane
    # reduction and keeps both outputs lane-aligned (groups, tile_b)
    scores = jnp.dot(c_ref[:], qt_ref[:], preferred_element_type=jnp.float32)
    g1 = GMAX_TILE_ROWS // GMAX_ROWS
    t1 = jnp.max(scores.reshape(g1, GMAX_ROWS, scores.shape[1]), axis=1)
    t1_ref[:] = t1
    g2 = g1 // GMAX_TIER2
    t2_ref[:] = jnp.max(t1.reshape(g2, GMAX_TIER2, t1.shape[1]), axis=1)


@functools.partial(jax.jit, static_argnames=("interpret", "vma"))
def groupmax_kernel(
    queries: jax.Array,  # (B, D), B % TILE_B == 0 or B < TILE_B
    corpus: jax.Array,  # (N, D) bf16/fp32, N % GMAX_TILE_ROWS == 0
    interpret: bool = False,
    vma=None,  # mesh axes the outputs vary over when called inside shard_map
):
    """One matmul-bound sweep -> hierarchical per-group max scores.

    Returns ``(t1, t2)`` where ``t1`` is (N // 8, B) fp32 per-8-row-group
    maxima and ``t2`` is (N // 128, B) maxima over 16 consecutive tier-1
    groups. This is the single-pass half of the ``method="groupmax"``
    exact-MIPS pipeline (:class:`dpr_scale_tpu.index.mips.MipsIndex`):
    because each group max IS some element's score, the true top-k
    elements live inside the top-k groups ordered by max — so exact
    FAISS-IndexFlatIP top-k (reference run_retrieval.py:48-57,97) follows
    from one sweep plus a tiny gather+rescore of the selected groups,
    with no second corpus pass and no score materialization.
    """
    B, D = queries.shape
    N = corpus.shape[0]
    assert N % GMAX_TILE_ROWS == 0, (
        f"corpus rows {N} must be a multiple of {GMAX_TILE_ROWS}"
    )
    tile_b = min(TILE_B, B)
    assert B % tile_b == 0, f"batch {B} must be a multiple of {tile_b}"
    g1 = GMAX_TILE_ROWS // GMAX_ROWS
    g2 = g1 // GMAX_TIER2
    n1, n2 = N // GMAX_ROWS, N // (GMAX_ROWS * GMAX_TIER2)
    mk = lambda n: (
        jax.ShapeDtypeStruct((n, B), jnp.float32, vma=frozenset(vma))
        if vma
        else jax.ShapeDtypeStruct((n, B), jnp.float32)
    )
    t1, t2 = pl.pallas_call(
        _groupmax_kernel,
        grid=(B // tile_b, N // GMAX_TILE_ROWS),
        in_specs=[
            pl.BlockSpec((D, tile_b), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (GMAX_TILE_ROWS, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((g1, tile_b), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((g2, tile_b), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(mk(n1), mk(n2)),
        interpret=interpret,
    )(queries.astype(corpus.dtype).T, corpus)
    return t1, t2


def _tile_max_kernel(q_ref, c_ref, out_ref):
    scores = jnp.dot(q_ref[:], c_ref[:].T, preferred_element_type=jnp.float32)
    out_ref[:] = jnp.max(scores, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def tile_max_scores(
    queries: jax.Array,  # (B, D)
    corpus: jax.Array,  # (N, D), N % TILE_ROWS == 0
    interpret: bool = False,
) -> jax.Array:  # (B, N // TILE_ROWS) per-tile max
    B, D = queries.shape
    N = corpus.shape[0]
    assert N % TILE_ROWS == 0
    n_tiles = N // TILE_ROWS
    out = pl.pallas_call(
        _tile_max_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_ROWS, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, 1), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles), jnp.float32),
        interpret=interpret,
    )(queries.astype(corpus.dtype), corpus)
    return out
