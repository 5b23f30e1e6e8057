"""Pallas MIPS kernels vs numpy reference (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from dpr_scale_tpu.ops import count_above_kernel, tile_max_scores
from dpr_scale_tpu.ops.mips_kernels import TILE_ROWS


def test_count_above_kernel_matches_numpy():
    rng = np.random.default_rng(0)
    B, D, N = 8, 128, 2 * TILE_ROWS
    q = rng.normal(size=(B, D)).astype(np.float32)
    c = rng.normal(size=(N, D)).astype(np.float32)
    scores = q @ c.T
    thr = np.quantile(scores, 0.99, axis=1).astype(np.float32)
    got = np.asarray(
        count_above_kernel(jnp.asarray(q), jnp.asarray(c), jnp.asarray(thr), interpret=True)
    )
    expected = (scores > thr[:, None]).sum(1)
    np.testing.assert_array_equal(got, expected)


def test_tile_max_scores_matches_numpy():
    rng = np.random.default_rng(1)
    B, D, N = 8, 128, 2 * TILE_ROWS
    q = rng.normal(size=(B, D)).astype(np.float32)
    c = rng.normal(size=(N, D)).astype(np.float32)
    got = np.asarray(tile_max_scores(jnp.asarray(q), jnp.asarray(c), interpret=True))
    scores = q @ c.T
    expected = scores.reshape(B, -1)  # (B, N)
    expected = np.stack(
        [expected[:, i * TILE_ROWS : (i + 1) * TILE_ROWS].max(1) for i in range(2)], 1
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_count_kernel_rejects_ragged_corpus():
    with pytest.raises(AssertionError):
        count_above_kernel(
            jnp.zeros((4, 128)), jnp.zeros((100, 128)), jnp.zeros((4,)), interpret=True
        )


def test_groupmax_kernel_matches_numpy():
    from dpr_scale_tpu.ops.mips_kernels import (
        GMAX_ROWS,
        GMAX_TIER2,
        GMAX_TILE_ROWS,
        groupmax_kernel,
    )

    rng = np.random.default_rng(2)
    B, D, N = 8, 128, 2 * GMAX_TILE_ROWS
    q = rng.normal(size=(B, D)).astype(np.float32)
    c = rng.normal(size=(N, D)).astype(np.float32)
    t1, t2 = groupmax_kernel(jnp.asarray(q), jnp.asarray(c), interpret=True)
    s = q @ c.T
    e1 = s.reshape(B, N // GMAX_ROWS, GMAX_ROWS).max(2).T
    e2 = e1.reshape(N // (GMAX_ROWS * GMAX_TIER2), GMAX_TIER2, B).max(1)
    np.testing.assert_allclose(np.asarray(t1), e1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t2), e2, rtol=1e-4, atol=1e-5)
