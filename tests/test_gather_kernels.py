"""Interpret-mode parity for the CITADEL posting gather-score kernels.

On TPU, DeviceExpertIndex._score_bucket dispatches to one of two Pallas
kernels (serial per-entry-DMA — the default — or the double-buffered MXU
kernel, env DPR_GATHER_KERNEL=pipelined); on CPU the product path falls
back to an XLA gather+einsum, so WITHOUT this test neither kernel is
executed by the suite.  Runs both under Pallas interpret mode against
the einsum reference (the same reference the on-chip A/B is bit-exact
against; reference parity anchor citadel_retrieval_task.py:56-65).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from dpr_scale_tpu.index.inverted_device import DeviceExpertIndex


def _run_interpreted(fn, *args):
    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        return fn(*args)
    finally:
        pl.pallas_call = orig


CASES = [
    # (n_experts, L, D, E, dtype) — L=posting slots per expert block
    (6, 512, 256, 4, jnp.float32),
    (6, 256, 768, 3, jnp.float32),   # D=768 production dim, odd E
    (9, 1024, 128, 9, jnp.bfloat16),  # serving dtype, E with 2 sig bits fails pow2 G
]


@pytest.mark.parametrize("kernel", ["_scores_pallas_serial", "_scores_pallas"])
@pytest.mark.parametrize("n_exp,L,D,E,dtype", CASES)
def test_gather_kernel_matches_einsum(kernel, n_exp, L, D, E, dtype):
    rng = np.random.default_rng(hash((kernel, n_exp, L, D, E)) % 2**32)
    vecs = jnp.asarray(rng.standard_normal((n_exp, L, D)), dtype)
    slots = jnp.asarray(rng.permutation(n_exp)[:E], jnp.int32)
    q = jnp.asarray(rng.standard_normal((E, D)), jnp.float32)

    pv = vecs[slots]
    ref = jnp.einsum(
        "ed,eld->el", q.astype(pv.dtype), pv, preferred_element_type=jnp.float32
    )
    out = _run_interpreted(getattr(DeviceExpertIndex, kernel), vecs, slots, q)

    assert out.shape == (E, L) and out.dtype == jnp.float32
    tol = 5e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=tol, rtol=tol)


def test_kernels_agree_with_each_other():
    rng = np.random.default_rng(7)
    vecs = jnp.asarray(rng.standard_normal((8, 512, 256)), jnp.float32)
    slots = jnp.asarray([5, 0, 2, 7, 1, 3], jnp.int32)
    q = jnp.asarray(rng.standard_normal((6, 256)), jnp.float32)
    a = _run_interpreted(DeviceExpertIndex._scores_pallas_serial, vecs, slots, q)
    b = _run_interpreted(DeviceExpertIndex._scores_pallas, vecs, slots, q)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5)
