"""On-TPU validation of the fused-attention dropout path.

The in-kernel PRNG (pltpu.prng_random_bits) has no CPU/interpret
lowering, so the dropout behavior of
:func:`dpr_scale_tpu.ops.attention.fused_attention` is validated here on
the real chip:

  1. drop fraction matches the configured rate;
  2. kept entries carry the 1/(1-rate) inverted-dropout scaling
     (E[dropped output] == deterministic output);
  3. forward/backward mask consistency: with a fixed seed the op is a
     deterministic function, so its VJP must match a finite-difference
     directional derivative (the bwd kernel regenerates the exact same
     bits);
  4. different seeds / grid positions decorrelate.

Run: python tools/validate_fused_attention.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from dpr_scale_tpu.ops.attention import fused_attention


def main():
    rate = 0.25
    B, nh, L, hd = 8, 4, 128, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, nh, L, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, nh, L, hd)), jnp.float32)
    # v = identity-ish probe: one-hot columns make the output reveal the
    # dropped-prob rows directly (o = p_dropped @ v)
    v = jnp.asarray(rng.normal(size=(B, nh, L, hd)), jnp.float32)
    bias = jnp.zeros((B, 1, L), jnp.float32)
    s0 = jnp.asarray([17], jnp.int32)

    o_det = fused_attention(q, k, v, bias, s0, 0.0)
    o_drop = jax.jit(lambda *a: fused_attention(*a, rate))(q, k, v, bias, s0)
    o_drop2 = jax.jit(lambda *a: fused_attention(*a, rate))(q, k, v, bias, s0)
    assert np.array_equal(np.asarray(o_drop), np.asarray(o_drop2)), "same seed must be deterministic"
    o_seed2 = jax.jit(lambda *a: fused_attention(*a, rate))(q, k, v, bias, jnp.asarray([18], jnp.int32))
    assert not np.array_equal(np.asarray(o_drop), np.asarray(o_seed2)), "seeds must decorrelate"

    # (1)+(2): estimate via many seeds: mean over seeds -> deterministic out
    outs = []
    for s in range(64):
        outs.append(np.asarray(jax.jit(
            lambda *a: fused_attention(*a, rate))(q, k, v, bias, jnp.asarray([s], jnp.int32))))
    mean = np.mean(outs, axis=0)
    det = np.asarray(o_det)
    err = np.abs(mean - det).mean() / np.abs(det).mean()
    # the per-entry residual is pure sampling noise; the SCALING is what a
    # bug would break (a missing 1/(1-rate) shows up as slope = 1-rate)
    slope = float((mean * det).sum() / (det * det).sum())
    print(f"E[dropout output] vs deterministic: rel err {err:.4f}, slope {slope:.4f}")
    assert abs(slope - 1.0) < 0.01, slope
    assert err < 0.15, err

    # drop fraction: probe with v = e_j basis trick is overkill; instead
    # count zeros in d(output)/d(v) = p_dropped (via VJP wrt v with g=1)
    def f_v(vv):
        return jnp.sum(fused_attention(q, k, vv, bias, s0, rate))
    # dv = sum_q p_dropped[q, k_row]: zero rows in p_dropped show as
    # smaller magnitudes, not exact zeros; use the direct fraction test:
    # p_dropped == 0 where dropped -> o with v=onehot gives columns of p
    eye = jnp.broadcast_to(jnp.eye(L, hd, dtype=jnp.float32), (B, nh, L, hd))
    p_cols = np.asarray(jax.jit(lambda *a: fused_attention(*a, rate))(q, k, eye, bias, s0))
    frac_zero = float((p_cols[..., :hd] == 0.0).mean())
    print(f"dropped fraction (first {hd} prob columns): {frac_zero:.4f} vs rate {rate}")
    assert abs(frac_zero - rate) < 0.02, frac_zero

    # (3) fwd/bwd PRNG-stream + vjp correctness: extract the ACTUAL keep
    # mask with one-hot value probes (o = p_dropped @ v, so v = shifted
    # identity columns reveal p_dropped), then compare the fused op's
    # forward AND vjp against a pure-JAX attention that uses exactly that
    # mask. (A finite-difference check is NOT valid here: the kernel's
    # deterministic ~0.3% MXU noise swamps the epsilon signal.)
    import math

    cols = []
    for off in range(0, L, hd):
        probe = jnp.zeros((L, hd), jnp.float32).at[
            jnp.arange(hd) + off, jnp.arange(hd)
        ].set(1.0)
        probe = jnp.broadcast_to(probe, (B, nh, L, hd))
        cols.append(np.asarray(jax.jit(
            lambda pr: fused_attention(q, k, pr, bias, s0, rate))(probe)))
    pd = jnp.asarray(np.concatenate(cols, axis=-1))  # (B, nh, Lq, Lk) dropped probs
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd) + bias[:, None]
    p = jax.nn.softmax(s, axis=-1)
    keep = np.asarray(pd) > 0.0
    pd_ref = jnp.where(jnp.asarray(keep), p / (1.0 - rate), 0.0)
    rel = float(jnp.abs(pd - pd_ref).max())
    print(f"extracted dropped-probs vs reference-with-same-mask: max abs diff {rel:.5f}")
    assert rel < 3e-3, rel

    def ref_with_mask(q_, k_, v_):
        s_ = jnp.einsum("bhqd,bhkd->bhqk", q_, k_) / math.sqrt(hd) + bias[:, None]
        p_ = jax.nn.softmax(s_, axis=-1)
        p_ = jnp.where(jnp.asarray(keep), p_ / (1.0 - rate), 0.0)
        return jnp.einsum("bhqk,bhkd->bhqd", p_, v_)

    def fused_f(q_, k_, v_):
        return fused_attention(q_, k_, v_, bias, s0, rate)

    g = jnp.asarray(rng.normal(size=q.shape), jnp.float32)
    o0, vjp0 = jax.vjp(ref_with_mask, q, k, v)
    o1, vjp1 = jax.vjp(fused_f, q, k, v)
    print(f"dropout fwd vs masked reference: max diff {float(jnp.abs(o0 - o1).max()):.5f}")
    assert float(jnp.abs(o0 - o1).max()) < 5e-3
    for name, a, b in zip(("dq", "dk", "dv"), jax.jit(lambda: vjp0(g))(), jax.jit(lambda: vjp1(g))()):
        d = float(jnp.abs(a - b).max())
        m = float(jnp.abs(a).max())
        print(f"{name}: max abs diff {d:.5f} (ref magnitude {m:.3f})")
        assert d < 0.01 * max(m, 1.0), (name, d, m)
    print("fused-attention dropout path: ALL CHECKS PASSED")


if __name__ == "__main__":
    main()
