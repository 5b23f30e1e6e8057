"""One-command on-TPU validation gate for the TPU-only code paths.

    python tools/validate_tpu.py [--out docs/VALIDATE_rNN.json] [--rows 1048576]

The CPU test suite cannot cover paths with no interpret-mode lowering or
whose behavior depends on real-MXU numerics; between rounds these could
regress silently. This gate runs them all on the attached chip and emits
ONE JSON verdict:

  * fused-attention dropout fwd+VJP vs a same-mask pure-JAX reference
    (wraps tools/validate_fused_attention.py — in-kernel PRNG path);
  * fused-FFN dropout: deterministic parity vs the einsum block, drop
    fraction, inverted-scaling slope (E[dropout out] == det out), and
    fwd/bwd PRNG-stream consistency via a same-mask reference VJP;
  * MIPS exactness: method="fused" (and groupmax) top-100 indices vs
    method="exact_sort" over a device-synthesized >=1M x 768 corpus;
  * int8 / approx serving recall@100 vs exact on the same corpus;
  * one tiny train step on the TPU vs the same step on CPU (subprocess):
    loss and grad-norm cross-check.

Checks append to a dict; any exception marks the check failed and the
gate exits nonzero. Per-round artifacts live in docs/ (verify skill).
"""
from __future__ import annotations

import argparse
import json
import math
import os
import pathlib
import subprocess
import sys
import time
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

RESULTS: dict = {}


def check(name):
    def deco(fn):
        def wrapped(*a, **kw):
            t0 = time.perf_counter()
            try:
                detail = fn(*a, **kw) or {}
                RESULTS[name] = {"ok": True, "secs": round(time.perf_counter() - t0, 1), **detail}
            except Exception as e:  # noqa: BLE001
                traceback.print_exc()
                RESULTS[name] = {
                    "ok": False,
                    "secs": round(time.perf_counter() - t0, 1),
                    "error": f"{type(e).__name__}: {e}",
                }
        return wrapped

    return deco


@check("fused_attention_dropout")
def check_attention():
    import tools.validate_fused_attention as vfa

    vfa.main()  # asserts internally


@check("fused_ffn_dropout")
def check_ffn():
    from dpr_scale_tpu.ops.ffn import fused_ffn

    rate = 0.25
    N, H, F = 2048, 256, 512
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, H)) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(H, F)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(F,)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(F, H)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(H,)) * 0.05, jnp.float32)
    g = jnp.asarray(rng.normal(size=(N, H)), jnp.float32)
    s0 = jnp.asarray([17], jnp.int32)

    def ref_det(x):
        h = jax.nn.gelu(jnp.dot(x, w1) + b1, approximate=False)
        return jnp.dot(h, w2) + b2

    y_det = np.asarray(jax.jit(lambda: fused_ffn(x, w1, b1, w2, b2, s0, 0.0))())
    y_ref = np.asarray(jax.jit(ref_det)(x))
    det_err = float(np.abs(y_det - y_ref).max() / np.abs(y_ref).max())
    assert det_err < 1e-3, f"deterministic parity {det_err}"

    drop = jax.jit(lambda s: fused_ffn(x, w1, b1, w2, b2, s, rate))
    y0 = np.asarray(drop(s0))
    assert np.array_equal(y0, np.asarray(drop(s0))), "same seed must be deterministic"
    assert not np.array_equal(y0, np.asarray(drop(jnp.asarray([18], jnp.int32)))), (
        "seeds must decorrelate"
    )
    frac = float((y0 == 0.0).mean())
    assert abs(frac - rate) < 0.02, f"drop fraction {frac} vs {rate}"

    outs = [np.asarray(drop(jnp.asarray([s], jnp.int32))) for s in range(64)]
    mean = np.mean(outs, axis=0)
    slope = float((mean * y_det).sum() / (y_det * y_det).sum())
    assert abs(slope - 1.0) < 0.01, f"inverted-dropout slope {slope}"

    # fwd/bwd PRNG-stream consistency: the dropout mask is exactly the
    # zero pattern of the output; the VJP must match a same-mask reference
    keep = jnp.asarray(y0 != 0.0)

    def ref_masked(x, w1, b1, w2, b2):
        y = ref_det_params(x, w1, b1, w2, b2)
        return jnp.where(keep, y / (1.0 - rate), 0.0)

    def ref_det_params(x, w1, b1, w2, b2):
        h = jax.nn.gelu(jnp.dot(x, w1) + b1, approximate=False)
        return jnp.dot(h, w2) + b2

    def fused_drop(x, w1, b1, w2, b2):
        return fused_ffn(x, w1, b1, w2, b2, s0, rate)

    o0, vjp0 = jax.vjp(ref_masked, x, w1, b1, w2, b2)
    o1, vjp1 = jax.vjp(fused_drop, x, w1, b1, w2, b2)
    assert float(jnp.abs(o0 - o1).max()) < 5e-3 * float(jnp.abs(o0).max())
    grads = {}
    for name, a, b in zip(
        ("dx", "dw1", "db1", "dw2", "db2"),
        jax.jit(lambda: vjp0(g))(),
        jax.jit(lambda: vjp1(g))(),
    ):
        d = float(jnp.abs(a - b).max())
        m = max(float(jnp.abs(a).max()), 1.0)
        grads[name] = round(d / m, 6)
        assert d < 0.01 * m, (name, d, m)

    # LN-fused variant (attention_ln + FFN + output_ln in one kernel):
    # dropout drop-fraction + fwd/bwd PRNG-stream consistency via a
    # same-mask composite reference VJP
    from dpr_scale_tpu.ops.ffn import fused_ffn_ln

    eps = 1e-12
    g1 = jnp.asarray(rng.normal(size=(H,)) * 0.1 + 1.0, jnp.float32)
    be1 = jnp.asarray(rng.normal(size=(H,)) * 0.05, jnp.float32)
    g2 = jnp.asarray(rng.normal(size=(H,)) * 0.1 + 1.0, jnp.float32)
    be2 = jnp.asarray(rng.normal(size=(H,)) * 0.05, jnp.float32)

    def ln(v, sc, bi):
        mu = v.mean(-1, keepdims=True)
        var = (v * v).mean(-1, keepdims=True) - mu * mu
        return (v - mu) * jax.lax.rsqrt(var + eps) * sc + bi

    y_ln = np.asarray(jax.jit(
        lambda s: fused_ffn_ln(x, w1, b1, w2, b2, g1, be1, g2, be2, s, rate,
                               eps)
    )(s0))
    # recover z's zero pattern: z = inverse-LN2 of y minus x1 has no
    # closed zero test, so rerun at rate 0 and compare drop fraction via
    # the PRE-LN2 z from a fresh direct call on the z-exposing impl
    from dpr_scale_tpu.ops.ffn import _fwd_ln_impl

    _out, x1_s, _pre, z_s = _fwd_ln_impl(
        x, w1, b1, w2, b2, g1, be1, g2, be2, s0, rate, eps, False
    )
    z_np = np.asarray(z_s[: x.shape[0]])
    frac_ln = float((z_np == 0.0).mean())
    assert abs(frac_ln - rate) < 0.02, f"ln drop fraction {frac_ln}"
    keep_ln = jnp.asarray(z_np != 0.0)

    def ref_ln_masked(x, w1, b1, w2, b2, g1, be1, g2, be2):
        x1 = ln(x, g1, be1)
        z = jnp.dot(
            jax.nn.gelu(jnp.dot(x1, w1) + b1, approximate=False), w2
        ) + b2
        z = jnp.where(keep_ln, z / (1.0 - rate), 0.0)
        return ln(x1 + z, g2, be2)

    def fused_ln_drop(x, w1, b1, w2, b2, g1, be1, g2, be2):
        return fused_ffn_ln(x, w1, b1, w2, b2, g1, be1, g2, be2, s0, rate, eps)

    args = (x, w1, b1, w2, b2, g1, be1, g2, be2)
    o0, vjp0 = jax.vjp(ref_ln_masked, *args)
    o1, vjp1 = jax.vjp(fused_ln_drop, *args)
    assert float(jnp.abs(o0 - o1).max()) < 5e-3 * float(jnp.abs(o0).max())
    assert float(jnp.abs(o1 - jnp.asarray(y_ln)).max()) == 0.0, (
        "same seed must be deterministic"
    )
    ln_grads = {}
    for name, a, b in zip(
        ("dr", "dw1", "db1", "dw2", "db2", "dg1", "dbe1", "dg2", "dbe2"),
        jax.jit(lambda: vjp0(g))(),
        jax.jit(lambda: vjp1(g))(),
    ):
        d = float(jnp.abs(a - b).max())
        m = max(float(jnp.abs(a).max()), 1.0)
        ln_grads[name] = round(d / m, 6)
        assert d < 0.01 * m, ("ln_" + name, d, m)

    return {"det_rel_err": round(det_err, 6), "drop_frac": round(frac, 4),
            "slope": round(slope, 4), "vjp_rel": grads,
            "ln_drop_frac": round(frac_ln, 4), "ln_vjp_rel": ln_grads}


def _make_corpus(mesh, rows, dim=768):
    """Synthesize a corpus on-device (the tunnel cannot upload GBs)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    shard = NamedSharding(mesh, P("data", None))
    CH = 1 << 19
    chunks = []
    for i in range(0, rows, CH):
        n = min(CH, rows - i)
        chunks.append(
            jax.jit(
                lambda k, n=n: jax.random.normal(k, (n, dim), jnp.bfloat16),
                out_shardings=shard,
            )(jax.random.PRNGKey(i))
        )
    return chunks


@check("mips_exactness_and_recall")
def check_mips(rows):
    from dpr_scale_tpu.index import MipsIndex
    from dpr_scale_tpu.parallel import get_mesh

    mesh = get_mesh()
    chunks = _make_corpus(mesh, rows)
    rng = np.random.default_rng(1)
    q = rng.standard_normal((256, 768), dtype=np.float32)

    def build(method):
        ix = MipsIndex(mesh, dtype=jnp.bfloat16, method=method)
        for c in chunks:
            ix.add_device(c)
        return ix

    s_exact, i_exact = build("exact_sort").search(q, k=100)
    detail = {"rows": rows}
    for method in ("fused", "groupmax"):
        s_m, i_m = build(method).search(q, k=100)
        diff = i_m != i_exact
        # near-tie rank swaps are legal: the two pipelines accumulate fp32
        # in different orders, so scores can differ in the last ulp and
        # swap adjacent equal-score ranks (observed 4/25600 at 64k rows on
        # CPU). A REAL miss surfaces as a materially lower score at that
        # rank — that is what must be zero.
        hard = diff & ~np.isclose(s_m, s_exact, rtol=3e-5, atol=1e-5)
        detail[f"{method}_idx_mismatches"] = int(diff.sum())
        detail[f"{method}_hard_mismatches"] = int(hard.sum())
        assert hard.sum() == 0, (
            f"{method}: {int(hard.sum())} non-tie mismatches vs exact_sort"
        )
    def recall_vs_exact(i_m):
        return float(
            np.mean(
                [len(set(a) & set(b)) / 100.0 for a, b in zip(i_m, i_exact)]
            )
        )

    for method, floor in (("int8", 0.95), ("approx", 0.97), ("int4", 0.70)):
        ix = build(method)
        _s, i_m = ix.search(q, k=100)
        rec = recall_vs_exact(i_m)
        detail[f"{method}_recall@100"] = round(rec, 4)
        assert rec >= floor, f"{method} recall {rec} < {floor}"
        if method == "int8":
            # two-plane (int16-precision) queries on the same index; also
            # exercises recompilation of the fused multi-block dispatch
            ix.int8_query_planes = 2
            _s, i_m2 = ix.search(q, k=100)
            rec2 = recall_vs_exact(i_m2)
            detail["int8p2_recall@100"] = round(rec2, 4)
            assert rec2 >= rec - 0.005, f"two-plane regressed: {rec2} vs {rec}"
        if method == "int4":
            # the capacity tier's quality-recovery lever: candidate
            # recall of the 4x-oversampled pool == what an exact rerank
            # (MipsIndex.set_rerank) recovers; measured 0.9985 at 21M
            _s, i_deep = ix.search(q, k=400)
            pool = float(
                np.mean(
                    [len(set(a) & set(b)) / 100.0 for a, b in zip(i_deep, i_exact)]
                )
            )
            detail["int4_pool4x_recall@100"] = round(pool, 4)
            assert pool >= 0.97, f"int4 4x candidate pool recall {pool}"
    return detail


@check("int8_store_cold_start")
def check_int8_store():
    """Prequantized int8 store round-trip on the REAL chip: fp32 shards ->
    build_int8_store -> cold mmap load into a fresh device-tier index ->
    search must match an index quantized directly from the same fp32 (the
    store persists exactly what MipsIndex.add computes). Covers the
    index/store.py serving cold-start path end-to-end, incl. the fused
    multi-block dispatch over store-loaded blocks (2 blocks here)."""
    import shutil
    import tempfile

    from dpr_scale_tpu.encode.embeddings import save_embedding_shard
    from dpr_scale_tpu.index import MipsIndex
    from dpr_scale_tpu.index.store import build_int8_store, load_int8_store
    from dpr_scale_tpu.parallel import get_mesh
    from dpr_scale_tpu.utils.transfer import warm_device_to_host

    warm_device_to_host()  # the shard write needs a device->host fetch
    mesh = get_mesh()
    rows = 131_072
    emb = np.concatenate(
        [np.asarray(c, np.float32) for c in _make_corpus(mesh, rows)]
    )
    rng = np.random.default_rng(3)
    q = rng.standard_normal((64, 768), dtype=np.float32)

    tmp = tempfile.mkdtemp(prefix="int8store_")
    try:
        save_embedding_shard(os.path.join(tmp, "reps_0000"), emb[: rows // 2])
        save_embedding_shard(os.path.join(tmp, "reps_0001"), emb[rows // 2 :])
        store_dir = os.path.join(tmp, "store")
        manifest = build_int8_store(tmp, store_dir, max_block_rows=rows // 2)

        cold = MipsIndex(mesh, method="int8")
        t0 = time.perf_counter()
        load_int8_store(cold, store_dir)
        cold_load_s = time.perf_counter() - t0
        s_cold, i_cold = cold.search(q, k=100)

        direct = MipsIndex(mesh, method="int8")
        direct.add(emb[: rows // 2])
        direct.add(emb[rows // 2 :])
        s_dir, i_dir = direct.search(q, k=100)

        assert np.array_equal(np.asarray(i_cold), np.asarray(i_dir)), (
            "store-loaded int8 search differs from directly-quantized"
        )
        assert np.allclose(np.asarray(s_cold), np.asarray(s_dir), atol=1e-4)
        return {
            "rows": rows,
            "blocks": len(manifest["blocks"]),
            "cold_load_s": round(cold_load_s, 2),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@check("citadel_device_index")
def check_citadel():
    """Host vs device expert-index search on the REAL chip — covers the
    Pallas DMA-gather score kernel and the sort-based combine, neither of
    which the CPU suite can execute."""
    import jax.numpy as jnp

    from dpr_scale_tpu.index.inverted import InvertedExpertIndex, _ExpertPostings
    from dpr_scale_tpu.index.inverted_device import DeviceExpertIndex

    num_docs, D = 50_000, 128
    rng = np.random.default_rng(11)
    host = InvertedExpertIndex(dim=D, num_docs=num_docs)
    for e in range(64):
        n = int(rng.integers(50, 400))
        ids = np.sort(rng.choice(num_docs, size=n, replace=True)).astype(np.int64)
        host.experts[e] = _ExpertPostings(
            ids, np.ones(n, np.float32),
            rng.normal(size=(n, D)).astype(np.float32),
        )
    B, T = 8, 8
    q_out = {
        "expert_ids": rng.integers(0, 64, size=(B, T)).astype(np.int64),
        "expert_repr": rng.normal(size=(B, T, D)).astype(np.float32),
        "attention_mask": np.ones((B, T), np.int64),
    }
    hs, hr = host.search(q_out, topk=20)
    detail = {}
    for tag, min_docs in (("sorted", 0), ("dense", 10**9)):
        dev = DeviceExpertIndex.from_host_index(host, dtype=jnp.float32)
        dev.sorted_combine_min_docs = min_docs
        ds, dr = dev.search(q_out, topk=20)
        bad = 0
        for b in range(B):
            dense_h = np.zeros(num_docs, np.float32)
            dense_h[hr[b]] = hs[b]
            dense_d = np.zeros(num_docs, np.float32)
            dense_d[dr[b]] = ds[b]
            bad += int((np.abs(dense_h - dense_d) > 1e-3).sum())
        detail[f"{tag}_bad_entries"] = bad
        assert bad == 0, (tag, bad)
    return detail


_TRAIN_SNIPPET = """
import json
import jax
{cpu_setup}
import jax.numpy as jnp
import numpy as np
import sys
sys.path.insert(0, {repo!r})
import dataclasses
from dpr_scale_tpu.models import TransformerConfig
from dpr_scale_tpu.optim import make_optimizer
from dpr_scale_tpu.train import DenseRetrieverTask
from dpr_scale_tpu.train.schedule import linear_warmup_decay

cfg = dataclasses.replace(TransformerConfig.tiny(), dtype=jnp.float32)
task = DenseRetrieverTask(
    cfg=cfg,
    optimizer=make_optimizer("adamw", linear_warmup_decay(2e-5, 10, 100), grad_clip_norm=2.0),
)
rng = np.random.default_rng(0)
B, C, QL, CL = 8, 2, 12, 16
batch = {{
    "query_ids": rng.integers(1, 32, (B, QL)).astype(np.int32),
    "query_mask": np.ones((B, QL), np.int32),
    "contexts_ids": rng.integers(1, 32, (B * C, CL)).astype(np.int32),
    "contexts_mask": np.ones((B * C, CL), np.int32),
    "pos_ctx_indices": (np.arange(B) * C).astype(np.int32),
    "scores": np.zeros((B, C), np.float32),
    "ctx_mask": np.zeros((B * C,), bool),
}}
state = task.init_state(jax.random.PRNGKey(0), batch)
step = task.make_train_step()
state, m = step(state, task.shard(batch))
print("RESULT " + json.dumps({{
    "loss": float(m["train_loss"]),
    "grad_norm": float(m.get("grad_norm", -1.0)),
}}))
"""


@check("train_step_vs_cpu")
def check_train_step():
    repo = str(pathlib.Path(__file__).resolve().parent.parent)

    def run(cpu):
        env = dict(os.environ)
        code = _TRAIN_SNIPPET.format(
            repo=repo,
            cpu_setup=(
                "jax.config.update('jax_platforms', 'cpu')" if cpu else "pass"
            ),
        )
        if cpu:
            env.pop("PALLAS_AXON_POOL_IPS", None)
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            env=env, timeout=420, check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")][-1]
        return json.loads(line[len("RESULT "):])

    tpu = run(cpu=False)
    cpu = run(cpu=True)
    rel = abs(tpu["loss"] - cpu["loss"]) / max(abs(cpu["loss"]), 1e-6)
    reln = abs(tpu["grad_norm"] - cpu["grad_norm"]) / max(abs(cpu["grad_norm"]), 1e-6)
    assert rel < 5e-3, f"loss TPU {tpu['loss']} vs CPU {cpu['loss']}"
    assert reln < 5e-2, f"grad_norm TPU {tpu['grad_norm']} vs CPU {cpu['grad_norm']}"
    return {"tpu": tpu, "cpu": cpu, "loss_rel": round(rel, 6),
            "grad_norm_rel": round(reln, 6)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None, help="also write the JSON verdict here")
    p.add_argument("--rows", type=int, default=1_048_576)
    p.add_argument(
        "--only", default=None,
        help="comma list: attention,ffn,mips,store,citadel,train (default: all)",
    )
    args = p.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    KNOWN = {"attention", "ffn", "mips", "store", "citadel", "train"}
    only = set(args.only.split(",")) if args.only else None
    if only is not None and (only - KNOWN or not only & KNOWN):
        # a typo'd --only would run ZERO checks and exit {"ok": true} —
        # a silent false-green on the gate guarding TPU-only regressions
        p.error(f"--only tags must be from {sorted(KNOWN)}; got {sorted(only)}")

    def want(tag):
        return only is None or tag in only

    if want("attention"):
        check_attention()
    if want("ffn"):
        check_ffn()
    if want("mips"):
        check_mips(args.rows)
    if want("store"):
        check_int8_store()
    if want("citadel"):
        check_citadel()
    if want("train"):
        check_train_step()

    ok = bool(RESULTS) and all(v["ok"] for v in RESULTS.values())
    verdict = {"ok": ok, "checks": RESULTS, "device": str(jax.devices()[0])}
    line = json.dumps(verdict)
    print(line)
    if args.out:
        pathlib.Path(args.out).write_text(line + "\n")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
