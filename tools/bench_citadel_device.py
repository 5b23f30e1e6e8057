"""Production-scale throughput of the device-resident CITADEL index.

Synthesizes the post-build bucket layout of
:class:`dpr_scale_tpu.index.inverted_device.DeviceExpertIndex` directly
on device at MS MARCO-like scale (8.8M docs; a skewed expert->postings
distribution over the length buckets; D=128 token vectors, bf16), then
measures end-to-end `search()` latency/QPS including the host-side
routing loop. The reference never shipped its GPU index (the module is
missing on the main branch, citadel_retrieval_task.py:12), so these are
new numbers, not parity numbers.

Run: python tools/bench_citadel_device.py [--docs 8800000] [--batch 16]
"""
import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def synth_bucket(key, n_exp, bsize, D, num_docs, avg_fill=0.7):
    """Random postings for n_exp experts of (padded) length bsize, in the
    run-compact DeviceExpertIndex layout (run_doc/start_pos of width
    R_pad, max_run_len)."""
    kv, kd = jax.random.split(key)
    vecs = jax.random.normal(kv, (n_exp, bsize, D), jnp.bfloat16) * 0.3
    # doc runs: sorted random doc ids, ~1.3 postings per run
    docs = np.sort(
        np.random.default_rng(int(kd[0]) % 2**31).integers(
            0, num_docs, size=(n_exp, bsize)
        ),
        axis=1,
    ).astype(np.int32)
    fill = int(bsize * avg_fill)
    docs[:, fill:] = -1
    starts = np.zeros((n_exp, bsize), bool)
    starts[:, 0] = True
    starts[:, 1:fill] = docs[:, 1:fill] != docs[:, : fill - 1]
    run_id = np.zeros((n_exp, bsize), np.int32)
    run_id[:, :fill] = np.cumsum(starts[:, :fill], axis=1) - 1
    run_id[:, fill:] = run_id[:, fill - 1 : fill]
    nruns = run_id[:, fill - 1] + 1
    from dpr_scale_tpu.index.inverted_device import _pad_2bit

    R_pad = min(_pad_2bit(int(nruns.max()), minimum=8), bsize)
    run_doc = np.full((n_exp, R_pad), -1, np.int32)
    start_pos = np.zeros((n_exp, R_pad), np.int32)
    max_run_len = 1
    for slot in range(n_exp):
        sp = np.flatnonzero(starts[slot])
        nr = min(len(sp), R_pad)
        start_pos[slot, :nr] = sp[:nr]
        run_doc[slot, :nr] = docs[slot, sp[:nr]]
        lens = np.diff(np.append(sp, fill))
        max_run_len = max(max_run_len, int(lens.max()))
    return {
        "vecs": vecs,
        "run_id": jax.device_put(jnp.asarray(run_id)),
        "run_doc": jax.device_put(jnp.asarray(run_doc)),
        "start_pos": jax.device_put(jnp.asarray(start_pos)),
        "max_run_len": max_run_len,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--docs", type=int, default=8_800_000)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--qtokens", type=int, default=32)
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--dim", type=int, default=128)
    parser.add_argument(
        "--stage", default="full",
        choices=["full", "score", "sort1", "gather", "einsum", "scan"],
        help="stub the pipeline to time phases: gather = posting-block "
        "gather only; einsum = + scoring; scan = + run max; score = full "
        "bucket scoring; sort1 = + first sort and suffix-sum",
    )
    parser.add_argument(
        "--scorer", default="auto", choices=["auto", "on", "off"],
        help="bucket scorer: on = streamed kernel, off = per-entry DMA",
    )
    args = parser.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from dpr_scale_tpu.index import inverted_device
    from dpr_scale_tpu.index.inverted_device import DeviceExpertIndex

    inverted_device.STREAM_MODE = args.scorer

    D = args.dim
    # skewed expert population (MS MARCO-like: most experts short, a few
    # huge "stopword" experts) — ~30k experts, ~21M padded postings
    plan = [(512, 8000), (2048, 3000), (8192, 800), (32768, 100), (131072, 8)]
    idx = DeviceExpertIndex(args.docs, jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    expert_id = 0
    total = 0
    for bsize, n_exp in plan:
        key, sub = jax.random.split(key)
        b = synth_bucket(sub, n_exp, bsize, D, args.docs)
        b["slot_of"] = {expert_id + i: i for i in range(n_exp)}
        expert_id += n_exp
        idx.buckets[bsize] = b
        total += n_exp * bsize
    # dense routing tables (normally built by from_host_index)
    idx._route_bsize = np.zeros(expert_id + 1, np.int64)
    idx._route_slot = np.zeros(expert_id + 1, np.int64)
    for bsize, b in idx.buckets.items():
        for e, s in b["slot_of"].items():
            idx._route_bsize[e] = bsize
            idx._route_slot[e] = s
    jax.block_until_ready(idx.buckets[512]["vecs"])
    gb = total * D * 2 / 1e9
    print(f"index: {expert_id} experts, {total/1e6:.1f}M padded postings, {gb:.1f} GB bf16, {args.docs/1e6:.1f}M docs")

    rng = np.random.default_rng(1)
    B, T = args.batch, args.qtokens
    query = {
        # citadel routing: topk-1 expert per token, weights ~U(0,1)
        "expert_ids": rng.integers(0, expert_id, size=(B, T, 1)).astype(np.int64),
        "expert_weights": rng.random((B, T, 1)).astype(np.float32),
        "expert_repr": rng.normal(size=(B, T, D)).astype(np.float32),
        "attention_mask": np.ones((B, T), np.int64),
    }

    if args.stage in ("gather", "einsum", "scan"):
        stage = args.stage

        def score_stub(self, vecs, run_id, run_doc, start_pos, slots, qvecs,
                       qrows, mrl, steps=None):
            R = run_doc.shape[1]
            pv = vecs[slots]
            if stage == "gather":
                v = jnp.sum(pv.astype(jnp.float32), axis=(1, 2))[:, None]
                v = jnp.broadcast_to(v, (v.shape[0], R)).reshape(-1)
                return (
                    jnp.repeat(qrows, R),
                    jnp.full((qrows.shape[0] * R,), self.num_docs, jnp.int32),
                    v,
                )
            rid = run_id[slots]
            scores = jnp.einsum(
                "ed,eld->el", qvecs.astype(pv.dtype), pv,
                preferred_element_type=jnp.float32,
            )
            if stage == "scan":
                E = scores.shape[0]
                d = 1
                while d < mrl:
                    sh_s = jnp.concatenate(
                        [scores[:, d:], jnp.full((E, d), -jnp.inf, scores.dtype)],
                        axis=1,
                    )
                    sh_r = jnp.concatenate(
                        [rid[:, d:], jnp.full((E, d), -1, rid.dtype)], axis=1
                    )
                    scores = jnp.where(
                        sh_r == rid, jnp.maximum(scores, sh_s), scores
                    )
                    d *= 2
            v = jnp.sum(scores, axis=1)[:, None]
            v = jnp.broadcast_to(v, (v.shape[0], R)).reshape(-1)
            return (
                jnp.repeat(qrows, R),
                jnp.full((qrows.shape[0] * R,), self.num_docs, jnp.int32),
                v,
            )

        DeviceExpertIndex._score_bucket = score_stub

        def stub(self, rows, docs, vals, batch, k, mdup):
            s = jnp.full((batch, k), jnp.sum(vals), jnp.float32)
            return s, jnp.zeros((batch, k), jnp.int32)

        DeviceExpertIndex._combine_updates_sorted = stub

    if args.stage in ("score", "sort1"):
        stage = args.stage

        def stub(self, rows, docs, vals, batch, k, mdup):
            if stage == "score":
                s = jnp.full((batch, k), jnp.sum(vals), jnp.float32)
                return s, jnp.zeros((batch, k), jnp.int32)
            nd = self.num_docs
            key = rows.astype(jnp.int64) * (nd + 2) + docs.astype(jnp.int64)
            skey, svals = jax.lax.sort((key, vals), num_keys=1)
            d = 1
            while d < mdup:
                sh_v = jnp.concatenate([svals[d:], jnp.zeros((d,), svals.dtype)])
                sh_k = jnp.concatenate([skey[d:], jnp.full((d,), -1, skey.dtype)])
                svals = svals + jnp.where(sh_k == skey, sh_v, 0.0)
                d *= 2
            s = jnp.full((batch, k), jnp.sum(svals), jnp.float32)
            return s, jnp.zeros((batch, k), jnp.int32)

        DeviceExpertIndex._combine_updates_sorted = stub

    s, i = idx.search(query, topk=100)  # compile + warm
    t0 = time.perf_counter()
    for it in range(args.iters):
        s, i = idx.search(query, topk=100)
    dt = time.perf_counter() - t0
    qps = args.iters * B / dt
    # device-resident variant: skip the per-batch result download (the axon
    # tunnel downloads at ~0.1 MB/s, which a production host would not pay)
    t0 = time.perf_counter()
    for it in range(args.iters):
        s_d, i_d = idx.search(query, topk=100, as_numpy=False)
    float(jnp.sum(s_d[:, 0]))  # one scalar sync
    dt_d = time.perf_counter() - t0
    qps_d = args.iters * B / dt_d
    print(
        {
            "metric": f"citadel_device_qps_{args.docs//1_000_000}Mdocs_{total//1_000_000}Mpost",
            "value": round(qps, 1),
            "unit": "qps",
            "ms_per_batch": round(dt / args.iters * 1e3, 1),
            "device_resident_qps": round(qps_d, 1),
            "device_ms_per_batch": round(dt_d / args.iters * 1e3, 1),
        }
    )


if __name__ == "__main__":
    main()
