"""Lossy serving-mode recall on TRAINED-encoder embeddings (vs the
random-normal proxy all previous numbers used — VERDICT r2 item 5).

    python tools/bench_lossy_recall.py [--rows 131072] [--queries 1024]
                                       [--skip-train]

Pipeline:
  1. (CPU subprocess) trains the e2e-demo tiny bi-encoder WITH a 768-d
     projection head on synthetic contrastive data, then encodes a
     synthetic corpus of --rows passages and --queries queries built from
     the same vocabulary; saves bf16 .npy files to the workdir.
  2. (this process, the attached TPU) loads the embeddings, builds
     MipsIndex in exact / int8 / approx modes, and reports recall@100 of
     the lossy modes vs exact, plus the top-100 score-margin profile
     (k-th minus (k+1)-th score over the score scale) — the geometry that
     decides how forgiving the corpus is to quantization.
  3. --proxy also measures a SAME-SHAPE random-normal corpus in the same
     run for a direct trained-vs-proxy comparison.

The reference protocol match: retrieval quality evaluation,
/root/reference/dpr_scale/run_retrieval.py:97.
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

WORKDIR = "/tmp/dpr_lossy_recall"

_TRAIN_CODE = '''
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import dataclasses
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, {repo!r})
from dpr_scale_tpu.models import TransformerConfig
from dpr_scale_tpu.models.encoder import BiEncoder
from dpr_scale_tpu.optim import make_optimizer
from dpr_scale_tpu.train import DenseRetrieverTask
from dpr_scale_tpu.train.schedule import linear_warmup_decay

rows, n_queries, steps = {rows}, {queries}, {steps}
V, L = 512, 16
rng = np.random.default_rng(0)

# synthetic "documents": each doc is a bag of 8 content words from a
# 500-word vocab (ids 5..504); queries are 4-word subsets of their doc
def doc_words(i, r):
    return r.integers(5, V - 7, size=8)

def make_batch(r, B):
    q_ids = np.zeros((B, L), np.int32)
    c_ids = np.zeros((B * 2, L), np.int32)
    for b in range(B):
        w = doc_words(0, r)
        neg = doc_words(0, r)
        sel = r.choice(8, size=4, replace=False)
        q_ids[b, 0] = 2; q_ids[b, 1:5] = w[sel]; q_ids[b, 5] = 3
        c_ids[2 * b, 0] = 2; c_ids[2 * b, 1:9] = w; c_ids[2 * b, 9] = 3
        c_ids[2 * b + 1, 0] = 2; c_ids[2 * b + 1, 1:9] = neg; c_ids[2 * b + 1, 9] = 3
    return {{
        "query_ids": q_ids, "query_mask": (q_ids != 0).astype(np.int32),
        "contexts_ids": c_ids, "contexts_mask": (c_ids != 0).astype(np.int32),
        "pos_ctx_indices": (np.arange(B) * 2).astype(np.int32),
        "scores": np.zeros((B, 2), np.float32),
        "ctx_mask": np.zeros((B * 2,), bool),
    }}

cfg = dataclasses.replace(
    TransformerConfig.tiny(vocab_size=V), hidden_size=64, num_heads=4,
    intermediate_size=128, dtype=jnp.float32,
)
task = DenseRetrieverTask(
    cfg=cfg,
    optimizer=make_optimizer("adamw", linear_warmup_decay(2e-3, 20, steps),
                             grad_clip_norm=2.0),
    projection_dim=768,
)
batch0 = make_batch(np.random.default_rng(1), 32)
state = task.init_state(jax.random.PRNGKey(0), batch0)
step = task.make_train_step()
r = np.random.default_rng(2)
for s in range(steps):
    state, m = step(state, task.shard(make_batch(r, 32)))
    if s % 50 == 0:
        print(f"step {{s}} loss {{float(m['train_loss']):.4f}}", flush=True)
print(f"final loss {{float(m['train_loss']):.4f}}")

params = jax.device_get(state.params)
model = task.model

# corpus: rows docs, each its own word bag; queries reference random docs
enc_B = 512
corpus = np.zeros((rows, 768), np.float32)
rc = np.random.default_rng(3)
doc_bags = rc.integers(5, V - 7, size=(rows, 8))
ids = np.zeros((enc_B, L), np.int32)
import jax.numpy as jnp
enc_c = jax.jit(lambda ids, mask: model.apply(
    {{"params": params}}, ids, mask, method=model.encode_context))
for lo in range(0, rows, enc_B):
    n = min(enc_B, rows - lo)
    ids[:] = 0
    ids[:n, 0] = 2; ids[:n, 1:9] = doc_bags[lo:lo + n]; ids[:n, 9] = 3
    corpus[lo:lo + n] = np.asarray(
        enc_c(jnp.asarray(ids), jnp.asarray((ids != 0).astype(np.int32)))
    )[:n]
    if lo % (enc_B * 32) == 0:
        print(f"encoded {{lo}}/{{rows}}", flush=True)

rq = np.random.default_rng(4)
q_ids = np.zeros((n_queries, L), np.int32)
target = rq.integers(0, rows, size=n_queries)
for i, t in enumerate(target):
    sel = rq.choice(8, size=4, replace=False)
    q_ids[i, 0] = 2; q_ids[i, 1:5] = doc_bags[t][sel]; q_ids[i, 5] = 3
enc_q = jax.jit(lambda ids, mask: model.apply(
    {{"params": params}}, ids, mask, method=model.encode_query))
qs = np.asarray(enc_q(jnp.asarray(q_ids), jnp.asarray((q_ids != 0).astype(np.int32))))

os.makedirs({workdir!r}, exist_ok=True)
np.save(os.path.join({workdir!r}, "corpus.npy"), corpus.astype(np.float16))
np.save(os.path.join({workdir!r}, "queries.npy"), qs.astype(np.float32))
np.save(os.path.join({workdir!r}, "target.npy"), target)
print("saved", flush=True)
'''


def measure(tag, corpus, queries, results, target=None):
    import jax
    import jax.numpy as jnp

    from dpr_scale_tpu.index import MipsIndex
    from dpr_scale_tpu.parallel import get_mesh

    mesh = get_mesh()

    def build(method):
        ix = MipsIndex(mesh, dtype=jnp.bfloat16, method=method)
        ix.add(corpus)
        return ix

    def mrr10(i_m):
        """End-to-end retrieval quality (reference msmarco protocol,
        MRR@10): reciprocal rank of the gold doc in the top 10."""
        if target is None:
            return None
        rr = 0.0
        for t, row in zip(target, np.asarray(i_m)[:, :10]):
            pos = np.nonzero(row == t)[0]
            if len(pos):
                rr += 1.0 / (int(pos[0]) + 1)
        return round(rr / len(target), 4)

    s_e, i_e = build("exact_sort").search(queries, k=101)
    if target is not None:
        results[f"{tag}_exact_mrr@10"] = mrr10(i_e)
    # top-100 margin profile: (s_100 - s_101) / (s_1 - s_101)
    margin = (s_e[:, 99] - s_e[:, 100]) / np.maximum(
        s_e[:, 0] - s_e[:, 100], 1e-9
    )
    results[f"{tag}_margin_p10"] = round(float(np.percentile(margin, 10)), 5)
    results[f"{tag}_margin_p50"] = round(float(np.percentile(margin, 50)), 5)
    def recall(i_m):
        return round(
            float(
                np.mean(
                    [
                        len(set(a) & set(b[:100])) / 100.0
                        for a, b in zip(i_m, i_e)
                    ]
                )
            ),
            4,
        )

    for method in ("int8", "approx", "int4"):
        ix = build(method)
        _s, i_m = ix.search(queries, k=100)
        results[f"{tag}_{method}_recall@100"] = recall(i_m)
        if target is not None:
            results[f"{tag}_{method}_mrr@10"] = mrr10(i_m)
        if method == "int8":
            # int16-precision queries (two int8 planes, same corpus bytes)
            ix.int8_query_planes = 2
            _s, i_m2 = ix.search(queries, k=100)
            results[f"{tag}_int8p2_recall@100"] = recall(i_m2)
            if target is not None:
                results[f"{tag}_int8p2_mrr@10"] = mrr10(i_m2)
        if method == "int4":
            # host exact-rerank tier over the 4x int4 candidate pool
            # (MipsIndex.set_rerank): the serving menu's quality-recovery
            # lever for the quarter-HBM capacity mode
            cf = np.ascontiguousarray(corpus, dtype=np.float32)
            ix.set_rerank(lambda ids: cf[ids], oversample=4)
            _s, i_m3 = ix.search(queries, k=100)
            results[f"{tag}_int4rr4_recall@100"] = recall(i_m3)
            if target is not None:
                results[f"{tag}_int4rr4_mrr@10"] = mrr10(i_m3)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=131072)
    p.add_argument("--queries", type=int, default=1024)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--skip-train", action="store_true",
                   help="reuse saved embeddings in the workdir")
    p.add_argument("--proxy", action="store_true",
                   help="also measure a same-shape random-normal corpus")
    p.add_argument("--cpu", action="store_true",
                   help="measure on CPU (approx recall is then trivially "
                   "1.0 — approx_max_k has no CPU approximation)")
    args = p.parse_args()

    if args.cpu:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    if not args.skip_train:
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        code = _TRAIN_CODE.format(
            repo=repo, rows=args.rows, queries=args.queries,
            steps=args.steps, workdir=WORKDIR,
        )
        subprocess.run(
            [sys.executable, "-c", code], env=env, check=True, timeout=3600
        )

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    corpus = np.load(os.path.join(WORKDIR, "corpus.npy")).astype(np.float32)
    queries = np.load(os.path.join(WORKDIR, "queries.npy"))
    target = np.load(os.path.join(WORKDIR, "target.npy"))

    results = {}
    measure("trained", corpus, queries, results, target=target)
    # sanity: the trained encoder must actually retrieve its targets —
    # collapsed embeddings would make every lossy mode agree with exact
    # (recall ~1.0) while carrying no signal, silently voiding the
    # "trained geometry" claim this tool exists to measure
    # (chunked: the full (Q, rows) score matrix is ~4 GB at 1M rows)
    qf = queries.astype(np.float32)
    exact = np.concatenate(
        [
            np.argsort(-(qf[lo : lo + 128] @ corpus.T), axis=1)[:, :100]
            for lo in range(0, len(qf), 128)
        ]
    )
    hit = np.mean([t in row for t, row in zip(target, exact)])
    results["trained_target_recall@100"] = round(float(hit), 4)
    assert hit > 0.5, (
        f"trained encoder retrieves its own targets at {hit:.2f}@100 — "
        "the training run collapsed; lossy-recall numbers would be "
        "meaningless"
    )

    if args.proxy:
        rng = np.random.default_rng(7)
        measure(
            "proxy",
            rng.standard_normal(corpus.shape).astype(np.float32),
            rng.standard_normal(queries.shape).astype(np.float32),
            results,
        )

    result = {
        "metric": f"lossy_recall_trained_{args.rows}rows",
        "unit": "recall@100 vs exact",
        **results,
    }
    print(json.dumps(result))
    out_path = os.environ.get("LOSSY_OUT")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
