"""Multi-vector family tests: encoder contracts, scoring math vs numpy,
gating semantics, losses, and the training step."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpr_scale_tpu.models import TransformerConfig
from dpr_scale_tpu.models.multivec import CrossEncoder, MultiVecEncoder
from dpr_scale_tpu.optim import make_optimizer
from dpr_scale_tpu.train.multivec import (
    MultiVecRetrieverTask,
    colbert_score_inbatch,
    distilled_loss,
    dot_score,
    expert_sim_score,
)

CFG = dataclasses.replace(TransformerConfig.tiny(vocab_size=32), dtype=jnp.float32)


def _ids(B, L, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(5, 32, size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), np.int32)
    return jnp.asarray(ids), jnp.asarray(mask)


def _apply(variant, ids, mask, **kw):
    model = MultiVecEncoder(CFG, variant=variant, tok_projection_dim=8)
    params = model.init(jax.random.PRNGKey(0), ids, mask, **kw)
    return model.apply(params, ids, mask, **kw), model, params


def test_citadel_encoder_contract():
    ids, mask = _ids(2, 10)
    mask = mask.at[1, 6:].set(0)
    out, _, _ = _apply("citadel", ids, mask, topk=2)
    B, T = 2, 9  # CLS dropped
    assert out["expert_repr"].shape == (B, T, 8)
    assert out["expert_ids"].shape == (B, T, 2)
    assert out["expert_weights"].shape == (B, T, 2)
    assert out["router_repr"].shape == (B, 32)
    assert out["router_mask"].shape == (B, 32)
    assert out["router_softmax_repr"].shape == (B, 32)
    # pad positions: zero vectors, id -1, weight 0
    np.testing.assert_allclose(np.asarray(out["expert_repr"][1, 5:]), 0.0)
    assert (np.asarray(out["expert_ids"][1, 5:]) == -1).all()
    np.testing.assert_allclose(np.asarray(out["expert_weights"][1, 5:]), 0.0)
    # router stats consistent: cond experts = avg #active routings
    active = (np.asarray(out["expert_weights"]) > 0).sum((1, 2))
    np.testing.assert_allclose(
        float(out["avg_cond_num_experts"]), active.mean(), rtol=1e-5
    )


def test_coil_encoder_uses_token_ids():
    ids, mask = _ids(2, 8)
    out, _, _ = _apply("coil", ids, mask)
    np.testing.assert_array_equal(np.asarray(out["expert_ids"]), np.asarray(ids[:, 1:]))
    assert "expert_weights" not in out


def test_colbert_and_splade_contract():
    ids, mask = _ids(3, 8)
    out, _, _ = _apply("colbert", ids, mask)
    assert set(out) == {"attention_mask", "expert_repr"}
    out2, _, _ = _apply("splade", ids, mask)
    assert out2["splade_repr"].shape == (3, 32)
    assert (np.asarray(out2["splade_repr"]) >= 0).all()


def test_colbert_maxsim_matches_numpy():
    rng = np.random.default_rng(0)
    q = {"expert_repr": jnp.asarray(rng.normal(size=(2, 3, 4)), jnp.float32)}
    c = {"expert_repr": jnp.asarray(rng.normal(size=(5, 6, 4)), jnp.float32)}
    s = expert_sim_score(q, c, query_pool="sum")
    qn, cn = np.asarray(q["expert_repr"]), np.asarray(c["expert_repr"])
    expected = np.zeros((2, 5))
    for i in range(2):
        for j in range(5):
            sim = qn[i] @ cn[j].T  # (LQ, LC)
            expected[i, j] = sim.max(axis=1).sum()
    np.testing.assert_allclose(np.asarray(s), expected, rtol=1e-5)


def test_coil_gating_only_matching_tokens():
    q = {
        "expert_repr": jnp.ones((1, 2, 4), jnp.float32),
        "expert_ids": jnp.asarray([[7, 9]], jnp.int32),
    }
    c = {
        "expert_repr": jnp.ones((2, 2, 4), jnp.float32) * 2,
        "expert_ids": jnp.asarray([[7, 7], [5, 6]], jnp.int32),
    }
    s = expert_sim_score(q, c, query_pool="sum")
    # ctx0 matches query token 7 (score 1*2*4=8), token 9 no match -> 8
    # ctx1 matches nothing -> 0
    np.testing.assert_allclose(np.asarray(s), [[8.0, 0.0]])


def test_citadel_gating_weights():
    # one query token routed to expert 3 w/ weight 2; contexts with/without expert 3
    q = {
        "expert_repr": jnp.ones((1, 1, 4), jnp.float32),
        "expert_ids": jnp.asarray([[[3]]], jnp.int32),
        "expert_weights": jnp.asarray([[[2.0]]], jnp.float32),
    }
    c = {
        "expert_repr": jnp.ones((2, 1, 4), jnp.float32),
        "expert_ids": jnp.asarray([[[3]], [[4]]], jnp.int32),
        "expert_weights": jnp.asarray([[[5.0]], [[5.0]]], jnp.float32),
    }
    s = expert_sim_score(q, c, query_pool="sum")
    # match: dot(1,1)*4 = 4 times w_q*w_c = 10 -> 40; no match -> 0
    np.testing.assert_allclose(np.asarray(s), [[40.0, 0.0]])


def test_pairwise_equals_inbatch_blocks():
    """Pairwise scores must equal each query's own block of the in-batch
    matrix (the distillation path relies on this)."""
    ids_q, mq = _ids(2, 6, seed=1)
    ids_c, mc = _ids(4, 6, seed=2)  # 2 ctx per query
    out_q, model, params = _apply("citadel", ids_q, mq, topk=2)
    out_c = model.apply(params, ids_c, mc, topk=2)
    inb = np.asarray(expert_sim_score(out_q, out_c, query_pool="sum"))
    pw = np.asarray(expert_sim_score(out_q, out_c, pairwise=True, query_pool="sum"))
    np.testing.assert_allclose(pw[0], inb[0, :2], rtol=1e-5)
    np.testing.assert_allclose(pw[1], inb[1, 2:], rtol=1e-5)
    # dot_score pairwise agrees too
    r_in = np.asarray(dot_score(out_q["router_repr"], out_c["router_repr"]))
    r_pw = np.asarray(dot_score(out_q["router_repr"], out_c["router_repr"], pairwise=True))
    np.testing.assert_allclose(r_pw[1], r_in[1, 2:], rtol=1e-5)


def test_distilled_loss_matches_manual():
    inp = jnp.asarray([[1.0, 2.0, 0.5]])
    tgt = jnp.asarray([[0.2, 0.1, 0.9]])
    got = float(distilled_loss(inp, tgt))
    p = np.exp(np.asarray([1.0, 2.0, 0.5]) - 2.0)
    p = p / p.sum()
    t = np.exp(np.asarray([0.2, 0.1, 0.9]) - 0.9)
    t = t / t.sum()
    expected = -(t * np.log(p + 1e-6)).sum()
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def _mv_batch(B, C, L=8, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda n: rng.integers(5, 32, size=(n, L)).astype(np.int32)
    return {
        "query_ids": mk(B),
        "query_mask": np.ones((B, L), np.int32),
        "contexts_ids": mk(B * C),
        "contexts_mask": np.ones((B * C, L), np.int32),
        "pos_ctx_indices": (np.arange(B) * C).astype(np.int32),
        "scores": rng.normal(size=(B, C)).astype(np.float32),
        "ctx_mask": np.zeros((B * C,), bool),
    }


@pytest.mark.parametrize("variant", ["citadel", "coil", "colbert"])
def test_multivec_train_step_learns(variant):
    task = MultiVecRetrieverTask(
        cfg=CFG,
        variant=variant,
        tok_projection_dim=8,
        query_topk=2,
        context_topk=2,
        optimizer=make_optimizer("adamw", 1e-3, grad_clip_norm=2.0),
        query_router_marg_load_loss_coef=0.01 if variant == "citadel" else 0.0,
        context_expert_load_loss_coef=0.01 if variant == "citadel" else 0.0,
        teacher_coef=0.3 if variant == "citadel" else 0.0,
        anneal_factor=1.0,
        max_epochs=2,
    )
    batch = _mv_batch(4, 2)
    state = task.init_state(jax.random.PRNGKey(0), batch)
    step = task.make_train_step()
    sharded = task.shard(batch)
    losses = []
    for _ in range(20):
        state, m = step(state, sharded, 0)
        losses.append(float(m["train_loss"]))
    assert losses[-1] < losses[0]
    if variant == "citadel":
        assert "router_loss" in m and "expert_loss" in m
        assert "context_expert_load_loss" in m

    ev = task.run_eval(state, [_mv_batch(4, 2, seed=7)])
    assert 0 <= ev["mrr"] <= 1 and ev["query_count"] == 4


@pytest.mark.parametrize("variant", ["citadel", "colbert"])
def test_multivec_grad_cache_matches_monolithic_step(variant):
    """grad_cache_chunks>1 must train IDENTICALLY to the monolithic step
    (tiny config: zero dropout) — the dict-output GradCache caches token
    reprs + router planes and re-derives the full-batch gradient,
    including the aux regularizers and teacher distillation."""
    kw = dict(
        cfg=CFG, variant=variant, tok_projection_dim=8,
        query_topk=2, context_topk=2,
        query_router_marg_load_loss_coef=0.01 if variant == "citadel" else 0.0,
        context_expert_load_loss_coef=0.01 if variant == "citadel" else 0.0,
        teacher_coef=0.3 if variant == "citadel" else 0.0,
        anneal_factor=1.0, max_epochs=2,
    )
    batch = _mv_batch(8, 2, seed=11)
    mono = MultiVecRetrieverTask(
        optimizer=make_optimizer("adamw", 1e-3, grad_clip_norm=2.0), **kw
    )
    cache = MultiVecRetrieverTask(
        optimizer=make_optimizer("adamw", 1e-3, grad_clip_norm=2.0),
        grad_cache_chunks=4, **kw,
    )
    sm = mono.init_state(jax.random.PRNGKey(0), batch)
    sc = cache.init_state(jax.random.PRNGKey(0), batch)
    step_m = mono.make_train_step()
    step_c = cache.make_train_step()
    for _ in range(3):
        sm, mm = step_m(sm, mono.shard(batch), 1)
        sc, mc = step_c(sc, cache.shard(batch), 1)
        np.testing.assert_allclose(
            float(mc["train_loss"]), float(mm["train_loss"]), rtol=1e-5
        )
    if variant == "citadel":
        # per-batch router stats (incl. the global-batch MAX stat) match
        for key in ("avg_query_cond_num_experts", "avg_query_marg_num_experts"):
            np.testing.assert_allclose(
                float(mc[key]), float(mm[key]), rtol=1e-6, err_msg=key
            )
    for a, b in zip(
        jax.tree_util.tree_leaves(sm.params), jax.tree_util.tree_leaves(sc.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_multivec_grad_cache_mesh_parity():
    """Strided dict-output chunking must be sharding-transparent:
    mesh(8) == mesh(1) params after real GradCache steps."""
    from dpr_scale_tpu.parallel import get_mesh

    batch = _mv_batch(8, 2, seed=12)
    states, metrics = {}, {}
    for n in (8, 1):
        task = MultiVecRetrieverTask(
            cfg=CFG, variant="citadel", tok_projection_dim=8,
            query_topk=2, context_topk=2, grad_cache_chunks=2,
            optimizer=make_optimizer("adamw", 1e-3), mesh=get_mesh(n),
        )
        s = task.init_state(jax.random.PRNGKey(0), batch)
        step = task.make_train_step()
        for _ in range(2):
            s, m = step(s, task.shard(batch), 0)
        states[n], metrics[n] = s, m
    np.testing.assert_allclose(
        float(metrics[8]["train_loss"]), float(metrics[1]["train_loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(states[8].params),
        jax.tree_util.tree_leaves(states[1].params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_cross_encoder_shapes():
    model = CrossEncoder(CFG)
    ids, mask = _ids(3, 10)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    logits = model.apply(params, ids, mask)
    assert logits.shape == (3, 2)


def test_multivec_sharded_equals_single_device():
    """Multi-vector eval metrics match between an 8-device mesh and a
    single device — the GSPMD replacement for the reference's
    dynamic-shape distributed_gather (citadel_task.py:97-135)."""
    from dpr_scale_tpu.parallel import get_mesh

    batch = _mv_batch(8, 2, seed=3)
    results = {}
    for n in (8, 1):
        task = MultiVecRetrieverTask(
            cfg=CFG, variant="citadel", tok_projection_dim=8,
            query_topk=2, context_topk=2,
            optimizer=make_optimizer("adamw", 1e-3), mesh=get_mesh(n),
        )
        state = task.init_state(jax.random.PRNGKey(0), batch)
        results[n] = task.run_eval(state, [batch])
    np.testing.assert_allclose(results[8]["loss"], results[1]["loss"], rtol=2e-5)
    np.testing.assert_allclose(results[8]["mrr"], results[1]["mrr"], rtol=1e-6)
    assert results[8]["avg_rank"] == results[1]["avg_rank"]
