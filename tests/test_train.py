"""Training-layer tests: loss semantics, metrics, optimizers, and the
SPMD global-batch equivalence the reference could never test
(SURVEY.md §4 implication: simulated-mesh test layer)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpr_scale_tpu.models import TransformerConfig
from dpr_scale_tpu.optim import madgrad, make_optimizer
from dpr_scale_tpu.parallel import get_mesh
from dpr_scale_tpu.train import (
    DenseRetrieverTask,
    contrastive_loss,
    linear_warmup_decay,
    rank_metrics,
    similarity_scores,
)


def test_similarity_scores_masks_dummies():
    q = jnp.eye(2, 4)
    c = jnp.eye(3, 4)
    mask = jnp.asarray([False, False, True])
    s = similarity_scores(q, c, mask)
    assert s.shape == (2, 3)
    assert float(s[0, 0]) == 1.0
    assert float(s[0, 2]) < -1e29  # dummy driven to -inf


def test_contrastive_loss_manual():
    # 2 queries, 4 ctxs (2 per query), no dummies, temperature 1
    q = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    c = jnp.asarray([[2.0, 0.0], [0.0, 1.0], [0.0, 2.0], [1.0, 0.0]])
    labels = jnp.asarray([0, 2])
    mask = jnp.zeros((4,), bool)
    loss, scores = contrastive_loss(q, c, labels, mask)
    logits0 = np.asarray([2.0, 0.0, 0.0, 1.0])
    logits1 = np.asarray([0.0, 1.0, 2.0, 0.0])
    expected = -(
        (logits0[0] - np.log(np.exp(logits0).sum()))
        + (logits1[2] - np.log(np.exp(logits1).sum()))
    ) / 2
    np.testing.assert_allclose(float(loss), expected, rtol=1e-6)


def test_contrastive_loss_dummy_never_contributes():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(3, 8)), jnp.float32)
    c_real = rng.normal(size=(6, 8))
    c_poison = c_real.copy()
    # replace masked rows with huge vectors; loss must not change
    mask = np.zeros((6,), bool)
    mask[[1, 4]] = True
    c_poison[[1, 4]] = 1e3
    labels = jnp.asarray([0, 2, 3])
    l1, _ = contrastive_loss(q, jnp.asarray(c_real, jnp.float32), labels, jnp.asarray(mask))
    l2, _ = contrastive_loss(q, jnp.asarray(c_poison, jnp.float32), labels, jnp.asarray(mask))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_contrastive_loss_block_mask():
    """Without in-batch negatives each query sees only its own ctx block."""
    q = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    # block 0 = ctxs 0-1, block 1 = ctxs 2-3
    c = jnp.asarray([[1.0, 0.0], [0.5, 0.0], [0.0, 1.0], [0.0, 99.0]])
    labels = jnp.asarray([0, 2])
    mask = np.zeros((4,), bool)
    mask[3] = True  # dummy inside block 1
    loss_blocked, scores = contrastive_loss(
        q, c, labels, jnp.asarray(mask), in_batch_negatives=False
    )
    s = np.asarray(scores)
    assert s[0, 2] < -1e20 and s[0, 3] < -1e20  # other block masked
    assert s[1, 0] < -1e20 and s[1, 3] < -1e20  # dummy masked too
    # query 1's only unmasked ctx is its positive -> contributes ~0 loss
    logits0 = np.asarray([1.0, 0.5])
    expected0 = -(logits0[0] - np.log(np.exp(logits0).sum()))
    np.testing.assert_allclose(float(loss_blocked), expected0 / 2, rtol=1e-5)


def test_rank_metrics():
    scores = jnp.asarray(
        [[0.9, 0.5, 0.1], [0.2, 0.8, 0.3], [0.1, 0.2, 0.3]]
    )
    labels = jnp.asarray([0, 0, 2])
    m = rank_metrics(scores, labels, k=1)
    # gold scores 0.9, 0.2, 0.3 -> ranks 1, 3, 1
    assert float(m["rank_sum"]) == 5.0
    np.testing.assert_allclose(float(m["mrr_sum"]), 1 + 1 / 3 + 1)
    assert float(m["hits_at_k"]) == 2.0
    assert float(m["query_count"]) == 3.0


def test_rank_metrics_tie_semantics():
    """Exact score ties resolve by STABLE-SORT position, not in the
    gold's favor (regression: strictly-greater counting gave the gold
    rank 1 against an identical duplicate — e.g. DPR-output rows whose
    fallback positive also appears as a negative — inflating MRR)."""
    # gold at position 2 ties positions 0 and 3; position 1 beats it
    scores = jnp.asarray([[5.0, 9.0, 5.0, 5.0]])
    m = rank_metrics(scores, jnp.asarray([2]), k=2)
    assert float(m["rank_sum"]) == 3.0  # 1 + one higher + one earlier tie
    assert float(m["hits_at_k"]) == 0.0
    # gold at position 0 with the same ties: earlier ties = 0 -> rank 2
    m0 = rank_metrics(scores, jnp.asarray([0]), k=2)
    assert float(m0["rank_sum"]) == 2.0
    assert float(m0["hits_at_k"]) == 1.0


def test_linear_warmup_decay():
    sched = linear_warmup_decay(1.0, warmup_steps=10, total_steps=110)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(5)), 0.5)
    np.testing.assert_allclose(float(sched(10)), 1.0)
    np.testing.assert_allclose(float(sched(60)), 0.5)
    np.testing.assert_allclose(float(sched(110)), 0.0)


def test_madgrad_converges():
    """MADGRAD minimizes a quadratic ||Ax-b||^2 quickly."""
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)
    x_true = rng.normal(size=(8,))
    b = A @ jnp.asarray(x_true, jnp.float32)  # consistent: min loss = 0
    x = jnp.zeros((8,))
    opt = madgrad(learning_rate=0.05, momentum=0.9)
    state = opt.init(x)
    loss_fn = lambda x: jnp.mean((A @ x - b) ** 2)
    l0 = float(loss_fn(x))
    for _ in range(200):
        g = jax.grad(loss_fn)(x)
        updates, state = opt.update(g, state, x)
        x = x + updates
    assert float(loss_fn(x)) < 0.05 * l0


def test_madgrad_weight_decay_shrinks():
    x = jnp.full((4,), 10.0)
    opt = madgrad(learning_rate=0.1, weight_decay=0.1)
    state = opt.init(x)
    for _ in range(50):
        g = jnp.zeros_like(x)  # only decay acts
        updates, state = opt.update(g, state, x)
        x = x + updates
    assert float(jnp.abs(x).max()) < 10.0


def _tiny_task(**kwargs):
    cfg = dataclasses.replace(TransformerConfig.tiny(), dtype=jnp.float32)
    defaults = dict(
        cfg=cfg,
        optimizer=make_optimizer("adamw", 1e-3, grad_clip_norm=2.0),
    )
    defaults.update(kwargs)
    return DenseRetrieverTask(**defaults)


def _fake_batch(B, C, L=8, vocab=32, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda n: rng.integers(5, vocab, size=(n, L)).astype(np.int32)
    ctx_mask = np.zeros((B * C,), bool)
    ctx_mask[np.arange(B) * C + (C - 1)] = rng.random(B) < 0.3  # some dummies
    return {
        "query_ids": mk(B),
        "query_mask": np.ones((B, L), np.int32),
        "contexts_ids": mk(B * C),
        "contexts_mask": np.ones((B * C, L), np.int32),
        "pos_ctx_indices": (np.arange(B) * C).astype(np.int32),
        "scores": np.zeros((B, C), np.float32),
        "ctx_mask": ctx_mask,
    }


def test_train_step_learns():
    task = _tiny_task()
    batch = _fake_batch(8, 2)
    state = task.init_state(jax.random.PRNGKey(0), batch)
    step = task.make_train_step()
    sharded = task.shard(batch)
    losses = []
    for _ in range(30):
        state, metrics = step(state, sharded)
        losses.append(float(metrics["train_loss"]))
    assert losses[-1] < losses[0] * 0.7
    assert int(state.step) == 30


def test_sharded_equals_single_device():
    """The GSPMD global-batch loss == single-device loss on the same data,
    and one optimizer step produces identical params. This is the JAX
    replacement proof for the reference's all_gather+splice+DDP-average
    (dpr_task.py:163-196)."""
    batch = _fake_batch(8, 3, seed=1)

    task8 = _tiny_task(mesh=get_mesh(8))
    state8 = task8.init_state(jax.random.PRNGKey(0), batch)
    task1 = _tiny_task(mesh=get_mesh(1))
    state1 = task1.init_state(jax.random.PRNGKey(0), batch)
    # identical init (same seed) — sanity
    chex_equal = jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
            state8.params,
            state1.params,
        )
    )
    assert chex_equal

    # eval-path parity: loss and rank metrics
    eval8 = task8.make_eval_step()
    eval1 = task1.make_eval_step()
    m8 = jax.device_get(eval8(state8, task8.shard(batch)))
    m1 = jax.device_get(eval1(state1, task1.shard(batch)))
    np.testing.assert_allclose(m8["loss_sum"], m1["loss_sum"], rtol=2e-5)
    np.testing.assert_allclose(m8["rank_sum"], m1["rank_sum"])
    np.testing.assert_allclose(m8["mrr_sum"], m1["mrr_sum"], rtol=1e-6)

    # GRADIENT parity: one full train step (deterministic — tiny config has
    # zero dropout and both tasks fold the same rng). The mesh(8) program's
    # all_gather backward (reduce-scatter) must reproduce the mesh(1)
    # gradient arithmetic exactly — SURVEY §7's top hard part, replacing
    # the reference's detach-remote/splice-local + DDP grad averaging
    # (dpr_task.py:176-195).
    step8 = task8.make_train_step()
    step1 = task1.make_train_step()
    for _ in range(2):  # two steps so optimizer moments are exercised too
        state8, tm8 = step8(state8, task8.shard(batch))
        state1, tm1 = step1(state1, task1.shard(batch))
    np.testing.assert_allclose(
        float(tm8["train_loss"]), float(tm1["train_loss"]), rtol=2e-5
    )
    np.testing.assert_allclose(
        float(tm8["grad_norm"]), float(tm1["grad_norm"]), rtol=2e-5
    )
    flat8 = jax.tree_util.tree_leaves_with_path(state8.params)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(state1.params))
    assert flat8 and int(state8.step) == 2
    for path, leaf8 in flat8:
        np.testing.assert_allclose(
            np.asarray(leaf8),
            np.asarray(flat1[path]),
            rtol=3e-5,
            atol=1e-6,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}",
        )


def test_eval_metrics_aggregation():
    task = _tiny_task()
    batches = [_fake_batch(4, 2, seed=s) for s in range(3)]
    state = task.init_state(jax.random.PRNGKey(0), batches[0])
    result = task.run_eval(state, batches)
    assert result["query_count"] == 12
    assert 1.0 <= result["avg_rank"] <= 8.0
    assert 0.0 <= result["mrr"] <= 1.0
    assert 0.0 <= result["accuracy@1"] <= 1.0
    assert result["ctx_count"] <= 8


def test_full_corpus_eval_mode():
    """in_batch_eval=False: queries ranked against ALL eval contexts
    (reference _eval_epoch_end :264-302)."""
    task = _tiny_task(in_batch_eval=False)
    batches = [_fake_batch(4, 2, seed=s) for s in range(3)]
    state = task.init_state(jax.random.PRNGKey(0), batches[0])
    result = task.run_eval(state, batches)
    assert result["query_count"] == 12
    # ranks run over the 24-context global pool, not per-batch 8
    assert 1.0 <= result["avg_rank"] <= 24.0
    in_batch = _tiny_task(in_batch_eval=True)
    r2 = in_batch.run_eval(state, [_fake_batch(4, 2, seed=s) for s in range(3)])
    # global pool has more negatives -> avg rank can only get worse or equal
    assert result["avg_rank"] >= r2["avg_rank"] - 1e-6


def test_zero1_shards_opt_state_and_matches_replicated():
    """ZeRO-1 (reference fairscale ddp_sharded, conf/trainer/slurm.yaml:14):
    optimizer moments are sharded over the data axis — per-device moment
    memory drops by ~mesh size — while training stays numerically identical
    to the replicated path."""
    batch = _fake_batch(8, 2, seed=3)
    mesh = get_mesh(8)

    base = _tiny_task(mesh=mesh)
    szd = _tiny_task(mesh=mesh, zero1=True)
    sb = base.init_state(jax.random.PRNGKey(0), batch)
    sz = szd.init_state(jax.random.PRNGKey(0), batch)

    # per-device bytes of the optimizer state drop ~8x for divisible leaves
    def addressable_bytes(tree):
        leaves = [
            x for x in jax.tree_util.tree_leaves(tree) if hasattr(x, "addressable_shards")
        ]
        return sum(
            x.addressable_shards[0].data.nbytes for x in leaves
        ), len(leaves)

    rb, n_leaves = addressable_bytes(sb.opt_state)
    zb, _ = addressable_bytes(sz.opt_state)
    assert n_leaves > 0
    assert zb < rb / 4, (zb, rb)  # ~8x for moments, scalars stay replicated

    # sharded leaves really are laid out over the mesh
    shardings = {
        str(s.sharding.spec)
        for s in jax.tree_util.tree_leaves(sz.opt_state)
        if hasattr(s, "sharding") and s.ndim > 0
    }
    assert any("data" in sp for sp in shardings), shardings

    step_b = base.make_train_step()
    step_z = szd.make_train_step()
    for _ in range(3):
        sb, mb = step_b(sb, base.shard(batch))
        sz, mz = step_z(sz, szd.shard(batch))
    np.testing.assert_allclose(
        float(mb["train_loss"]), float(mz["train_loss"]), rtol=1e-6
    )
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(sb.params),
        jax.tree_util.tree_leaves_with_path(sz.params),
    ):
        # layout-dependent fusion gives ~1e-7 rounding differences
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}",
        )


def test_zero1_multivec_and_distill_smoke():
    import dataclasses as dc

    from dpr_scale_tpu.train.distill import DPRDistillTask
    from dpr_scale_tpu.train.multivec import MultiVecRetrieverTask

    mesh = get_mesh(8)
    cfg = dataclasses.replace(TransformerConfig.tiny(), dtype=jnp.float32)
    batch = _fake_batch(8, 2, seed=4)
    mv = MultiVecRetrieverTask(
        cfg=cfg, variant="colbert", tok_projection_dim=8,
        optimizer=make_optimizer("adamw", 1e-3), mesh=mesh, zero1=True,
    )
    st = mv.init_state(jax.random.PRNGKey(0), batch)
    st, m = mv.make_train_step()(st, mv.shard(batch), 0)
    assert np.isfinite(float(m["train_loss"]))

    dbatch = {
        "query_ids": batch["query_ids"],
        "query_mask": batch["query_mask"],
        "target_vectors": np.random.default_rng(0)
        .normal(size=(8, 16))
        .astype(np.float32),
    }
    dt = DPRDistillTask(
        cfg=cfg, optimizer=make_optimizer("adamw", 1e-3), mesh=mesh, zero1=True
    )
    sd = dt.init_state(jax.random.PRNGKey(0), dbatch)
    sd, md = dt.make_train_step()(sd, dt.shard(dbatch))
    assert np.isfinite(float(md["train_loss"]))


def test_zero1_checkpoint_roundtrip(tmp_path):
    """Orbax save/restore of a ZeRO-1 sharded TrainState: restored moments
    keep their sharding and training continues identically."""
    from dpr_scale_tpu.train.checkpoint import CheckpointManager

    batch = _fake_batch(8, 2, seed=5)
    mesh = get_mesh(8)
    task = _tiny_task(mesh=mesh, zero1=True)
    state = task.init_state(jax.random.PRNGKey(0), batch)
    step = task.make_train_step()
    state, _ = step(state, task.shard(batch))

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(int(state.step), state, metrics={"mrr": 0.5})
    mgr.close()

    task2 = _tiny_task(mesh=mesh, zero1=True)
    target = task2.init_state(jax.random.PRNGKey(1), batch)
    mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
    restored = mgr2.restore_last(target)
    mgr2.close()
    assert int(restored.step) == 1
    # sharding survived the roundtrip on at least the moment leaves
    specs = {
        str(x.sharding.spec)
        for x in jax.tree_util.tree_leaves(restored.opt_state)
        if hasattr(x, "sharding") and x.ndim > 0
    }
    assert any("data" in sp for sp in specs), specs
    # one more step from the restored state matches continuing the original
    s_a, m_a = step(state, task.shard(batch))
    s_b, m_b = task2.make_train_step()(restored, task2.shard(batch))
    np.testing.assert_allclose(
        float(m_a["train_loss"]), float(m_b["train_loss"]), rtol=1e-6
    )


def test_grad_cache_matches_monolithic_step():
    """grad_cache_chunks>1 must produce IDENTICAL training to the
    monolithic step (tiny config: zero dropout): GradCache re-derives the
    full-batch contrastive gradient from chunked encoding — unlike
    MultiSteps accumulation, which would lose cross-chunk negatives."""
    batch = _fake_batch(8, 3, seed=21)
    mono = _tiny_task()
    cache = _tiny_task(grad_cache_chunks=4)
    sm = mono.init_state(jax.random.PRNGKey(0), batch)
    sc = cache.init_state(jax.random.PRNGKey(0), batch)
    step_m = mono.make_train_step()
    step_c = cache.make_train_step()
    for _ in range(3):
        sm, mm = step_m(sm, mono.shard(batch))
        sc, mc = step_c(sc, cache.shard(batch))
        np.testing.assert_allclose(
            float(mc["train_loss"]), float(mm["train_loss"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(mc["grad_norm"]), float(mm["grad_norm"]), rtol=1e-4
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(sm.params), jax.tree_util.tree_leaves(sc.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_grad_cache_mesh_parity():
    """GradCache's strided chunking must be sharding-transparent:
    mesh(8) == mesh(1) params after real steps."""
    batch = _fake_batch(8, 2, seed=22)
    t8 = _tiny_task(grad_cache_chunks=2, mesh=get_mesh(8))
    t1 = _tiny_task(grad_cache_chunks=2, mesh=get_mesh(1))
    s8 = t8.init_state(jax.random.PRNGKey(0), batch)
    s1 = t1.init_state(jax.random.PRNGKey(0), batch)
    step8 = t8.make_train_step()
    step1 = t1.make_train_step()
    for _ in range(2):
        s8, m8 = step8(s8, t8.shard(batch))
        s1, m1 = step1(s1, t1.shard(batch))
    np.testing.assert_allclose(
        float(m8["train_loss"]), float(m1["train_loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s8.params), jax.tree_util.tree_leaves(s1.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
