"""Multi-vector (CITADEL / COIL / ColBERT) scoring, losses, and training task.

Math parity with reference dpr_scale/task/citadel_task.py:

  * ``colbert_score``  (:155-166)  token-level similarity tensor;
  * ``coil_score``     (:168-189)  exact-token-id gating (x weights);
  * ``citadel_score``  (:191-213)  expert-id gating with routed weights;
  * ``pool``           (:223-228)  MaxSim over context tokens, sum/max over
                                   query tokens;
  * ``distilled_loss`` (:240-247)  temperature-softened soft-label CE;
  * router/expert contrastive losses + load-balancing & L1 regularizers
    with epoch annealing (:249-328).

The SPMD train step works on the global batch directly — the reference's
``distributed_gather``/``evenly_divisible_all_gather`` (:68-135) vanish
because every tensor is fixed-shape and GSPMD inserts the collectives.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dpr_scale_tpu.models.multivec import MultiVecEncoder
from dpr_scale_tpu.models.transformer import TransformerConfig
from dpr_scale_tpu.parallel.mesh import (
    get_mesh,
    place_opt_state,
    replicated,
    shard_batch,
)
from dpr_scale_tpu.train.loss import NEG_INF, rank_metrics
from dpr_scale_tpu.train.task import TrainState

# --------------------------------------------------------------------- #
# scoring


def colbert_score_inbatch(q_repr: Dict, c_repr: Dict) -> jnp.ndarray:
    """(Q, LQ, C, LC) token-similarity tensor (citadel_task.py:162-166)."""
    return jnp.einsum(
        "qld,cmd->qlcm", q_repr["expert_repr"], c_repr["expert_repr"],
        preferred_element_type=jnp.float32,
    )


def colbert_score_pairwise(q_repr: Dict, c_repr: Dict) -> jnp.ndarray:
    """(Q, LQ, M, LC) where contexts come in blocks of M per query."""
    Q, LQ, D = q_repr["expert_repr"].shape
    M = c_repr["expert_repr"].shape[0] // Q
    c = c_repr["expert_repr"].reshape(Q, M, -1, D)
    return jnp.einsum(
        "qld,qmcd->qlmc", q_repr["expert_repr"], c,
        preferred_element_type=jnp.float32,
    )


def coil_gate_inbatch(scores, q_repr, c_repr):
    """Zero out token pairs whose token ids differ (citadel_task.py:175-189)."""
    eq = q_repr["expert_ids"][:, :, None, None] == c_repr["expert_ids"][None, None, :, :]
    gate = eq.astype(scores.dtype)
    if "expert_weights" in q_repr:
        w = (
            q_repr["expert_weights"][:, :, None, None]
            * c_repr["expert_weights"][None, None, :, :]
        )
        gate = gate * w
    return scores * gate


def coil_gate_pairwise(scores, q_repr, c_repr):
    Q, LQ = q_repr["expert_ids"].shape
    M = c_repr["expert_ids"].shape[0] // Q
    cids = c_repr["expert_ids"].reshape(Q, M, -1)
    eq = q_repr["expert_ids"][:, :, None, None] == cids[:, None, :, :]
    gate = eq.astype(scores.dtype)
    if "expert_weights" in q_repr:
        cw = c_repr["expert_weights"].reshape(Q, M, -1)
        w = q_repr["expert_weights"][:, :, None, None] * cw[:, None, :, :]
        gate = gate * w
    return scores * gate  # (Q, LQ, M, LC)


def citadel_gate_inbatch(scores, q_repr, c_repr):
    """Routed-expert gating (citadel_task.py:197-213). scores (Q,LQ,C,LC) ->
    (Q, LQ*KQ, C, LC*KC)."""
    qid = q_repr["expert_ids"]  # (Q, LQ, KQ)
    cid = c_repr["expert_ids"]  # (C, LC, KC)
    eq = (
        qid[:, :, :, None, None, None] == cid[None, None, None, :, :, :]
    )  # (Q, LQ, KQ, C, LC, KC)
    w = (
        q_repr["expert_weights"][:, :, :, None, None, None]
        * c_repr["expert_weights"][None, None, None, :, :, :]
    )
    gate = jnp.where(eq, w, 0.0)
    s = scores[:, :, None, :, :, None] * gate
    Q, LQ, KQ, C, LC, KC = s.shape
    return s.reshape(Q, LQ * KQ, C, LC * KC)


def citadel_gate_pairwise(scores, q_repr, c_repr):
    qid = q_repr["expert_ids"]  # (Q, LQ, KQ)
    Q, LQ, KQ = qid.shape
    M = c_repr["expert_ids"].shape[0] // Q
    cid = c_repr["expert_ids"].reshape(Q, M, -1, c_repr["expert_ids"].shape[-1])
    cw = c_repr["expert_weights"].reshape(Q, M, -1, c_repr["expert_weights"].shape[-1])
    eq = (
        qid[:, None, :, :, None, None] == cid[:, :, None, None, :, :]
    )  # (Q, M, LQ, KQ, LC, KC)
    w = (
        q_repr["expert_weights"][:, None, :, :, None, None]
        * cw[:, :, None, None, :, :]
    )
    gate = jnp.where(eq, w, 0.0).transpose(0, 2, 3, 1, 4, 5)  # (Q,LQ,KQ,M,LC,KC)
    s = scores[:, :, None, :, :, None] * gate
    Q, LQ, KQ, M, LC, KC = s.shape
    return s.reshape(Q, LQ * KQ, M, LC * KC)


def expert_sim_score(
    q_repr: Dict,
    c_repr: Dict,
    ctx_mask: Optional[jnp.ndarray] = None,
    pairwise: bool = False,
    query_pool: str = "sum",
) -> jnp.ndarray:
    """Late-interaction score matrix (Q, C) or (Q, M) (citadel_task.py:215-238)."""
    variant_citadel = "expert_ids" in q_repr and q_repr["expert_ids"].ndim == 3
    variant_coil = "expert_ids" in q_repr and q_repr["expert_ids"].ndim == 2
    if pairwise:
        scores = colbert_score_pairwise(q_repr, c_repr)
        if variant_coil:
            scores = coil_gate_pairwise(scores, q_repr, c_repr)
        elif variant_citadel:
            scores = citadel_gate_pairwise(scores, q_repr, c_repr)
    else:
        scores = colbert_score_inbatch(q_repr, c_repr)
        if variant_coil:
            scores = coil_gate_inbatch(scores, q_repr, c_repr)
        elif variant_citadel:
            scores = citadel_gate_inbatch(scores, q_repr, c_repr)

    scores = jnp.max(scores, axis=-1)  # MaxSim over context tokens
    if query_pool == "sum":
        scores = jnp.sum(scores, axis=1)
    elif query_pool == "max":
        scores = jnp.max(scores, axis=1)
    else:
        raise ValueError("query_pool must be sum or max")

    if ctx_mask is not None:
        if pairwise:
            mask2d = ctx_mask.reshape(scores.shape[0], -1)
        else:
            mask2d = ctx_mask[None, :]
        scores = jnp.where(mask2d, NEG_INF, scores)
    return scores


def dot_score(q, c, ctx_mask=None, pairwise=False):
    """Single-vector similarity (router/CLS), in-batch or block-pairwise
    (citadel_task.py:137-153)."""
    if pairwise:
        M = c.shape[0] // q.shape[0]
        cc = c.reshape(q.shape[0], M, -1)
        scores = jnp.einsum("qd,qmd->qm", q, cc, preferred_element_type=jnp.float32)
        if ctx_mask is not None:
            scores = jnp.where(ctx_mask.reshape(q.shape[0], M), NEG_INF, scores)
    else:
        scores = jnp.dot(q, c.T, preferred_element_type=jnp.float32)
        if ctx_mask is not None:
            scores = jnp.where(ctx_mask[None, :], NEG_INF, scores)
    return scores


def distilled_loss(input_logits, target_logits):
    """Soft-label CE (citadel_task.py:240-247), max-shifted for stability."""
    input_logits = input_logits - jax.lax.stop_gradient(
        jnp.max(input_logits, axis=-1, keepdims=True)
    )
    target_logits = target_logits - jax.lax.stop_gradient(
        jnp.max(target_logits, axis=-1, keepdims=True)
    )
    input_probs = jax.nn.softmax(input_logits, axis=-1)
    target_probs = jax.nn.softmax(target_logits, axis=-1)
    return -jnp.mean(jnp.sum(target_probs * jnp.log(input_probs + 1e-6), axis=-1))


def softmax_ce(scores, labels):
    logp = jax.nn.log_softmax(scores, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


# --------------------------------------------------------------------- #
# task


@dataclasses.dataclass
class MultiVecRetrieverTask:
    """CITADEL/COIL/ColBERT training (reference MultiVecRetrieverTask)."""

    cfg: TransformerConfig
    variant: str = "citadel"
    tok_projection_dim: Optional[int] = None
    cls_projection_dim: Optional[int] = None
    add_cls: bool = False
    query_topk: int = 1
    context_topk: int = 1
    shared_model: bool = True
    query_pool: str = "sum"
    in_batch: bool = True
    k: int = 1
    # regularizer coefficients (citadel_task.py:283-328)
    query_expert_load_loss_coef: float = 0.0
    context_expert_load_loss_coef: float = 0.0
    query_router_marg_load_loss_coef: float = 0.0
    context_router_marg_load_loss_coef: float = 0.0
    anneal_factor: float = 0.0
    teacher_coef: float = 0.0
    tau: float = 1.0
    max_epochs: int = 1
    optimizer: Optional[optax.GradientTransformation] = None
    mesh: Optional[Any] = None
    zero1: bool = False  # ZeRO-1 optimizer-state sharding
    dropout_rng_impl: str = "rbg"  # TPU-native dropout bits (see task.py)
    grad_cache_chunks: int = 1  # >1: GradCache-style step (see
    # DenseRetrieverTask.grad_cache_chunks). Multi-vector variant: the
    # cache carries the model's DICT outputs — every float batch-leading
    # leaf (token reprs, router planes, expert weights, masks) is
    # differentiated through in phase 2 and fed back as a cotangent in
    # phase 3; integer routing ids are cached as loss constants (top_k
    # indices carry no gradient in the monolithic step either). The
    # batch-max router stats (avg_marg_num_experts is a max over the
    # GLOBAL batch) are recomputed from the unchunked router_mask so
    # metrics match the monolithic step exactly. Activation memory drops
    # to O(B/chunks); the cache itself is token-level — (B, T, D) reprs
    # plus (B, V) router planes for CITADEL — small next to the trunk's
    # per-layer activations.

    def __post_init__(self):
        self.model = MultiVecEncoder(
            self.cfg,
            variant=self.variant,
            tok_projection_dim=self.tok_projection_dim,
            cls_projection_dim=self.cls_projection_dim,
        )
        if self.optimizer is None:
            self.optimizer = optax.adamw(1e-5)
        if self.mesh is None:
            self.mesh = get_mesh()
        self._train_step = None
        self._eval_step = None
        self._opt_shardings = None

    # -------------------------------------------------------------- #

    def _encode(self, params, batch, dropout_rng, deterministic):
        rngs = None if deterministic else {"dropout": dropout_rng}
        q_repr = self.model.apply(
            {"params": params},
            batch["query_ids"],
            batch["query_mask"],
            topk=self.query_topk,
            add_cls=self.add_cls,
            deterministic=deterministic,
            rngs=rngs,
        )
        c_repr = self.model.apply(
            {"params": params},
            batch["contexts_ids"],
            batch["contexts_mask"],
            topk=self.context_topk,
            add_cls=self.add_cls,
            deterministic=deterministic,
            rngs=rngs,
        )
        return q_repr, c_repr

    def _anneal(self, loss, epoch):
        if not self.anneal_factor:
            return loss
        coef = jnp.minimum(1.0, (epoch / self.max_epochs) ** self.anneal_factor)
        return coef * loss

    def compute_loss(
        self, q_repr, c_repr, ctx_mask, labels, teacher_scores, epoch
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        metrics: Dict[str, jnp.ndarray] = {}
        loss = 0.0
        pairwise_mode = not self.in_batch
        block_labels = jnp.zeros_like(labels) if pairwise_mode else labels

        if "router_repr" in c_repr:
            router_loss = 0.0
            if 1 - self.teacher_coef > 0:
                rs = dot_score(
                    q_repr["router_repr"], c_repr["router_repr"], ctx_mask,
                    pairwise=pairwise_mode,
                )
                router_loss = softmax_ce(rs, block_labels)
            if self.teacher_coef > 0:
                prs = dot_score(
                    q_repr["router_repr"], c_repr["router_repr"], ctx_mask,
                    pairwise=True,
                )
                router_loss = (1 - self.teacher_coef) * router_loss + (
                    self.teacher_coef
                    * distilled_loss(prs / self.tau, teacher_scores / self.tau)
                )
            metrics["router_loss"] = router_loss
            loss += router_loss

        if "expert_repr" in c_repr:
            expert_loss = 0.0
            if 1 - self.teacher_coef > 0:
                es = expert_sim_score(
                    q_repr, c_repr, ctx_mask, pairwise=pairwise_mode,
                    query_pool=self.query_pool,
                )
                if "cls_repr" in c_repr and not pairwise_mode:
                    es = es + dot_score(q_repr["cls_repr"], c_repr["cls_repr"], ctx_mask)
                expert_loss = softmax_ce(es, block_labels)
            if self.teacher_coef > 0:
                pes = expert_sim_score(
                    q_repr, c_repr, ctx_mask, pairwise=True,
                    query_pool=self.query_pool,
                )
                expert_loss = (1 - self.teacher_coef) * expert_loss + (
                    self.teacher_coef
                    * distilled_loss(pes / self.tau, teacher_scores / self.tau)
                )
            metrics["expert_loss"] = expert_loss
            loss += expert_loss

        # load balancing (router_marg): mean usage x mean softmax mass
        for side, repr_, coef in (
            ("query", q_repr, self.query_router_marg_load_loss_coef),
            ("context", c_repr, self.context_router_marg_load_loss_coef),
        ):
            if coef > 0 and "router_mask" in repr_:
                aux = coef * jnp.sum(
                    jnp.mean(repr_["router_mask"], axis=0)
                    * jnp.mean(repr_["router_softmax_repr"], axis=0)
                )
                aux = self._anneal(aux, epoch)
                metrics[f"{side}_router_marg_load_loss"] = aux
                loss += aux
        # L1 sparsity on expert weights
        for side, repr_, coef in (
            ("query", q_repr, self.query_expert_load_loss_coef),
            ("context", c_repr, self.context_expert_load_loss_coef),
        ):
            if coef > 0 and "expert_weights" in repr_:
                aux = coef * jnp.mean(jnp.sum(repr_["expert_weights"], axis=(1, 2)))
                aux = self._anneal(aux, epoch)
                metrics[f"{side}_expert_load_loss"] = aux
                loss += aux

        for side, repr_ in (("query", q_repr), ("context", c_repr)):
            if "avg_cond_num_experts" in repr_:
                metrics[f"avg_{side}_cond_num_experts"] = repr_["avg_cond_num_experts"]
                metrics[f"avg_{side}_marg_num_experts"] = repr_["avg_marg_num_experts"]
        return loss, metrics

    # -------------------------------------------------------------- #

    def init_state(self, rng, example_batch) -> TrainState:
        params_rng, dropout_rng = jax.random.split(rng)
        variables = self.model.init(
            {"params": params_rng},
            jnp.asarray(example_batch["query_ids"]),
            jnp.asarray(example_batch["query_mask"]),
            topk=self.query_topk,
            add_cls=self.add_cls,
        )
        params = variables["params"]
        opt_state, self._opt_shardings = place_opt_state(
            self.optimizer.init(params), self.mesh, self.zero1
        )
        return TrainState(
            params=jax.device_put(params, replicated(self.mesh)),
            opt_state=opt_state,
            step=jax.device_put(jnp.zeros([], jnp.int32), replicated(self.mesh)),
            dropout_rng=jax.device_put(dropout_rng, replicated(self.mesh)),
        )

    def load_params(self, state: TrainState, params) -> TrainState:
        return state.replace(params=jax.device_put(params, replicated(self.mesh)))

    def shard(self, batch):
        return shard_batch(batch, self.mesh)

    def _step_dropout_rng(self, state):
        from dpr_scale_tpu.train.gradcache import wrap_rng

        step_rng = jax.random.fold_in(state.dropout_rng, state.step)
        return wrap_rng(step_rng, self.dropout_rng_impl)

    def _grad_cache_grads(self, params, batch, base_rng, epoch):
        """(loss, metrics, grads) equal to the monolithic step at
        O(B/grad_cache_chunks) activation memory — the dict-output form
        of :mod:`dpr_scale_tpu.train.gradcache` (see the
        ``grad_cache_chunks`` field note)."""
        from dpr_scale_tpu.train.gradcache import grad_cache_grads, wrap_rng

        def encode_chunk(p, qi, qm, ci, cm, key):
            rngs = {"dropout": wrap_rng(key, self.dropout_rng_impl)}
            q_repr = self.model.apply(
                {"params": p}, qi, qm, topk=self.query_topk,
                add_cls=self.add_cls, deterministic=False, rngs=rngs,
            )
            c_repr = self.model.apply(
                {"params": p}, ci, cm, topk=self.context_topk,
                add_cls=self.add_cls, deterministic=False, rngs=rngs,
            )
            return q_repr, c_repr

        def loss_on_reprs(q_full, c_full):
            q_full, c_full = dict(q_full), dict(c_full)
            for full in (q_full, c_full):
                if "router_mask" in full:
                    # batch stats recomputed EXACTLY from the unchunked
                    # plane (avg_marg is a max over the GLOBAL batch, so
                    # per-chunk values cannot be averaged)
                    rm = full["router_mask"]
                    full["avg_cond_num_experts"] = jnp.mean(jnp.sum(rm, axis=1))
                    full["avg_marg_num_experts"] = jnp.sum(jnp.max(rm, axis=0))
            return self.compute_loss(
                q_full,
                c_full,
                batch["ctx_mask"],
                batch["pos_ctx_indices"],
                batch["scores"],
                epoch,
            )

        return grad_cache_grads(
            params, batch, base_rng, self.grad_cache_chunks,
            encode_chunk, loss_on_reprs,
        )

    def make_train_step(self) -> Callable:
        if self._train_step is not None:
            return self._train_step

        def loss_fn(params, batch, dropout_rng, epoch):
            q_repr, c_repr = self._encode(params, batch, dropout_rng, False)
            return self.compute_loss(
                q_repr,
                c_repr,
                batch["ctx_mask"],
                batch["pos_ctx_indices"],
                batch["scores"],
                epoch,
            )

        def train_step(state: TrainState, batch, epoch=0):
            if self.grad_cache_chunks > 1:
                base = jax.random.fold_in(state.dropout_rng, state.step)
                loss, metrics, grads = self._grad_cache_grads(
                    state.params, batch, base, epoch
                )
            else:
                step_rng = self._step_dropout_rng(state)
                (loss, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params, batch, step_rng, epoch)
            updates, new_opt = self.optimizer.update(grads, state.opt_state, state.params)
            if self._opt_shardings is not None:  # keep moments ZeRO-sharded
                new_opt = jax.tree_util.tree_map(
                    jax.lax.with_sharding_constraint, new_opt, self._opt_shardings
                )
            new_params = optax.apply_updates(state.params, updates)
            metrics["train_loss"] = loss
            metrics["grad_norm"] = optax.global_norm(grads)
            return (
                state.replace(params=new_params, opt_state=new_opt, step=state.step + 1),
                metrics,
            )

        self._train_step = jax.jit(train_step, donate_argnums=(0,))
        return self._train_step

    def make_eval_step(self) -> Callable:
        if self._eval_step is not None:
            return self._eval_step

        def eval_step(state: TrainState, batch):
            q_repr, c_repr = self._encode(state.params, batch, None, True)
            scores = expert_sim_score(
                q_repr, c_repr, batch["ctx_mask"], query_pool=self.query_pool
            )
            if "cls_repr" in q_repr:
                scores = scores + dot_score(
                    q_repr["cls_repr"], c_repr["cls_repr"], batch["ctx_mask"]
                )
            labels = batch["pos_ctx_indices"]
            metrics = rank_metrics(scores, labels, self.k)
            metrics["loss_sum"] = softmax_ce(scores, labels) * scores.shape[0]
            metrics["ctx_count"] = jnp.asarray(
                scores.shape[1], jnp.float32
            ) - jnp.sum(batch["ctx_mask"].astype(jnp.float32))
            return metrics

        self._eval_step = jax.jit(eval_step)
        return self._eval_step

    def run_eval(self, state: TrainState, batches) -> Dict[str, float]:
        step = self.make_eval_step()
        totals: Dict[str, float] = {}
        n_batches = 0
        for batch in batches:
            m = jax.device_get(step(state, self.shard(batch)))
            n_batches += 1
            for key, val in m.items():
                totals[key] = totals.get(key, 0.0) + float(val)
        if not n_batches:
            return {}
        nq = totals["query_count"]
        return {
            "avg_rank": totals["rank_sum"] / nq,
            "mrr": totals["mrr_sum"] / nq,
            f"accuracy@{self.k}": totals["hits_at_k"] / nq,
            "ctx_count": totals["ctx_count"] / n_batches,
            "loss": totals["loss_sum"] / nq,
            "query_count": nq,
        }
