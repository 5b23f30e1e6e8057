"""DPR bi-encoder training task: jitted SPMD train/eval steps.

Functional replacement for the reference ``DenseRetrieverTask``
(dpr_scale/task/dpr_task.py). One jitted program per step:

  encode queries+contexts -> global similarity -> masked temperature CE.

Batches arrive with their leading axes sharded over the mesh ``data`` axis
(see :mod:`dpr_scale_tpu.parallel.mesh`); params and optimizer state are
replicated. XLA GSPMD materializes the context all_gather over ICI inside
the step, and its backward reduce-scatter reproduces the gradient
averaging the reference gets from DDP (dpr_task.py:163-196) — verified
numerically in tests/test_train.py::test_sharded_equals_single_device.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dpr_scale_tpu.models.encoder import BiEncoder
from dpr_scale_tpu.models.transformer import TransformerConfig
from dpr_scale_tpu.parallel.mesh import (
    batch_sharding,
    get_mesh,
    place_opt_state,
    replicated,
    shard_batch,
)
from dpr_scale_tpu.train.loss import contrastive_loss, rank_metrics, similarity_scores


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    dropout_rng: jnp.ndarray


@dataclasses.dataclass
class DenseRetrieverTask:
    """Owns the BiEncoder, the optimizer, and the compiled step functions."""

    cfg: TransformerConfig
    projection_dim: int = 0
    shared_model: bool = True  # reference shared_model flag (dpr_task.py:66-71)
    softmax_temperature: float = 1.0
    k: int = 1  # accuracy@k
    in_batch_negatives: bool = True
    in_batch_eval: bool = True
    encoder_family: str = "dense"  # "dense" (CLS BiEncoder) | "splade"
    optimizer: Optional[optax.GradientTransformation] = None
    mesh: Optional[Any] = None
    zero1: bool = False  # ZeRO-1 optimizer-state sharding (reference
    # fairscale ddp_sharded, conf/trainer/slurm.yaml:14)
    dropout_rng_impl: str = "rbg"  # "rbg" = TPU-native bit generator for
    # dropout masks (threefry mask generation alone costs ~32%% of a
    # bert-base train step: measured 83ms vs 37ms per step at B=128);
    # "threefry" restores the jax default (partitionable/stable bits)
    grad_cache_chunks: int = 1  # >1: GradCache-style step — EXACT
    # large-batch contrastive gradients at chunk-bounded activation
    # memory. Plain accumulation (optax MultiSteps, the reference's
    # accumulate_grad_batches) loses cross-chunk in-batch negatives; this
    # keeps them: (1) encode the batch in a scanned chunk loop with no
    # grad graph, (2) differentiate the loss w.r.t. the full embedding
    # matrices (cheap: loss sees only (B, D)), (3) re-encode each chunk
    # under jax.vjp against its embedding-cotangent slice and accumulate
    # param grads. Identical gradients to the monolithic step (the loss
    # depends on params only through the embeddings; dropout bits are
    # chunk-seeded so phase 1 and phase 3 see the same masks). Cost:
    # one extra forward (~4/3 step FLOPs) for O(B/chunks) activations —
    # the batch sizes the reference could not fit (README.md:277-285).

    def __post_init__(self):
        if self.encoder_family == "splade":
            from dpr_scale_tpu.models.encoder import SpladeBiEncoder

            self.model = SpladeBiEncoder(self.cfg, shared=self.shared_model)
        else:
            self.model = BiEncoder(
                self.cfg, projection_dim=self.projection_dim, shared=self.shared_model
            )
        if self.optimizer is None:
            self.optimizer = optax.adamw(1e-5)
        if self.mesh is None:
            self.mesh = get_mesh()
        self._train_step = None
        self._eval_step = None
        self._opt_shardings = None

    # ------------------------------------------------------------------ #

    def init_state(self, rng: jax.Array, example_batch: Dict[str, np.ndarray]) -> TrainState:
        params_rng, dropout_rng = jax.random.split(rng)
        variables = self.model.init(
            {"params": params_rng},
            jnp.asarray(example_batch["query_ids"]),
            jnp.asarray(example_batch["query_mask"]),
            jnp.asarray(example_batch["contexts_ids"]),
            jnp.asarray(example_batch["contexts_mask"]),
            deterministic=True,
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
        """Warm-start params (reference pretrained_checkpoint_path, :73-79)."""
        params = jax.device_put(params, replicated(self.mesh))
        return state.replace(params=params)

    # ------------------------------------------------------------------ #


    def _step_dropout_rng(self, state):
        """Per-step dropout key; optionally re-wrapped for the TPU's fast
        native bit generator (mask bits then may differ across shardings
        and jax versions — fine for dropout noise)."""
        from dpr_scale_tpu.train.gradcache import wrap_rng

        step_rng = jax.random.fold_in(state.dropout_rng, state.step)
        return wrap_rng(step_rng, self.dropout_rng_impl)

    def _loss_fn(self, params, batch, dropout_rng):
        q_repr, c_repr = self.model.apply(
            {"params": params},
            batch["query_ids"],
            batch["query_mask"],
            batch["contexts_ids"],
            batch["contexts_mask"],
            deterministic=False,
            rngs={"dropout": dropout_rng},
        )
        loss, scores = contrastive_loss(
            q_repr,
            c_repr,
            batch["pos_ctx_indices"],
            batch["ctx_mask"],
            self.softmax_temperature,
            self.in_batch_negatives,
        )
        return loss, scores

    def _grad_cache_grads(self, params, batch, base_rng):
        """(loss, grads) with gradients EQUAL to the monolithic step but
        activation memory bounded by B/grad_cache_chunks (see the
        ``grad_cache_chunks`` field note and
        :mod:`dpr_scale_tpu.train.gradcache`)."""
        from dpr_scale_tpu.train.gradcache import grad_cache_grads, wrap_rng

        def encode_chunk(p, qi, qm, ci, cm, key):
            q_emb, c_emb = self.model.apply(
                {"params": p}, qi, qm, ci, cm,
                deterministic=False,
                rngs={"dropout": wrap_rng(key, self.dropout_rng_impl)},
            )
            return {"emb": q_emb}, {"emb": c_emb}

        def loss_on_reprs(q_full, c_full):
            loss, _scores = contrastive_loss(
                q_full["emb"], c_full["emb"],
                batch["pos_ctx_indices"], batch["ctx_mask"],
                self.softmax_temperature, self.in_batch_negatives,
            )
            return loss, {}

        loss, _aux, grads = grad_cache_grads(
            params, batch, base_rng, self.grad_cache_chunks,
            encode_chunk, loss_on_reprs,
        )
        return loss, grads

    def make_train_step(self) -> Callable:
        if self._train_step is not None:
            return self._train_step

        def train_step(state: TrainState, batch, epoch=0) -> Tuple[TrainState, Dict]:
            del epoch  # dense task has no epoch-dependent terms
            if self.grad_cache_chunks > 1:
                base = jax.random.fold_in(state.dropout_rng, state.step)
                loss, grads = self._grad_cache_grads(state.params, batch, base)
            else:
                step_rng = self._step_dropout_rng(state)
                (loss, _scores), grads = jax.value_and_grad(
                    self._loss_fn, has_aux=True
                )(state.params, batch, step_rng)
            updates, new_opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            if self._opt_shardings is not None:  # keep moments ZeRO-sharded
                new_opt_state = jax.tree_util.tree_map(
                    jax.lax.with_sharding_constraint,
                    new_opt_state,
                    self._opt_shardings,
                )
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                params=new_params, opt_state=new_opt_state, step=state.step + 1
            )
            metrics = {
                "train_loss": loss,
                "grad_norm": optax.global_norm(grads),
            }
            return new_state, metrics

        self._train_step = jax.jit(train_step, donate_argnums=(0,))
        return self._train_step

    def make_eval_step(self) -> Callable:
        if self._eval_step is not None:
            return self._eval_step

        def eval_step(state: TrainState, batch) -> Dict[str, jnp.ndarray]:
            q_repr, c_repr = self.model.apply(
                {"params": state.params},
                batch["query_ids"],
                batch["query_mask"],
                batch["contexts_ids"],
                batch["contexts_mask"],
                deterministic=True,
            )
            # eval always scores within the (global) eval batch, all ctxs
            # visible except dummies (reference _eval_step, :216-233)
            loss, scores = contrastive_loss(
                q_repr,
                c_repr,
                batch["pos_ctx_indices"],
                batch["ctx_mask"],
                self.softmax_temperature,
                in_batch_negatives=True,
            )
            metrics = rank_metrics(scores, batch["pos_ctx_indices"], self.k)
            metrics["loss_sum"] = loss * scores.shape[0]
            metrics["ctx_count"] = (
                jnp.asarray(scores.shape[1], jnp.float32)
                - jnp.sum(batch["ctx_mask"].astype(jnp.float32))
            )
            return metrics

        self._eval_step = jax.jit(eval_step)
        return self._eval_step

    # ------------------------------------------------------------------ #

    def shard(self, batch: Dict[str, np.ndarray]) -> Dict:
        return shard_batch(batch, self.mesh)

    def run_eval(self, state: TrainState, batches) -> Dict[str, float]:
        """Aggregate epoch metrics (reference _eval_epoch_end, :248-310).

        ``in_batch_eval=True``: per-batch scoring, summed counts.
        ``in_batch_eval=False``: collate every eval context across batches
        and rank each query against ALL of them (reference :264-302; the
        reference's cross-rank all_gather is unnecessary here — the host
        already sees the global batch in SPMD).
        """
        if not self.in_batch_eval:
            return self._run_eval_full(state, batches)
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

    def _make_full_eval_fns(self):
        """Cached jitted programs for full-corpus eval (rebuilding them per
        validation would recompile the encoder every time)."""
        if getattr(self, "_full_eval_fns", None) is not None:
            return self._full_eval_fns

        @jax.jit
        def encode(params, batch):
            return self.model.apply(
                {"params": params},
                batch["query_ids"],
                batch["query_mask"],
                batch["contexts_ids"],
                batch["contexts_mask"],
                deterministic=True,
            )

        @jax.jit
        def score_all(q_all, c_all, lab, mask):
            loss, scores = contrastive_loss(
                q_all, c_all, lab, mask, self.softmax_temperature, True
            )
            metrics = rank_metrics(scores, lab, self.k)
            metrics["loss"] = loss
            return metrics

        self._full_eval_fns = (encode, score_all)
        return self._full_eval_fns

    def _run_eval_full(self, state: TrainState, batches) -> Dict[str, float]:
        import numpy as np

        encode, score_all = self._make_full_eval_fns()
        q_parts, c_parts, labels, masks = [], [], [], []
        offset = 0
        for batch in batches:
            q, c = encode(state.params, self.shard(batch))
            q_parts.append(np.asarray(q))
            c_parts.append(np.asarray(c))
            labels.append(np.asarray(batch["pos_ctx_indices"]) + offset)
            masks.append(np.asarray(batch["ctx_mask"]))
            offset += c.shape[0]
        if not q_parts:
            return {}
        q_all = jnp.asarray(np.concatenate(q_parts))
        c_all = jnp.asarray(np.concatenate(c_parts))
        lab = jnp.asarray(np.concatenate(labels))
        mask = jnp.asarray(np.concatenate(masks))
        m = jax.device_get(score_all(q_all, c_all, lab, mask))
        nq = float(m["query_count"])
        return {
            "avg_rank": float(m["rank_sum"]) / nq,
            "mrr": float(m["mrr_sum"]) / nq,
            f"accuracy@{self.k}": float(m["hits_at_k"]) / nq,
            "ctx_count": float(c_all.shape[0]) - float(np.concatenate(masks).sum()),
            "loss": float(m["loss"]),
            "query_count": nq,
        }
