"""Embedding distillation: student query encoder regresses to teacher
vectors (reference DPRDistillTask, dpr_scale/task/dpr_distill_task.py):
MSE training loss (:158-169), in-batch target ranking at eval (:171-194).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from dpr_scale_tpu.models.encoder import DenseEncoder
from dpr_scale_tpu.models.transformer import TransformerConfig
from dpr_scale_tpu.parallel.mesh import (
    get_mesh,
    place_opt_state,
    replicated,
    shard_batch,
)
from dpr_scale_tpu.train.loss import rank_metrics
from dpr_scale_tpu.train.task import TrainState


@dataclasses.dataclass
class DPRDistillTask:
    cfg: TransformerConfig
    projection_dim: int = 0
    k: int = 1
    optimizer: Optional[optax.GradientTransformation] = None
    mesh: Optional[Any] = None
    zero1: bool = False  # ZeRO-1 optimizer-state sharding
    dropout_rng_impl: str = "rbg"  # TPU-native dropout bits (see task.py)

    def __post_init__(self):
        self.model = DenseEncoder(self.cfg, projection_dim=self.projection_dim)
        if self.optimizer is None:
            self.optimizer = optax.adamw(1e-5)
        if self.mesh is None:
            self.mesh = get_mesh()
        self._train_step = None
        self._eval_step = None
        self._opt_shardings = None

    def init_state(self, rng, example_batch) -> TrainState:
        params_rng, dropout_rng = jax.random.split(rng)
        variables = self.model.init(
            {"params": params_rng},
            jnp.asarray(example_batch["query_ids"]),
            jnp.asarray(example_batch["query_mask"]),
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

    def shard(self, batch):
        return shard_batch(batch, self.mesh)

    def _step_dropout_rng(self, state):
        step_rng = jax.random.fold_in(state.dropout_rng, state.step)
        if self.dropout_rng_impl == "rbg":
            data = jax.random.key_data(step_rng)
            step_rng = jax.random.wrap_key_data(jnp.tile(data, 2)[:4], impl="rbg")
        return step_rng

    def make_train_step(self) -> Callable:
        if self._train_step is not None:
            return self._train_step

        def loss_fn(params, batch, rng):
            pred = self.model.apply(
                {"params": params},
                batch["query_ids"],
                batch["query_mask"],
                deterministic=False,
                rngs={"dropout": rng},
            )
            return jnp.mean((pred - batch["target_vectors"]) ** 2)

        def train_step(state: TrainState, batch, epoch=0):
            del epoch
            rng = self._step_dropout_rng(state)
            loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
            updates, new_opt = self.optimizer.update(grads, state.opt_state, state.params)
            if self._opt_shardings is not None:  # keep moments ZeRO-sharded
                new_opt = jax.tree_util.tree_map(
                    jax.lax.with_sharding_constraint, new_opt, self._opt_shardings
                )
            new_params = optax.apply_updates(state.params, updates)
            return (
                state.replace(params=new_params, opt_state=new_opt, step=state.step + 1),
                {"train_loss": loss, "grad_norm": optax.global_norm(grads)},
            )

        self._train_step = jax.jit(train_step, donate_argnums=(0,))
        return self._train_step

    def make_eval_step(self) -> Callable:
        if self._eval_step is not None:
            return self._eval_step

        def eval_step(state: TrainState, batch):
            pred = self.model.apply(
                {"params": state.params}, batch["query_ids"], batch["query_mask"]
            )
            targets = batch["target_vectors"]
            scores = jnp.dot(pred, targets.T, preferred_element_type=jnp.float32)
            labels = jnp.arange(targets.shape[0])
            metrics = rank_metrics(scores, labels, self.k)
            metrics["loss_sum"] = jnp.mean((pred - targets) ** 2) * pred.shape[0]
            metrics["ctx_count"] = jnp.asarray(targets.shape[0], jnp.float32)
            return metrics

        self._eval_step = jax.jit(eval_step)
        return self._eval_step

    def run_eval(self, state, batches) -> Dict[str, float]:
        step = self.make_eval_step()
        totals: Dict[str, float] = {}
        n = 0
        for batch in batches:
            m = jax.device_get(step(state, self.shard(batch)))
            n += 1
            for key, val in m.items():
                totals[key] = totals.get(key, 0.0) + float(val)
        if not n:
            return {}
        nq = totals["query_count"]
        return {
            "avg_rank": totals["rank_sum"] / nq,
            "mrr": totals["mrr_sum"] / nq,
            f"accuracy@{self.k}": totals["hits_at_k"] / nq,
            "ctx_count": totals["ctx_count"] / n,
            "loss": totals["loss_sum"] / nq,
            "query_count": nq,
        }
