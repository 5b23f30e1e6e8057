"""Training loop driver (the reference's ``Trainer.fit`` + ``test`` flow,
main.py:20-50, without Lightning): epochs of jitted train steps, validation
each epoch, checkpoint-best on the monitored metric, final test of the
best checkpoint."""
from __future__ import annotations

import time
from typing import Dict, Optional

import jax

from dpr_scale_tpu.train.checkpoint import CheckpointManager
from dpr_scale_tpu.train.task import DenseRetrieverTask, TrainState
from dpr_scale_tpu.utils.logging import MetricLogger


class Trainer:
    def __init__(
        self,
        task: DenseRetrieverTask,
        datamodule,
        checkpoint: Optional[CheckpointManager] = None,
        max_epochs: int = 1,
        max_steps: Optional[int] = None,
        log_every: int = 10,
        eval_every_steps: Optional[int] = None,
        logger: Optional[MetricLogger] = None,
        profile_dir: Optional[str] = None,
        lr_schedule=None,
    ):
        self.task = task
        self.dm = datamodule
        self.checkpoint = checkpoint
        self.max_epochs = max_epochs
        self.max_steps = max_steps
        self.log_every = log_every
        self.eval_every_steps = eval_every_steps
        self.log = logger or MetricLogger()
        self.profile_dir = profile_dir
        # lr_schedule: logged as the per-step ``lr`` metric (reference
        # LearningRateMonitor, main.py:31). The loop's global_step and the
        # optimizer's schedule count are restored from the SAME checkpoint,
        # so schedule(global_step) is the LR the update actually used — a
        # resume that restarted the schedule shows as an lr discontinuity.
        self.lr_schedule = lr_schedule
        self._last_validated_step = -1

    def total_steps(self) -> int:
        if self.max_steps:
            return self.max_steps
        return self.dm.steps_per_epoch() * self.max_epochs

    def fit(self, state: TrainState) -> TrainState:
        from dpr_scale_tpu.utils.profiling import trace_if

        with trace_if(self.profile_dir):
            return self._fit(state)

    def _fit(self, state: TrainState) -> TrainState:
        train_step = self.task.make_train_step()
        global_step = int(state.step)
        t0 = time.time()
        examples = 0
        import jax.numpy as jnp

        # resume: a restored state.step must CONTINUE the schedule, not
        # replay it — otherwise every supervise-requeue with --resume
        # retrains max_epochs more epochs at the decayed-floor LR.
        # Completed epochs are skipped outright; a mid-epoch restore
        # (eval_every_steps checkpoint) continues that epoch's data order
        # from the restored position. The skip happens at the sampler
        # INDEX level (train_batches(start_batch=...)): batches are pure
        # functions of (seed, epoch, position), so no host collate is paid
        # for the skipped prefix — a restore deep into a 28M-row epoch
        # used to replay hours of sampling+tokenization.
        steps_per_epoch = self.dm.steps_per_epoch()
        start_epoch = (
            min(global_step // steps_per_epoch, self.max_epochs)
            if steps_per_epoch
            else 0
        )
        skip = global_step - start_epoch * steps_per_epoch

        for epoch in range(start_epoch, self.max_epochs):
            epoch_arr = jnp.asarray(epoch, jnp.float32)  # traced: no retrace/epoch
            try:
                batches = self.dm.train_batches(epoch, start_batch=skip)
            except TypeError:  # datamodule without index-level skip support
                batches = self.dm.train_batches(epoch)
                for _ in range(skip):
                    next(batches, None)
            skip = 0
            for batch in batches:
                examples += len(batch.get("pos_ctx_indices", batch["query_ids"]))
                state, metrics = train_step(state, self.task.shard(batch), epoch_arr)
                global_step += 1
                if global_step % self.log_every == 0:
                    metrics = jax.device_get(metrics)
                    dt = time.time() - t0
                    scalars = {
                        "train_loss": float(metrics["train_loss"]),
                        "grad_norm": float(metrics["grad_norm"]),
                        "queries_per_s": examples / max(dt, 1e-9),
                    }
                    if self.lr_schedule is not None:
                        # schedule counts applied updates: global_step
                        # updates have been applied, the last at count
                        # global_step - 1
                        scalars["lr"] = float(self.lr_schedule(global_step - 1))
                    self.log.scalars(global_step, scalars)
                    t0, examples = time.time(), 0
                if self.eval_every_steps and global_step % self.eval_every_steps == 0:
                    self._validate(state, global_step)
                if self.max_steps and global_step >= self.max_steps:
                    self._validate(state, global_step)
                    return state
            self._validate(state, global_step)
        return state

    def _validate(self, state: TrainState, step: int) -> Dict[str, float]:
        if step == self._last_validated_step:
            # eval_every_steps landing on an epoch boundary (or max_steps)
            # would otherwise validate AND checkpoint the same step twice —
            # orbax rejects duplicate step saves
            return {}
        self._last_validated_step = step
        metrics = self.task.run_eval(state, self.dm.val_batches())
        if metrics:
            self.log.scalars(step, {f"valid_{k}": v for k, v in metrics.items()})
        if self.checkpoint is not None:
            self.checkpoint.save(step, state, metrics or {})
        return metrics

    def test(self, state: TrainState, restore_best: bool = True) -> Dict[str, float]:
        """Evaluate (the best checkpoint of) the model on the test split
        (reference main.py:44-50 re-tests ckpt_path='best')."""
        if restore_best and self.checkpoint is not None:
            try:
                state = self.checkpoint.restore(state)
            except FileNotFoundError:
                pass
        metrics = self.task.run_eval(state, self.dm.test_batches())
        if metrics:
            self.log.scalars(int(state.step), {f"test_{k}": v for k, v in metrics.items()})
        return metrics
