"""Train/test driver (reference dpr_scale/main.py).

Usage:
    python -m dpr_scale_tpu.cli.train --config conf/nq.yaml \
        trainer.max_steps=100 datamodule.batch_size=32
"""
from __future__ import annotations

import argparse

import jax

from dpr_scale_tpu.config import load_config
from dpr_scale_tpu.cli.common import (
    build_datamodule,
    build_lr_schedule,
    build_optimizer,
    build_task,
    build_tokenizer,
    check_vocab_compat,
)
from dpr_scale_tpu.train.checkpoint import CheckpointManager, load_params
from dpr_scale_tpu.train.loop import Trainer
from dpr_scale_tpu.utils.logging import MetricLogger


def main(argv=None):
    import os

    # escape hatch for CPU smoke runs / sweep subprocesses in environments
    # whose sitecustomize pre-selects an accelerator platform (the plain
    # JAX_PLATFORMS env var is consumed before we run; the live config
    # still wins as long as no computation has executed)
    if os.environ.get("DPR_FORCE_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["DPR_FORCE_PLATFORM"])

    from dpr_scale_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("--test-only", action="store_true")
    parser.add_argument(
        "--resume",
        action="store_true",
        help="restore the last checkpoint and continue training",
    )
    parser.add_argument(
        "--metrics-out",
        default=None,
        help="write the final test metrics as JSON (used by cli.sweep)",
    )
    parser.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    args = parser.parse_args(argv)
    cfg = load_config(args.config, args.overrides)

    from dpr_scale_tpu.parallel.launch import maybe_initialize_distributed

    if maybe_initialize_distributed():
        print(
            f"Initialized multi-host: process {jax.process_index()} of "
            f"{jax.process_count()}"
        )

    tokenizer = build_tokenizer(cfg)
    dm = build_datamodule(cfg, tokenizer)

    tr = cfg.trainer
    max_epochs = tr.get("max_epochs", 1)
    max_steps = tr.get("max_steps")
    if max_steps:
        total_steps = max_steps
    elif args.test_only:
        total_steps = 1  # schedule unused; avoids requiring a train set
    else:
        total_steps = dm.steps_per_epoch() * max_epochs
    print(
        f"Total {total_steps} training steps, {cfg.task.get('warmup_steps', 0)} warmup; "
        f"{jax.device_count()} devices"
    )

    optimizer = build_optimizer(cfg, total_steps)
    task = build_task(cfg, optimizer=optimizer, n_devices=tr.get("num_devices"))
    check_vocab_compat(tokenizer, task.cfg)

    ckpt_cfg = cfg.get("checkpoint_callback", {})
    checkpoint = None
    if ckpt_cfg.get("dirpath"):
        # overlap the tunneled-TPU downlink slow-start with compilation +
        # the first steps so the first checkpoint save runs at the warm
        # ~40 MB/s instead of ~0.3 MB/s (utils/transfer.py)
        from dpr_scale_tpu.utils.transfer import warm_device_to_host_async

        warm_device_to_host_async()
        checkpoint = CheckpointManager(
            ckpt_cfg["dirpath"],
            monitor=ckpt_cfg.get("monitor", "mrr"),
            mode=ckpt_cfg.get("mode", "max"),
            save_top_k=ckpt_cfg.get("save_top_k", 3),
            save_last=ckpt_cfg.get("save_last", True),
            async_save=ckpt_cfg.get("async_save", False),
        )

    logger = MetricLogger(
        jsonl_path=tr.get("metrics_jsonl"), tensorboard_dir=tr.get("tensorboard_dir")
    )
    trainer = Trainer(
        task,
        dm,
        checkpoint=checkpoint,
        max_epochs=max_epochs,
        max_steps=max_steps,
        log_every=tr.get("log_every", 10),
        eval_every_steps=tr.get("eval_every_steps"),
        logger=logger,
        profile_dir=tr.get("profile_dir"),
        lr_schedule=build_lr_schedule(cfg, total_steps),
    )

    # init from an example batch (shapes are static per config); built
    # synchronously so no prefetch worker is left abandoned
    example = dm.example_batch("test" if args.test_only else "train")
    state = task.init_state(jax.random.PRNGKey(cfg.get("seed", 0)), example)

    pretrained = cfg.task.get("pretrained_checkpoint_path")
    if pretrained:
        state = task.load_params(state, load_params(pretrained, state.params))
        print(f"Loaded params from {pretrained}")
    if args.resume and checkpoint is not None:
        try:
            state = checkpoint.restore_last(state)
            print(f"Resumed from last checkpoint at step {int(state.step)}")
        except FileNotFoundError:
            print("No last checkpoint found; starting fresh")

    def write_metrics(metrics):
        if args.metrics_out and metrics is not None:
            import json
            import os as _os

            _os.makedirs(_os.path.dirname(args.metrics_out) or ".", exist_ok=True)
            with open(args.metrics_out, "w") as f:
                json.dump({k: float(v) for k, v in metrics.items()}, f)

    if args.test_only:
        metrics = trainer.test(state, restore_best=False)
        print("test metrics:", metrics)
        write_metrics(metrics)
        return metrics

    state = trainer.fit(state)
    metrics = trainer.test(state)
    print("test metrics (best ckpt):", metrics)
    write_metrics(metrics)

    # params-only export of the best checkpoint for the encode/retrieve CLIs
    if checkpoint is not None:
        from dpr_scale_tpu.train.checkpoint import save_params

        try:
            best = checkpoint.restore(state)
        except FileNotFoundError:
            best = state
        export = ckpt_cfg.get("params_export") or f"{ckpt_cfg['dirpath']}/params_best"
        save_params(export, best.params)
        print(f"Exported best params to {export}")
    return metrics


if __name__ == "__main__":
    main()
