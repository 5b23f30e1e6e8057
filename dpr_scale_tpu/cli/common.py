"""Shared config -> object builders for the CLI entry points.

Replaces the reference's hydra.utils.instantiate wiring (main.py:20-32)
with an explicit registry — no ``_target_`` string rewriting
(anti-pattern noted in SURVEY.md §5).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from dpr_scale_tpu.config import Config
from dpr_scale_tpu.data.datamodule import DenseRetrieverDataModule
from dpr_scale_tpu.data.tokenize import HFTokenizer
from dpr_scale_tpu.models.transformer import TransformerConfig
from dpr_scale_tpu.optim import make_optimizer
from dpr_scale_tpu.parallel import get_mesh
from dpr_scale_tpu.train.schedule import linear_warmup_decay
from dpr_scale_tpu.train.task import DenseRetrieverTask

ARCH_PRESETS = {
    "tiny": TransformerConfig.tiny,
    "bert_base": TransformerConfig.bert_base,
    "bert_large": TransformerConfig.bert_large,
    "roberta_base": TransformerConfig.roberta_base,
}

_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}


def build_tokenizer(cfg: Config) -> HFTokenizer:
    t = cfg.task.transform
    return HFTokenizer(
        t.model_path,
        max_seq_len=t.get("max_seq_len", 256),
        pad_to_multiple=t.get("pad_to_multiple", 0),
    )


def build_model_config(cfg: Config) -> TransformerConfig:
    m = cfg.task.model
    base = ARCH_PRESETS[m.get("arch", "bert_base")]()
    overrides = {
        k: m[k]
        for k in (
            "vocab_size",
            "hidden_size",
            "num_layers",
            "num_heads",
            "intermediate_size",
            "max_position_embeddings",
            "hidden_dropout",
            "attention_dropout",
            "remat",
            "fused_attention",
            "fused_ffn",
        )
        if k in m
    }
    if "dtype" in m:
        overrides["dtype"] = _DTYPES[m.dtype]
    return dataclasses.replace(base, **overrides)


def check_vocab_compat(tokenizer, model_cfg) -> None:
    """Fail loudly when token ids can exceed the embedding table.

    torch crashes on an out-of-range embedding index; XLA gathers clamp or
    return garbage SILENTLY, surfacing as NaN losses several layers away —
    so the CLIs check up front."""
    inner = getattr(tokenizer, "tokenizer", tokenizer)
    # len() on an HF tokenizer counts added tokens too; .vocab_size is the
    # BASE vocab only, so len(tok) > tok.vocab_size is the common case
    # that would slip past a vocab_size-only check
    candidates = [getattr(inner, "vocab_size", None)]
    try:
        candidates.append(len(inner))
    except TypeError:
        pass
    sizes = [int(v) for v in candidates if v]
    if not sizes:
        import warnings

        warnings.warn(
            "check_vocab_compat: cannot determine the tokenizer vocab size; "
            "out-of-range token ids would surface as NaN losses (XLA gathers "
            "do not trap)."
        )
        return
    vs = max(sizes)
    if vs > model_cfg.vocab_size:
        raise ValueError(
            f"tokenizer vocab ({vs} ids incl. added tokens) exceeds model "
            f"vocab_size ({model_cfg.vocab_size}): token ids would index "
            f"past the embedding table, which XLA does not trap (it "
            f"surfaces as NaN losses). Set task.model.vocab_size={vs} or "
            f"use a matching tokenizer."
        )


def build_lr_schedule(cfg: Config, total_steps: int):
    """The LR schedule as a standalone fn (also used by the Trainer to log
    the per-step ``lr`` metric — the reference's LearningRateMonitor,
    main.py:31)."""
    o = cfg.task.optim
    return linear_warmup_decay(
        o.get("lr", 1e-5), cfg.task.get("warmup_steps", 0), total_steps
    )


def build_optimizer(cfg: Config, total_steps: int):
    o = cfg.task.optim
    schedule = build_lr_schedule(cfg, total_steps)
    return make_optimizer(
        name=o.get("name", "adamw"),
        learning_rate=schedule,
        weight_decay=o.get("weight_decay", 0.0),
        betas=tuple(o.get("betas", (0.9, 0.999))),
        eps=o.get("eps"),  # None = per-optimizer default (madgrad 1e-6)
        grad_clip_norm=cfg.trainer.get("gradient_clip_val"),
        accumulate_steps=cfg.trainer.get("accumulate_grad_batches", 1),
    )


def build_task(
    cfg: Config, optimizer=None, mesh=None, n_devices: Optional[int] = None
):
    """Task registry keyed on ``task.type``: dense (default) | multivec |
    distill (reference task classes, SURVEY.md §2.2)."""
    t = cfg.task
    mesh = mesh if mesh is not None else get_mesh(n_devices)
    task_type = t.get("type", "dense")
    # ZeRO-1 optimizer-state sharding — the reference's fairscale
    # ``strategy: ddp_sharded`` (conf/trainer/slurm.yaml:14, nq.yaml:30)
    zero1 = cfg.trainer.get("strategy", "ddp") in ("ddp_sharded", "zero1")
    if task_type == "multivec":
        from dpr_scale_tpu.train.multivec import MultiVecRetrieverTask

        return MultiVecRetrieverTask(
            cfg=build_model_config(cfg),
            variant=t.get("variant", "citadel"),
            tok_projection_dim=t.get("tok_projection_dim"),
            cls_projection_dim=t.get("cls_projection_dim"),
            add_cls=t.get("add_cls", False),
            query_topk=t.get("query_topk", 1),
            context_topk=t.get("context_topk", 1),
            shared_model=t.get("shared_model", True),
            query_pool=t.get("query_pool", "sum"),
            in_batch=t.get("in_batch", True),
            k=t.get("k", 1),
            query_expert_load_loss_coef=t.get("query_expert_load_loss_coef", 0.0),
            context_expert_load_loss_coef=t.get("context_expert_load_loss_coef", 0.0),
            query_router_marg_load_loss_coef=t.get(
                "query_router_marg_load_loss_coef", 0.0
            ),
            context_router_marg_load_loss_coef=t.get(
                "context_router_marg_load_loss_coef", 0.0
            ),
            anneal_factor=t.get("anneal_factor", 0.0),
            teacher_coef=t.get("teacher_coef", 0.0),
            tau=t.get("tau", 1.0),
            max_epochs=cfg.trainer.get("max_epochs", 1),
            optimizer=optimizer,
            mesh=mesh,
            zero1=zero1,
            grad_cache_chunks=t.get("grad_cache_chunks", 1),
        )
    if task_type == "distill":
        from dpr_scale_tpu.train.distill import DPRDistillTask

        return DPRDistillTask(
            cfg=build_model_config(cfg),
            projection_dim=t.model.get("projection_dim", 0),
            k=t.get("k", 1),
            optimizer=optimizer,
            mesh=mesh,
            zero1=zero1,
        )
    return DenseRetrieverTask(
        cfg=build_model_config(cfg),
        projection_dim=t.model.get("projection_dim", 0),
        shared_model=t.get("shared_model", True),
        softmax_temperature=t.get("softmax_temperature", 1.0),
        k=t.get("k", 1),
        in_batch_negatives=t.get("in_batch_negatives", True),
        in_batch_eval=t.get("in_batch_eval", True),
        encoder_family=t.model.get("family", "dense"),
        optimizer=optimizer,
        mesh=mesh,
        zero1=zero1,
        grad_cache_chunks=t.get("grad_cache_chunks", 1),
    )


def build_datamodule(cfg: Config, tokenizer: HFTokenizer):
    d = cfg.datamodule
    if cfg.task.get("type") == "distill":
        from dpr_scale_tpu.data.datamodule import DistillDataModule

        return DistillDataModule(
            tokenizer=tokenizer,
            train_path=d.get("train_path"),
            val_path=d.get("val_path"),
            test_path=d.get("test_path"),
            batch_size=d.get("batch_size", 8),
            pos_ctx_sample=d.get("pos_ctx_sample", True),
            drop_last=d.get("drop_last", True),
            seed=d.get("seed", 0),
        )
    return DenseRetrieverDataModule(
        tokenizer=tokenizer,
        train_path=d.get("train_path"),
        val_path=d.get("val_path"),
        test_path=d.get("test_path"),
        corpus_path=d.get("corpus_path"),
        batch_size=d.get("batch_size", 2),
        val_batch_size=d.get("val_batch_size", 0),
        test_batch_size=d.get("test_batch_size", 0),
        num_positive=d.get("num_positive", 1),
        num_negative=d.get("num_negative", 7),
        neg_ctx_sample=d.get("neg_ctx_sample", True),
        pos_ctx_sample=d.get("pos_ctx_sample", False),
        num_val_negative=d.get("num_val_negative", 7),
        num_test_negative=d.get("num_test_negative"),
        use_title=d.get("use_title", False),
        sep_token=d.get("sep_token"),
        rel_sample=d.get("rel_sample", False),
        drop_last=d.get("drop_last", True),
        seed=d.get("seed", 0),
        prefetch_batches=d.get("prefetch_batches", 2),
        num_workers=d.get("num_workers", 0),
        contiguous_chunks=d.get("contiguous_chunks", 0),
        query_max_seq_len=d.get("query_max_seq_len"),
        ctx_max_seq_len=d.get("ctx_max_seq_len"),
    )
