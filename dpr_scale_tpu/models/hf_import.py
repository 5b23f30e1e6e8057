"""HF / reference-checkpoint weight import into dpr_scale_tpu Flax params.

Converts a BERT/RoBERTa PyTorch ``state_dict`` (numpy-valued) into the
parameter pytree of :class:`~dpr_scale_tpu.models.transformer.TransformerEncoder`
/ :class:`~dpr_scale_tpu.models.encoder.DenseEncoder`. Needed for parity
evaluation against reference checkpoints (SURVEY.md §5 checkpoint/resume:
"a converter that reads reference .ckpt state_dict into Flax params is
required").

Accepted source layouts:
  * plain HF encoder: ``embeddings.*``, ``encoder.layer.N.*`` (optionally
    under a ``bert.``/``roberta.`` prefix);
  * reference Lightning task checkpoints: keys like
    ``query_encoder.transformer.embeddings...`` and
    ``context_encoder.transformer...`` with optional ``project.*`` heads
    (reference dpr_scale/task/dpr_task.py:55-81, models/hf_model.py:24-35).
"""
from __future__ import annotations

from typing import Dict, Mapping, Optional

import numpy as np

from dpr_scale_tpu.models.transformer import TransformerConfig


def _t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def torch_state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    """Detach a torch state_dict to fp32 numpy (torch import stays local)."""
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().float().numpy()
        out[k] = np.asarray(v)
    return out


def strip_prefix(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


def detect_encoder_prefix(sd: Mapping[str, np.ndarray]) -> str:
    # "transformer." variants: the reference HFEncoder nests its HF model
    # as self.transformer (hf_model.py:26) NEXT TO the projection head
    # (project.0/project.1) — the prefix must be detected here rather
    # than pre-stripped by callers, or the project.* keys get discarded
    for p in (
        "bert.", "roberta.", "model.",
        "transformer.", "transformer.bert.", "transformer.roberta.",
        "",
    ):
        if any(k.startswith(p + "embeddings.word_embeddings") for k in sd):
            return p
    raise ValueError("No BERT-style embeddings found in state dict")


def convert_encoder(
    sd: Mapping[str, np.ndarray], cfg: TransformerConfig
) -> Dict[str, dict]:
    """HF-layout encoder state dict -> TransformerEncoder param dict."""
    nh, hd = cfg.num_heads, cfg.hidden_size // cfg.num_heads
    H = cfg.hidden_size
    p: Dict[str, dict] = {}

    emb = lambda name: {"embedding": sd[f"embeddings.{name}.weight"]}
    p["word_embeddings"] = emb("word_embeddings")
    pos = sd["embeddings.position_embeddings.weight"]
    p["position_embeddings"] = {"embedding": pos[: cfg.max_position_embeddings]}
    if cfg.type_vocab_size > 0:
        p["token_type_embeddings"] = emb("token_type_embeddings")
    p["embeddings_ln"] = {
        "scale": sd["embeddings.LayerNorm.weight"],
        "bias": sd["embeddings.LayerNorm.bias"],
    }

    for i in range(cfg.num_layers):
        pre = f"encoder.layer.{i}."
        attn = {}
        for name in ("query", "key", "value"):
            w = sd[pre + f"attention.self.{name}.weight"]  # (H, H) out-major
            b = sd[pre + f"attention.self.{name}.bias"]
            attn[name] = {
                "kernel": _t(w).reshape(H, nh, hd),
                "bias": b.reshape(nh, hd),
            }
        wo = sd[pre + "attention.output.dense.weight"]  # (H, H)
        attn["output"] = {
            "kernel": _t(wo).reshape(nh, hd, H),
            "bias": sd[pre + "attention.output.dense.bias"],
        }
        layer = {
            "attention": attn,
            "attention_ln": {
                "scale": sd[pre + "attention.output.LayerNorm.weight"],
                "bias": sd[pre + "attention.output.LayerNorm.bias"],
            },
            "intermediate": {
                "kernel": _t(sd[pre + "intermediate.dense.weight"]),
                "bias": sd[pre + "intermediate.dense.bias"],
            },
            "ffn_output": {
                "kernel": _t(sd[pre + "output.dense.weight"]),
                "bias": sd[pre + "output.dense.bias"],
            },
            "output_ln": {
                "scale": sd[pre + "output.LayerNorm.weight"],
                "bias": sd[pre + "output.LayerNorm.bias"],
            },
        }
        p[f"layer_{i}"] = layer
    return p


def convert_dense_encoder(
    sd: Mapping[str, np.ndarray],
    cfg: TransformerConfig,
    projection_prefix: Optional[str] = "project.",
) -> Dict[str, dict]:
    """HF encoder + optional projection head -> DenseEncoder params."""
    enc_prefix = detect_encoder_prefix(sd)
    params: Dict[str, dict] = {
        "transformer": convert_encoder(strip_prefix(sd, enc_prefix), cfg)
    }
    if projection_prefix and f"{projection_prefix}weight" in sd:
        params["project"] = {
            "kernel": _t(sd[f"{projection_prefix}weight"]),
            "bias": sd[f"{projection_prefix}bias"],
        }
        # reference HFEncoder wraps Linear+LayerNorm in a Sequential named
        # `project.0` / `project.1` (hf_model.py:24-31)
    if projection_prefix and f"{projection_prefix}0.weight" in sd:
        params["project"] = {
            "kernel": _t(sd[f"{projection_prefix}0.weight"]),
            "bias": sd[f"{projection_prefix}0.bias"],
        }
        params["project_ln"] = {
            "scale": sd[f"{projection_prefix}1.weight"],
            "bias": sd[f"{projection_prefix}1.bias"],
        }
    return params


def convert_reference_biencoder_ckpt(
    sd: Mapping[str, np.ndarray], cfg: TransformerConfig, shared: bool
) -> Dict[str, dict]:
    """Reference DenseRetrieverTask state_dict -> BiEncoder params.

    Reference naming: ``query_encoder.*`` / ``context_encoder.*`` wrapping
    an HF model (``...transformer.embeddings...``) — dpr_task.py:55-81.
    """
    sd = {k[6:] if k.startswith("model.") else k: v for k, v in sd.items()}
    ctx_sd = strip_prefix(sd, "context_encoder.")
    if not ctx_sd:
        ctx_sd = strip_prefix(sd, "ctx_encoder.")
    # the reference nests its HF model under `.transformer` ALONGSIDE the
    # projection head (project.0/project.1): convert_dense_encoder
    # detects the nesting itself — pre-stripping "transformer." here
    # would silently drop the trained projection keys
    params = {"context_encoder": convert_dense_encoder(ctx_sd, cfg)}
    if not shared:
        q_sd = strip_prefix(sd, "query_encoder.")
        params["query_encoder"] = convert_dense_encoder(q_sd, cfg)
    return params


def load_hf_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load pytorch_model.bin / model.safetensors from a local directory."""
    import os

    st_path = os.path.join(path, "model.safetensors")
    bin_path = os.path.join(path, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        return dict(load_file(st_path))
    if os.path.exists(bin_path):
        import torch

        return torch_state_dict_to_numpy(
            torch.load(bin_path, map_location="cpu", weights_only=True)
        )
    raise FileNotFoundError(f"No model weights found under {path}")
