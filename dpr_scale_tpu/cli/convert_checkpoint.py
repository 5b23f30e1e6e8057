"""Convert reference dpr-scale / HuggingFace checkpoints to framework params.

Needed for parity evaluation against released reference checkpoints
(SURVEY.md §5: "a converter that reads reference .ckpt state_dict into
Flax params is required").

Supported inputs:
  * Lightning ``.ckpt`` from the reference DenseRetrieverTask (keys
    ``query_encoder.transformer...`` / ``context_encoder.transformer...``);
  * plain HF encoder dirs (pytorch_model.bin / model.safetensors).

Usage:
    python -m dpr_scale_tpu.cli.convert_checkpoint \
        --input checkpoint_best.ckpt --arch bert_base \
        --output /ckpt/converted [--separate-encoders]
    python -m dpr_scale_tpu.cli.convert_checkpoint \
        --input /hf/bert-base-uncased --arch bert_base --hf \
        --output /ckpt/bert_params
"""
from __future__ import annotations

import argparse

import jax.numpy as jnp

from dpr_scale_tpu.models.hf_import import (
    convert_dense_encoder,
    convert_reference_biencoder_ckpt,
    load_hf_checkpoint,
    torch_state_dict_to_numpy,
)
from dpr_scale_tpu.models.transformer import TransformerConfig
from dpr_scale_tpu.train.checkpoint import save_params

ARCHES = {
    "bert_base": TransformerConfig.bert_base,
    "bert_large": TransformerConfig.bert_large,
    "roberta_base": TransformerConfig.roberta_base,
    "tiny": TransformerConfig.tiny,
}


def main(argv=None):
    from dpr_scale_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--arch", default="bert_base", choices=sorted(ARCHES))
    parser.add_argument("--hf", action="store_true", help="input is an HF model dir")
    parser.add_argument(
        "--separate-encoders",
        action="store_true",
        help="reference ckpt trained with shared_model=false",
    )
    args = parser.parse_args(argv)
    cfg = ARCHES[args.arch]()

    if args.hf:
        sd = load_hf_checkpoint(args.input)
        params = {"context_encoder": convert_dense_encoder(sd, cfg)}
    else:
        import torch

        ckpt = torch.load(args.input, map_location="cpu", weights_only=False)
        sd = torch_state_dict_to_numpy(ckpt.get("state_dict", ckpt))
        params = convert_reference_biencoder_ckpt(
            sd, cfg, shared=not args.separate_encoders
        )
    save_params(args.output, params)
    n = sum(x.size for x in _leaves(params))
    print(f"Wrote {n:,} params to {args.output}")
    return params


def _leaves(tree):
    import jax

    return [jnp.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


if __name__ == "__main__":
    main()
