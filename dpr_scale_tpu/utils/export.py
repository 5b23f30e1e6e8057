"""Model export for deployment: AOT-serialized encoders + int8 weight
quantization.

Parity target: the reference's TorchScript export path
(``DenseRetrieverTask.to_torchscript``, dpr_scale/task/dpr_task.py:324-368,
and ``ScriptEncoder`` with dynamic int8 quantization, utils/utils.py:94-161).
TPU-native equivalents:

  * ``export_encoder`` — lower the jitted encode function with
    ``jax.export`` to serialized StableHLO bytes, hardware-retargetable and
    loadable without the Python model definition;
  * ``quantize_params`` / ``dequantize_params`` — weight-only int8
    (symmetric per-output-channel) for every Dense/DenseGeneral kernel,
    cutting checkpoint bytes ~4x (the analogue of torch dynamic
    quantization's int8 Linear weights).
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------- #
# AOT export


def export_encoder(
    encode_fn: Callable,
    params,
    batch_size: int,
    seq_len: int,
    path: str,
) -> str:
    """Serialize ``encode_fn(params, input_ids, attention_mask)`` at fixed
    shapes to ``<path>/encoder.stablehlo`` + pickled params."""
    os.makedirs(path, exist_ok=True)
    ids = jnp.zeros((batch_size, seq_len), jnp.int32)
    exported = jax.export.export(jax.jit(encode_fn))(params, ids, ids)
    blob = exported.serialize()
    with open(os.path.join(path, "encoder.stablehlo"), "wb") as f:
        f.write(blob)
    with open(os.path.join(path, "params.pkl"), "wb") as f:
        pickle.dump(jax.device_get(params), f, protocol=4)
    with open(os.path.join(path, "meta.pkl"), "wb") as f:
        pickle.dump({"batch_size": batch_size, "seq_len": seq_len}, f)
    return path


def load_exported_encoder(path: str) -> Tuple[Callable, Any, Dict]:
    """Load an exported encoder; returns (callable, params, meta). The
    callable runs the serialized computation — no model code needed."""
    with open(os.path.join(path, "encoder.stablehlo"), "rb") as f:
        exported = jax.export.deserialize(f.read())
    with open(os.path.join(path, "params.pkl"), "rb") as f:
        params = pickle.load(f)
    with open(os.path.join(path, "meta.pkl"), "rb") as f:
        meta = pickle.load(f)
    return exported.call, params, meta


# --------------------------------------------------------------------- #
# int8 weight-only quantization


def _is_kernel(path_tuple) -> bool:
    return path_tuple and path_tuple[-1] == "kernel"


def quantize_params(params) -> Dict:
    """Symmetric per-output-channel int8 for every 'kernel' leaf (>=2D)."""

    def quant(path, leaf):
        keys = tuple(getattr(p, "key", getattr(p, "idx", None)) for p in path)
        leaf = np.asarray(leaf)
        if not _is_kernel(keys) or leaf.ndim < 2 or leaf.dtype == np.int8:
            return {"dense": leaf}
        axes = tuple(range(leaf.ndim - 1))  # reduce all but output channel
        scale = np.maximum(np.abs(leaf).max(axis=axes), 1e-12) / 127.0
        q = np.clip(np.round(leaf / scale), -127, 127).astype(np.int8)
        return {"int8": q, "scale": scale.astype(np.float32)}

    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves = {jax.tree_util.keystr(p): quant(p, l) for p, l in flat[0]}
    return {"leaves": leaves, "treedef": flat[1]}


def dequantize_params(quantized: Dict, dtype=jnp.float32):
    leaves = []
    for _key, entry in quantized["leaves"].items():
        if "dense" in entry:
            leaves.append(jnp.asarray(entry["dense"]))
        else:
            deq = entry["int8"].astype(np.float32) * entry["scale"]
            leaves.append(jnp.asarray(deq, dtype))
    return jax.tree_util.tree_unflatten(quantized["treedef"], leaves)


def save_quantized(path: str, params) -> str:
    with open(path, "wb") as f:
        pickle.dump(quantize_params(params), f, protocol=4)
    return path


def load_quantized(path: str, dtype=jnp.float32):
    with open(path, "rb") as f:
        return dequantize_params(pickle.load(f), dtype)
