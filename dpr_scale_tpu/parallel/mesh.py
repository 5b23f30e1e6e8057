"""Device mesh + sharding helpers.

The reference's distributed runtime is NCCL DDP with a hand-written
all_gather/gradient-splice in the train step (dpr_scale/task/dpr_task.py:163-196)
plus fairscale ZeRO sharding. Here the whole thing is one SPMD program:

  * a 1-D ``data`` mesh axis over ICI (optionally a leading ``dcn`` axis for
    multi-slice — both collapse into the same batch-sharding rule);
  * batches are sharded on their leading axis; params/optimizer state are
    replicated (the encoders are <=BERT-large — model parallelism buys
    nothing at seq<=512, SURVEY.md §2.10);
  * the global similarity matrix ``Q @ C^T`` over the sharded batch makes
    XLA insert the all_gather of context embeddings over ICI; its transpose
    in the backward pass is the reduce-scatter that replaces both the
    reference's detach-remote/substitute-local trick and DDP grad averaging.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the first n) local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def zero1_shardings(opt_state, mesh: Mesh, axis_name: str = "data"):
    """ZeRO-1 sharding rules for an optax optimizer state.

    Each array leaf (AdamW/MADGRAD moments, MultiSteps accumulators) is
    sharded over the mesh's data axis along its largest evenly divisible
    dimension; scalars and indivisible leaves stay replicated. With params
    replicated and gradients already all-reduced by GSPMD, this makes the
    optimizer update compute shard-wise and all-gather only the param
    deltas — the fairscale ``ddp_sharded``/OSS semantics the reference
    trains with (conf/trainer/slurm.yaml:14), with per-device moment
    memory cut by ~mesh size.
    """
    n = mesh.devices.size

    def rule(leaf):
        shape = getattr(leaf, "shape", None)
        if shape:
            axes = sorted(range(len(shape)), key=lambda a: -shape[a])
            for ax in axes:
                if shape[ax] >= n and shape[ax] % n == 0:
                    spec = [None] * len(shape)
                    spec[ax] = axis_name
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, opt_state)


def place_opt_state(opt_state, mesh: Mesh, zero1: bool, axis_name: str = "data"):
    """Device-put an optimizer state replicated or ZeRO-1 sharded; returns
    (placed_state, shardings or None)."""
    if not zero1:
        return jax.device_put(opt_state, replicated(mesh)), None
    shardings = zero1_shardings(opt_state, mesh, axis_name)
    return (
        jax.tree_util.tree_map(jax.device_put, opt_state, shardings),
        shardings,
    )


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Device-put every array in the batch with its leading axis sharded.

    Training batches are sized global_batch = per_device_batch * mesh size;
    ragged tails (last eval batch) whose leading dim doesn't divide the
    mesh fall back to replication — numerically identical, just without
    the data-parallel speedup for that one batch.
    """
    n = mesh.devices.size
    sharded = batch_sharding(mesh, axis_name)
    repl = replicated(mesh)

    def put(x):
        divisible = hasattr(x, "shape") and x.ndim > 0 and x.shape[0] % n == 0
        return jax.device_put(x, sharded if divisible else repl)

    return jax.tree_util.tree_map(put, batch)
