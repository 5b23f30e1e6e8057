"""Exact MIPS engine: device-sharded brute-force top-k over embedding shards.

Replaces FAISS ``IndexFlatIP`` (reference run_retrieval.py:48-57,97) and the
torch einsum+topk searcher (run_retrieval_pytorch.py:141-190). TPU-native
design:

  * corpus rows live HBM-resident, sharded over the mesh ``data`` axis
    (row-sharded ``(N, D)``, bf16 by default, fp32 accumulation on the MXU);
  * one jitted search program: per-device scores ``Q @ C_localᵀ`` +
    per-device ``lax.top_k`` + cross-device gather + re-top-k — the
    all-device traffic is ``B x devices x k`` entries, never the full
    ``B x N`` score matrix;
  * corpora bigger than total HBM stream through as multiple host shards
    searched sequentially and k-way merged on the host (same shard-merge
    algorithm the reference implements in torch at
    run_retrieval_pytorch.py:210-230,272-277; merge itself is the native
    C++ heap in dpr_scale_tpu.utils.native).
"""
from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = jnp.float32(-1e30)


def merge_topk_batched(
    scores: np.ndarray, indices: np.ndarray, k: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Merge per-shard top-k lists for a batch of queries.

    scores/indices: (num_shards, B, k) -> (B, k) best-of-all-shards,
    sorted descending.
    """
    s = np.concatenate(list(scores), axis=1)  # (B, S*k)
    i = np.concatenate(list(indices), axis=1)
    if s.shape[1] > k:
        part = np.argpartition(-s, k - 1, axis=1)[:, :k]
        s = np.take_along_axis(s, part, axis=1)
        i = np.take_along_axis(i, part, axis=1)
    order = np.argsort(-s, kind="stable", axis=1)
    return np.take_along_axis(s, order, axis=1), np.take_along_axis(i, order, axis=1)


class MipsIndex:
    """Exact inner-product top-k over one or more embedding shards.

    ``add(embeddings)`` appends a host shard (rows indexed globally in
    insertion order, matching how the reference concatenates ``reps_*``
    files). ``search(queries, k)`` returns global (scores, indices).
    """

    def __init__(
        self,
        mesh: Mesh,
        dtype=jnp.bfloat16,
        max_device_rows: Optional[int] = None,
    ):
        self.mesh = mesh
        self.dtype = dtype
        self.ndev = mesh.devices.size
        # rows per resident block; blocks beyond this stream from host
        self.max_device_rows = max_device_rows
        self._blocks: List[Tuple[jax.Array, jax.Array, int, int]] = []
        # (embeddings (C_pad, D) sharded, valid (C_pad,1) sharded, n_valid, offset)
        self._total_rows = 0
        self._dim: Optional[int] = None

    # ------------------------------------------------------------------ #

    def _pad_rows(self, n: int) -> int:
        # keep per-device row counts MXU-friendly (multiples of 128)
        block = self.ndev * 128
        return (n + block - 1) // block * block

    def add(self, embeddings: np.ndarray) -> None:
        n, d = embeddings.shape
        if self._dim is None:
            self._dim = d
        assert d == self._dim, "inconsistent embedding dim across shards"
        n_pad = self._pad_rows(n)
        emb = np.zeros((n_pad, d), dtype=np.float32)
        emb[:n] = embeddings
        valid = np.zeros((n_pad, 1), dtype=np.bool_)
        valid[:n] = True
        row_sharded = NamedSharding(self.mesh, P("data", None))
        emb_dev = jax.device_put(jnp.asarray(emb, self.dtype), row_sharded)
        valid_dev = jax.device_put(jnp.asarray(valid), row_sharded)
        self._blocks.append((emb_dev, valid_dev, n, self._total_rows))
        self._total_rows += n

    @property
    def num_rows(self) -> int:
        return self._total_rows

    # ------------------------------------------------------------------ #

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def _search_block(self, emb, valid, queries, k):
        """One jitted program: sharded scores -> local top-k -> global re-top-k."""

        def local_topk(emb_l, valid_l, q):
            # emb_l: (C_local, D) this device's rows; q replicated (B, D)
            scores = jnp.dot(
                q.astype(self.dtype),
                emb_l.T,
                preferred_element_type=jnp.float32,
            )  # (B, C_local)
            scores = jnp.where(valid_l[:, 0][None, :], scores, NEG_INF)
            s, i = jax.lax.top_k(scores, k)  # (B, k) local
            shard = jax.lax.axis_index("data")
            i = i + shard * emb_l.shape[0]  # globalize within block
            return s, i

        from jax import shard_map

        s, i = shard_map(
            local_topk,
            mesh=self.mesh,
            in_specs=(P("data", None), P("data", None), P(None, None)),
            out_specs=(P(None, "data"), P(None, "data")),
        )(emb, valid, queries)
        # s/i: (B, ndev*k) concatenated local winners -> final top-k
        fs, fi_pos = jax.lax.top_k(s, k)
        fi = jnp.take_along_axis(i, fi_pos, axis=1)
        return fs, fi

    def search(self, queries: np.ndarray, k: int = 100) -> Tuple[np.ndarray, np.ndarray]:
        """Global top-k over all added shards. queries: (B, D) fp32."""
        assert self._blocks, "index is empty"
        k_eff = min(k, self._total_rows)
        q = jnp.asarray(queries, jnp.float32)
        q = jax.device_put(q, NamedSharding(self.mesh, P(None, None)))
        per_block_s, per_block_i = [], []
        for emb, valid, _n, offset in self._blocks:
            # never ask a block for more rows than every device holds
            k_block = min(k_eff, emb.shape[0] // self.ndev)
            s, i = self._search_block(emb, valid, q, k_block)
            s, i = np.asarray(s), np.asarray(i, dtype=np.int64) + offset
            if k_block < k_eff:  # pad so merge shapes agree
                pad = k_eff - k_block
                s = np.pad(s, ((0, 0), (0, pad)), constant_values=-np.inf)
                i = np.pad(i, ((0, 0), (0, pad)), constant_values=-1)
            per_block_s.append(s)
            per_block_i.append(i)
        if len(per_block_s) == 1:
            return per_block_s[0], per_block_i[0]
        return merge_topk_batched(
            np.stack(per_block_s), np.stack(per_block_i), k_eff
        )
