"""Corpus / query embedding generation (reference GenerateEmbeddingsTask /
GenerateQueryEmbeddingsTask, dpr_scale/task/dpr_eval_task.py).

The reference runs a Lightning test loop per rank and pickles one fp32
torch tensor per rank as ``reps_{rank:04}.pkl`` (:40-49), queries as
``query_reps.pkl`` (:52-84), with contiguous rank shards so files
concatenate in corpus order.

Here encoding is one jitted step over the data mesh; the host streams
fixed-shape token batches in, pulls embeddings out asynchronously, and
writes shards:

  * interop format: ``reps_{shard:04}.pkl`` pickled numpy fp32 (readable
    wherever the reference's files are — numpy instead of torch tensors);
  * native format: ``reps_{shard:04}.npy`` packed fp16/fp32 + a JSON
    manifest with corpus offsets (``manifest.json``).
"""
from __future__ import annotations

import json
import os
import pickle
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import numpy as np

from dpr_scale_tpu.parallel.mesh import shard_batch


def save_embedding_shard(
    path_prefix: str,
    embeddings: np.ndarray,
    fmt: str = "pickle",
) -> str:
    """Write one embedding shard; returns the file path."""
    if fmt == "pickle":
        path = path_prefix + ".pkl"
        with open(path, "wb") as f:
            pickle.dump(np.ascontiguousarray(embeddings), f, protocol=4)
    elif fmt == "npy":
        path = path_prefix + ".npy"
        np.save(path, np.ascontiguousarray(embeddings))
    else:
        raise ValueError(f"unknown embedding format {fmt!r}")
    return path


def load_embedding_shard(path: str) -> np.ndarray:
    """Read one shard: .npy, or .pkl holding a numpy array or torch tensor."""
    if path.endswith(".npy"):
        return np.load(path)
    with open(path, "rb") as f:
        try:
            obj = pickle.load(f)
        except Exception:
            # torch-tensor pickles need torch's unpickling machinery
            import torch

            f.seek(0)
            obj = torch.load(f, map_location="cpu", weights_only=False)
    if hasattr(obj, "numpy"):  # torch tensor (reference writer)
        obj = obj.float().numpy()
    return np.asarray(obj)


def load_embedding_shards(ctx_embeddings_dir: str) -> List[Tuple[str, np.ndarray]]:
    """All ``reps_*`` shards in a directory, sorted by shard id."""
    names = sorted(
        n
        for n in os.listdir(ctx_embeddings_dir)
        if n.startswith("reps_") and (n.endswith(".pkl") or n.endswith(".npy"))
    )
    return [
        (n, load_embedding_shard(os.path.join(ctx_embeddings_dir, n))) for n in names
    ]


class ShardRowReader:
    """Random row access over the ``reps_*`` shards WITHOUT materializing
    the full fp32 corpus in RAM (a 21M x 768 corpus is ~64 GB — the
    in-RAM copy would undercut the int4/int8 capacity tiers this reader
    serves as the exact-rerank source for, MipsIndex.set_rerank).

    ``.npy`` shards are mmap'd directly (bytes page in on demand). For
    ``.pkl`` shards a sidecar fp32 ``.rerank.npy`` memmap is built ONCE
    per shard (streamed; peak RAM = one shard) and reused while the
    source pickle's (size, mtime) is unchanged.
    """

    def __init__(self, ctx_embeddings_dir: str):
        names = sorted(
            n
            for n in os.listdir(ctx_embeddings_dir)
            if n.startswith("reps_")
            and (n.endswith(".pkl") or n.endswith(".npy"))
            and not n.endswith(".rerank.npy")
        )
        if not names:
            raise FileNotFoundError(f"no reps_* shards in {ctx_embeddings_dir}")
        self._maps: List[np.ndarray] = []
        offsets = [0]
        for n in names:
            path = os.path.join(ctx_embeddings_dir, n)
            if n.endswith(".npy"):
                m = np.load(path, mmap_mode="r")
            else:
                m = self._pkl_sidecar(path)
            self._maps.append(m)
            offsets.append(offsets[-1] + m.shape[0])
        self._offsets = np.asarray(offsets, np.int64)
        self.num_rows = int(self._offsets[-1])
        self.dim = int(self._maps[0].shape[1])

    @staticmethod
    def _pkl_sidecar(path: str) -> np.ndarray:
        side = path + ".rerank.npy"
        st = os.stat(path)
        fp_path = side + ".fp"
        fp = f"{st.st_size}:{int(st.st_mtime)}"
        if os.path.exists(side) and os.path.exists(fp_path):
            if open(fp_path).read() == fp:
                return np.load(side, mmap_mode="r")
        arr = load_embedding_shard(path)
        mm = np.lib.format.open_memmap(
            side, mode="w+", dtype=np.float32, shape=arr.shape
        )
        mm[:] = arr
        mm.flush()
        del arr, mm
        with open(fp_path, "w") as f:
            f.write(fp)
        return np.load(side, mmap_mode="r")

    def __call__(self, ids: np.ndarray) -> np.ndarray:
        """rows_fn contract (MipsIndex.set_rerank): global row ids ->
        (M, D) fp32."""
        ids = np.asarray(ids, np.int64)
        out = np.empty((ids.size, self.dim), np.float32)
        shard_of = np.searchsorted(self._offsets, ids, side="right") - 1
        for si in np.unique(shard_of):
            sel = shard_of == si
            local = ids[sel] - self._offsets[si]
            out[sel] = self._maps[si][local]
        return out


class CorpusEncoder:
    """Drives a jitted encoder over batched corpus/query text.

    ``encode_fn(params, input_ids, attention_mask) -> (B, D)`` is built once
    from the task's model; double-buffering comes from dispatching the next
    device step before fetching the previous result.
    """

    def __init__(
        self,
        model,
        params,
        mesh,
        use_query_tower: bool = False,
        out_dtype=np.float32,
    ):
        """``out_dtype=np.float16`` casts embeddings ON DEVICE before the
        fetch — halves the device->host bytes (the dominant cost of corpus
        encoding over a slow host link) and the shard disk footprint; every
        shard consumer (MipsIndex.add, ShardRowReader, SPAR combination)
        upcasts to fp32 on read."""
        self.mesh = mesh
        self.params = params
        self.out_dtype = np.dtype(out_dtype)
        if model is None:
            return  # from_exported fills _encode
        method = "encode_query" if use_query_tower else "encode_context"
        half = self.out_dtype == np.float16

        def encode(params, input_ids, attention_mask):
            emb = model.apply(
                {"params": params},
                input_ids,
                attention_mask,
                deterministic=True,
                method=getattr(model, method),
            )
            import jax.numpy as jnp

            return emb.astype(jnp.float16) if half else emb

        self._encode = jax.jit(encode)

    @classmethod
    def from_exported(cls, exported_path: str, mesh) -> "CorpusEncoder":
        """Drive encoding from an AOT-exported StableHLO encoder (the
        reference's jit-checkpoint path, dpr_jit_eval_task.py). The
        exported fn has fixed batch/seq shapes; batches must match."""
        from dpr_scale_tpu.utils.export import load_exported_encoder

        call, params, meta = load_exported_encoder(exported_path)
        self = cls(None, params, mesh)
        self._encode = lambda p, ids, mask: call(p, ids, mask)
        self.exported_meta = meta
        return self

    def encode_batches(
        self, batches: Iterator[Dict[str, np.ndarray]]
    ) -> Tuple[np.ndarray, List[str]]:
        """Returns (embeddings (N, D) fp32, corpus_ids list).

        Padded tail rows (``pad_count``) are dropped on the host.
        """
        futures = []  # (device_array, pad_count, ids)
        out: List[np.ndarray] = []
        ids: List[str] = []

        def drain(f):
            emb, pad, bids = f
            emb = np.asarray(emb, dtype=self.out_dtype)
            n = emb.shape[0] - int(pad)
            out.append(emb[:n])
            if bids is not None:
                ids.extend(list(bids)[:n])

        for batch in batches:
            sb = shard_batch(
                {
                    "input_ids": batch["input_ids"],
                    "attention_mask": batch["attention_mask"],
                },
                self.mesh,
            )
            emb = self._encode(self.params, sb["input_ids"], sb["attention_mask"])
            futures.append((emb, batch.get("pad_count", 0), batch.get("corpus_ids")))
            if len(futures) > 2:  # keep device queue short, host lags behind
                drain(futures.pop(0))
        for f in futures:
            drain(f)
        if not out:
            return np.zeros((0, 0), np.float32), ids
        return np.concatenate(out, axis=0), ids

    def encode_to_dir(
        self,
        batches,
        output_dir: str,
        shard_id: int = 0,
        num_shards: int = 1,
        fmt: str = "pickle",
        corpus_offset: int = 0,
    ) -> str:
        """Encode one contiguous shard and write ``reps_{shard:04}``.

        Writes/updates ``manifest.json`` mapping shards to corpus row
        ranges so retrieval can map shard-local indices back to corpus ids.
        """
        os.makedirs(output_dir, exist_ok=True)
        emb, ids = self.encode_batches(batches)
        path = save_embedding_shard(
            os.path.join(output_dir, f"reps_{shard_id:04}"), emb, fmt
        )
        # shard jobs run CONCURRENTLY against one output_dir (task.shard=i,
        # one process per shard): the manifest read-modify-write is
        # flock-serialized and the replacement is an atomic rename, so
        # parallel encoders neither lose each other's entries nor expose
        # a half-written JSON to readers
        manifest_path = os.path.join(output_dir, "manifest.json")
        lock_path = manifest_path + ".lock"
        entry = {
            "file": os.path.basename(path),
            "rows": emb.shape[0],
            "dim": int(emb.shape[1]) if emb.ndim == 2 else 0,
            "corpus_offset": corpus_offset,
            "num_shards": num_shards,
        }
        import fcntl

        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            manifest = {}
            if os.path.exists(manifest_path):
                with open(manifest_path) as f:
                    manifest = json.load(f)
            manifest[str(shard_id)] = entry
            tmp = manifest_path + f".tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(manifest, f, indent=1)
            os.replace(tmp, manifest_path)
        return path
