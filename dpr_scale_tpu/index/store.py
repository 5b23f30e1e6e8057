"""Prequantized int8 index store: build once, serve many times.

The reference rebuilds its FAISS index from the fp32 embedding pickles on
every retrieval run (run_retrieval.py:48-57) — at the 21M north-star
corpus that is a ~64 GB read plus quantization work per process start.
This module persists the int8 serving representation (column-equalized
per-row symmetric planes + scales, exactly what ``MipsIndex.add`` computes
for ``method="int8"``) as raw ``.npy`` blocks plus a manifest:

  store_dir/
    manifest.json            # dim, blocks, pad geometry, source fingerprint
    block_0000.q8.npy        # (n_pad, D) int8
    block_0000.sc.npy        # (n_pad,)  fp32 per-row scales
    block_0000.col.npy       # (D,)      fp32 per-column equalization
    ...

Cold-start wins: 4x less disk read than the fp32 pickles, zero
quantization work, and the host tier loads with ``mmap_mode="r"`` so a
>HBM corpus pages in lazily during the first streamed sweep instead of
being copied into RAM up front. The manifest fingerprints the source
shards (name/size/mtime), so a stale store is detected and rebuilt
rather than silently served.

Blocks are padded to a device-count-agnostic multiple (default 8192 =
64 devices x 128 rows), so one store serves any mesh up to that width;
pad rows carry q8=0 / scale=1 and are masked by ``n_valid`` exactly as
in ``MipsIndex.add``.
"""
from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np

MANIFEST = "manifest.json"
STORE_VERSION = 1
DEFAULT_PAD_MULTIPLE = 8192  # rows: supports meshes up to 64 devices


def _source_fingerprint(ctx_embeddings_dir: str) -> List[dict]:
    names = sorted(
        n
        for n in os.listdir(ctx_embeddings_dir)
        if n.startswith("reps_") and (n.endswith(".pkl") or n.endswith(".npy"))
    )
    out = []
    for n in names:
        st = os.stat(os.path.join(ctx_embeddings_dir, n))
        out.append({"name": n, "size": st.st_size, "mtime": st.st_mtime})
    return out


def build_int8_store(
    ctx_embeddings_dir: str,
    store_dir: str,
    max_block_rows: int = 2_000_000,
    pad_multiple: int = DEFAULT_PAD_MULTIPLE,
) -> dict:
    """Quantize every reps_* shard into ``store_dir`` (host-side numpy
    only — no accelerator). Shards are streamed one at a time and
    re-chunked into blocks of at most ``max_block_rows`` (global row
    order preserved = corpus order, as the reference relies on).
    Returns the manifest dict."""
    from dpr_scale_tpu.encode.embeddings import load_embedding_shard

    fp = _source_fingerprint(ctx_embeddings_dir)
    if not fp:
        raise FileNotFoundError(f"no reps_* shards in {ctx_embeddings_dir}")
    os.makedirs(store_dir, exist_ok=True)

    blocks = []
    dim: Optional[int] = None
    pending: List[np.ndarray] = []  # leftover rows across shard boundaries
    pending_rows = 0

    def flush(final: bool):
        nonlocal pending, pending_rows
        while pending_rows >= max_block_rows or (final and pending_rows > 0):
            take = min(max_block_rows, pending_rows)
            parts, got = [], 0
            while got < take:
                head = pending[0]
                need = take - got
                if head.shape[0] <= need:
                    parts.append(head)
                    got += head.shape[0]
                    pending.pop(0)
                else:
                    parts.append(head[:need])
                    pending[0] = head[need:]
                    got += need
            pending_rows -= take
            n = take
            D = parts[0].shape[1]
            n_pad = (n + pad_multiple - 1) // pad_multiple * pad_multiple
            # chunked quantization: the obvious
            # `_quantize_int8_host(padded_copy)` holds ~3 full fp32 copies
            # of a 2M x 768 block (~18 GB peak) — a column-max pre-pass
            # plus fixed-size row chunks keeps the peak at one chunk,
            # bit-identical per-row math (same op order as
            # MipsIndex._quantize_int8_host)
            col = np.zeros((D,), np.float32)
            for part in parts:
                np.maximum(col, np.abs(part).max(axis=0), out=col)
            col[col == 0.0] = 1.0
            q8 = np.zeros((n_pad, D), np.int8)
            sc = np.ones((n_pad,), np.float32)  # pad rows: q8=0 / scale=1
            row0 = 0
            CH = 262_144
            for part in parts:
                for lo in range(0, part.shape[0], CH):
                    x = part[lo : lo + CH] / col[None, :]
                    s = np.abs(x).max(axis=1) / 127.0
                    s[s == 0.0] = 1.0
                    q8[row0 : row0 + x.shape[0]] = np.clip(
                        np.rint(x / s[:, None]), -127, 127
                    )
                    sc[row0 : row0 + x.shape[0]] = s
                    row0 += x.shape[0]
            assert row0 == n
            bi = len(blocks)
            np.save(os.path.join(store_dir, f"block_{bi:04}.q8.npy"), q8)
            np.save(os.path.join(store_dir, f"block_{bi:04}.sc.npy"), sc)
            np.save(os.path.join(store_dir, f"block_{bi:04}.col.npy"), col)
            blocks.append({"n_valid": int(n), "n_pad": int(n_pad)})

    for entry in fp:
        emb = np.asarray(
            load_embedding_shard(os.path.join(ctx_embeddings_dir, entry["name"])),
            np.float32,
        )
        if dim is None:
            dim = int(emb.shape[1])
        assert emb.shape[1] == dim, "inconsistent embedding dim across shards"
        pending.append(emb)
        pending_rows += emb.shape[0]
        flush(final=False)
    flush(final=True)

    manifest = {
        "version": STORE_VERSION,
        "method": "int8",
        "dim": dim,
        "pad_multiple": pad_multiple,
        "blocks": blocks,
        "source": fp,
    }
    with open(os.path.join(store_dir, MANIFEST), "w") as f:
        json.dump(manifest, f)
    return manifest


def store_is_current(store_dir: str, ctx_embeddings_dir: str) -> bool:
    """True iff ``store_dir`` holds a manifest built from exactly the
    reps_* shards currently in ``ctx_embeddings_dir``."""
    path = os.path.join(store_dir, MANIFEST)
    if not os.path.exists(path):
        return False
    try:
        with open(path) as f:
            manifest = json.load(f)
    except (OSError, ValueError):
        return False
    return (
        manifest.get("version") == STORE_VERSION
        and manifest.get("source") == _source_fingerprint(ctx_embeddings_dir)
    )


def load_int8_store(
    index,
    store_dir: str,
    device_rows: Optional[int] = None,
) -> None:
    """Populate an int8-mode ``MipsIndex`` from a store.

    Placement: host-resident indexes take every block as a host (mmap)
    tier; otherwise blocks go to the device until the optional
    ``device_rows`` budget is exhausted, and the remainder becomes the
    host-streamed tier (the hybrid 21M-on-one-chip layout of
    tools/bench_21m_rehearsal.py). mmap keeps cold-start O(manifest):
    host-tier bytes page in during the first sweep.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    with open(os.path.join(store_dir, MANIFEST)) as f:
        manifest = json.load(f)
    assert manifest["method"] == "int8" and index.method == "int8"
    ndev = index.ndev
    assert manifest["pad_multiple"] % (ndev * 128) == 0, (
        f"store pad_multiple {manifest['pad_multiple']} does not cover a "
        f"{ndev}-device mesh (needs a multiple of {ndev * 128})"
    )
    placed_dev = 0
    for bi, b in enumerate(manifest["blocks"]):
        q8 = np.load(os.path.join(store_dir, f"block_{bi:04}.q8.npy"), mmap_mode="r")
        sc = np.load(os.path.join(store_dir, f"block_{bi:04}.sc.npy"))
        col = np.load(os.path.join(store_dir, f"block_{bi:04}.col.npy"))
        to_device = not index.host_resident and (
            device_rows is None or placed_dev + b["n_pad"] <= device_rows
        )
        if to_device:
            row_sharded = NamedSharding(index.mesh, P("data", None))
            index.add_device_quantized(
                jax.device_put(jnp.asarray(q8), row_sharded),
                jax.device_put(
                    jnp.asarray(sc), NamedSharding(index.mesh, P("data"))
                ),
                n_valid=b["n_valid"],
                col_scales=jax.device_put(
                    jnp.asarray(col), NamedSharding(index.mesh, P(None))
                ),
            )
            placed_dev += b["n_pad"]
        else:
            index.add_host_quantized(
                q8, sc, n_valid=b["n_valid"], col_scales=col
            )
