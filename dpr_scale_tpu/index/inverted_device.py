"""Device-resident CITADEL/COIL inverted-index search.

TPU-native layout for the posting lists of
:class:`dpr_scale_tpu.index.inverted.InvertedExpertIndex`:

  * experts are grouped into LENGTH BUCKETS (posting counts padded to the
    next bucket size), giving static shapes per bucket:
    ``vecs[b]: (experts_b, L_b, D)`` bf16, ``run_id[b]: (experts_b, L_b)``
    (per-expert doc-run segmentation, postings sorted by doc), and
    ``run_doc[b]: (experts_b, L_b)`` (the doc id of each run, -1 pad);
  * a query's routed (expert, weighted-vector) entries are grouped by
    bucket on the host and padded to powers of two; the WHOLE search is
    one jitted program: per bucket, gather posting blocks -> einsum
    scores (MXU) -> per-doc ``segment_max`` (the MaxSim inner max, with
    the training objective's zero floor) emitting flat (row, doc, value)
    updates; then ONE combined scatter-add into the dense accumulator
    (an XLA scatter pays a whole-operand rewrite regardless of update
    count, so exactly one per search) + optional CLS matmul + tiled
    exact top-k (tile maxima -> top-k tiles -> gather -> re-top-k; the
    group-max containment argument makes it exact, and it avoids
    ``lax.top_k``'s ~13 GB/s full-accumulator read);
  * with a multi-device mesh, the expert axis shards across devices
    (expert-parallel, see the class docstring).

This is the accelerator counterpart of the numpy search in
``inverted.py`` (reference behavior: the missing
dpr_scale.index.inverted_vector_index GPU classes,
citadel_retrieval_task.py:56-60) — consistency is tested against both the
host search and the training scorer.
"""
from __future__ import annotations

import collections
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BUCKET_SIZES = (128, 512, 2048, 8192, 32768, 131072)


def _bucket_for(n: int) -> int:
    for b in BUCKET_SIZES:
        if n <= b:
            return b
    return BUCKET_SIZES[-1]


TILE = 2048  # accumulator column tile for the tiled exact top-k

# streamed bucket scoring: entries per compute window / target bytes per
# posting-block DMA chunk (big contiguous chunks reach streaming-class
# HBM bandwidth where per-entry random DMAs measured 8-30 GB/s)
STREAM_M = 32
STREAM_CHUNK = 2 * 1024 * 1024

# scorer selection: "auto" picks PER BUCKET per search by the byte model
# below (einsum on CPU); "on" forces the streamed kernel everywhere
# (interpret-mode Pallas on CPU — the suite's coverage hook); "off"
# forces the per-entry DMA kernel on TPU
STREAM_MODE = "auto"

# Byte-model constant for "auto": the streamed scorer moves
# distinct_blocks * (G, TL, D) sequential bytes at streaming-class
# bandwidth, the per-entry DMA kernel moves n_pad * (L, D) bytes at
# random-chunk bandwidth; stream wins when
#   stream_bytes / BW_stream < gather_bytes / BW_dma.
# BW_stream / BW_dma measured on v5e via tools/microbench_stream_scorer
# at the SMALL-bucket shape (L=512, G=16: streamed 288 GB/s vs per-entry
# DMA 131): ~2.2x. Entries concentrated on few experts (stopword-heavy
# routing) stream; entries sparse over many experts gather.
STREAM_BW_RATIO = 2.2

# The 2.2x bandwidth ratio exists ONLY where several experts pack into
# each ~2 MB block (G >= 8) so one sequential fetch serves many entries.
# Measured r04 at the big-bucket shapes (G<=4, the byte-dominant buckets
# of the MS MARCO layout) the streamed kernel's isolated advantage is
# ~1 ms per bucket at best -- L=2048/G=4: 5.36 vs 6.16 ms (and its
# 640-step Mosaic compile took several hundred seconds); L=8192: 110.6
# vs 96.1 GB/s; L=32768: 54.6 vs 60.7 (LOSES); L=131072: 18.3 vs 18.1
# -- at G=1 each entry owns its own posting array, so the "stream"
# re-fetches the same bytes the gather would, serially, with per-step
# grid overhead. In-program at B=128 on the full layout, auto's
# big-bucket stream picks cost +69 ms/batch vs gathering everything
# (117.3 -> 186.2 ms device-resident): a program-level scheduling
# interaction (per-step semaphore waits serialize against the
# neighbouring sort/combine dispatches), not host cost (step-table
# build is 5.6 ms) and not upload cost (step tables ride the packed
# transfer). "auto" therefore only CONSIDERS streaming when
# G >= STREAM_MIN_GROUP, the shape family where the isolated win is
# large enough to survive that interaction; "on" still forces the
# streamed kernel everywhere (suite coverage).
STREAM_MIN_GROUP = 8


def _stream_group_target(L: int, D: int, itemsize: int) -> int:
    """Experts per posting-group so one (G, L, D) block is ~STREAM_CHUNK
    bytes (1 when a single expert's postings already exceed the chunk).
    ``from_host_index`` pads each bucket's expert axis to a multiple of
    this so the streamed scorer's blocks tile the array exactly."""
    if L * D * itemsize >= STREAM_CHUNK:
        return 1
    return max(1, STREAM_CHUNK // (L * D * itemsize))


def _stream_cfg(n_exp: int, L: int, D: int, itemsize: int) -> Tuple[int, int]:
    """(G, TL): experts per posting-group and L-tile for the streamed
    scorer, sized so one (G, TL, D) block is ~STREAM_CHUNK bytes."""
    if L * D * itemsize >= STREAM_CHUNK:
        target = max(8, STREAM_CHUNK // (D * itemsize))
        # largest power of two <= target: the halving loop below must
        # terminate at a real tile. Starting from the raw quotient (e.g.
        # 1365 at D=768 bf16) it walks odd values until 2 — the first
        # divisor of a pow2 L — handing Pallas a (1, 2, D) block that
        # violates the (8, 128) TPU tiling minimum and runs L/2 grid
        # steps per posting row. Bucket lengths are _pad_2bit values
        # (m * 2^e, m in {2, 3}), so a pow2 TL always terminates >= 8.
        TL = 1 << (target.bit_length() - 1)
        while L % TL:
            TL //= 2
        assert TL >= 8 and L % TL == 0, (L, D, itemsize, TL)
        return 1, TL
    G = min(_stream_group_target(L, D, itemsize), n_exp)
    while n_exp % G:
        G -= 1
    return G, L


def _pad_2bit(n: int, minimum: int = 1, multiple: int = 1) -> int:
    """Round ``n`` up to a two-significant-bit value (m * 2^e, m in
    {2, 3}), at least ``minimum``, then to a multiple of ``multiple``.

    Padded-shape granularity is THE lever on the combine cost: update
    triples scale with n_pad * R_pad, and pure pow2 rounding inflated the
    B=128 MS MARCO-layout sort input 3.3x over the real update count
    (16.8M vs ~5M). Two significant bits keeps the jit-shape count
    bounded (two shapes per pow2 decade) at <=1.33x overshoot.
    """
    n = max(n, minimum, 1)
    e = max((n - 1).bit_length() - 2, 0)
    g = 1 << e
    v = -(-n // g) * g
    return -(-v // multiple) * multiple


def _stream_shape_ok(n_exp: int, bsize: int, D: int, itemsize: int) -> bool:
    """Shape gate for STREAM_MODE="auto": only small-bucket shapes, where
    >= STREAM_MIN_GROUP experts pack into each streamed block, ever showed
    the streamed kernel's bandwidth advantage (see STREAM_MIN_GROUP)."""
    G, _ = _stream_cfg(n_exp, bsize, D, itemsize)
    return G >= STREAM_MIN_GROUP


def _stream_auto_wins(
    steps_b, G: int, TL: int, bsize: int, D: int, itemsize: int, n: int
) -> bool:
    """Per-bucket byte model for STREAM_MODE="auto" (see STREAM_BW_RATIO).

    The streamed scorer fetches each distinct consecutive posting-group
    transition once per L-tile as a (G, TL, D) block; the per-entry DMA
    kernel fetches the padded entry count x (bsize, D). Stream wins when
    its (sequential) bytes are under STREAM_BW_RATIO x the DMA's (random
    -chunk) bytes — entries concentrated on few experts stream, entries
    sparse over many experts gather.
    """
    pg = steps_b[:, 0]
    distinct = int(1 + (pg[1:] != pg[:-1]).sum()) * (bsize // TL)
    stream_bytes = distinct * G * TL * D * itemsize
    gather_bytes = _pad_2bit(n, minimum=8) * bsize * D * itemsize
    return stream_bytes <= STREAM_BW_RATIO * gather_bytes


def _stream_steps(slots_sorted, n_real: int, n_pad: int, G: int):
    """Step table for the streamed scorer: int32 (T_pad, 4) rows of
    [posting_group, window, init, active].

    Entries are slot-sorted, so the distinct (window, posting_group)
    pairs — lexicographically sorted — visit posting groups in
    non-decreasing order (sequential HBM streaming; a group spanning a
    window boundary repeats and Pallas skips the re-fetch). ``init``
    marks the first step of each window (output block initialize vs
    accumulate); windows past the last real entry get one inactive init
    step so every output block is written. Padded to a multiple of 64
    steps with inactive no-ops to bound program recompiles.
    """
    M = STREAM_M
    W = n_pad // M
    w_real = np.arange(n_real) // M
    pgs = slots_sorted[:n_real] // G
    pairs = np.unique(np.stack([w_real, pgs], axis=1), axis=0)
    last_pg = int(pairs[-1, 1]) if len(pairs) else 0
    rows = []
    for w, pg in pairs:
        rows.append((int(pg), int(w), 0, 1))
    seen_w = set(int(w) for w, _ in pairs)
    for w in range(W):
        if w not in seen_w:
            rows.append((last_pg, w, 1, 0))
    rows.sort(key=lambda r: (r[1], r[0]))
    # init = first step of each window
    out = []
    prev_w = -1
    for pg, w, _i, act in rows:
        out.append((pg, w, 1 if w != prev_w else 0, act))
        prev_w = w
    T = len(out)
    T_pad = -(-max(T, 1) // 64) * 64
    out.extend([(last_pg, W - 1, 0, 0)] * (T_pad - T))
    return np.asarray(out, np.int32)


class DeviceExpertIndex:
    """Built via :meth:`from_host_index`; search via :meth:`search`.

    Pass ``mesh`` with >1 device for EXPERT-PARALLEL layout (the device
    analog of the reference's ``expert_parallel`` index sharding,
    citadel_retrieval_task.py:29,44, and of this repo's host-side
    ``InvertedExpertIndex.load(expert_shards=...)``): each bucket's expert
    axis is sharded over the mesh ``data`` axis, every device scores only
    its local experts' postings, update triples are all-gathered (tiny vs
    the posting tensors), each device scatter-adds into its column shard
    of the accumulator, and the tiled top-k merges per-device tile maxima
    with one small all-gather + psum of the candidate tiles. Capacity
    scales linearly with devices (the point of expert parallelism: the
    reference shards the index because one GPU cannot hold it); the
    per-search collectives are B*devices*k-scale, never B*num_docs.
    """

    def __init__(self, num_docs: int, dtype=jnp.bfloat16, mesh=None):
        self.num_docs = num_docs
        self.dtype = dtype
        self.mesh = mesh
        self.ndev = 1 if mesh is None else int(mesh.devices.size)
        # per bucket size: device arrays + expert->slot map
        self.buckets: Dict[int, dict] = {}
        self.cls: Optional[jax.Array] = None
        self.cls_t: Optional[jax.Array] = None  # pre-transposed (1-dev)
        self._search_fns: Dict[Tuple[int, int], callable] = {}
        # same accounting dict as the host index (reference latency dict,
        # citadel_retrieval_task.py:45,111-113); device work is async, so
        # routing_time is host-side and search_time covers dispatch+sync
        self.latency: Dict[str, float] = collections.defaultdict(float)

    def _tiles(self) -> Tuple[int, int]:
        """(nt, NT): tile count (multiple of ndev) and padded column count."""
        nt = max(1, -(-(self.num_docs + 1) // TILE))
        nt = -(-nt // self.ndev) * self.ndev
        return nt, nt * TILE

    # ------------------------------------------------------------- #

    @classmethod
    def from_host_index(
        cls, host_index, dtype=jnp.bfloat16, mesh=None
    ) -> "DeviceExpertIndex":
        self = cls(host_index.num_docs, dtype, mesh=mesh)
        by_bucket: Dict[int, List[Tuple[int, object]]] = collections.defaultdict(list)
        for e, posts in host_index.experts.items():
            # cap at the largest bucket (oversized lists get truncated to
            # their highest-weight postings, like `portion` pruning)
            by_bucket[_bucket_for(len(posts.doc_ids))].append((e, posts))

        n_truncated = 0
        for bsize, entries in by_bucket.items():
            # pad the expert axis to a multiple of (mesh size x streamed
            # -scorer group) so expert-parallel shards split evenly AND the
            # stream kernel's (G, L, D) blocks tile the array exactly; pad
            # experts score exactly 0 into the trash column
            dim = entries[0][1].vecs.shape[1]
            g = _stream_group_target(bsize, dim, np.dtype(dtype).itemsize)
            step = self.ndev * g // np.gcd(self.ndev, g)
            n_exp = -(-len(entries) // step) * step
            vecs = np.zeros((n_exp, bsize, entries[0][1].vecs.shape[1]), np.float32)
            run_id = np.zeros((n_exp, bsize), np.int32)
            starts_all = np.zeros((n_exp, bsize), bool)
            docs_all = np.full((n_exp, bsize), -1, np.int64)
            nruns = np.zeros(n_exp, np.int32)
            max_run_len = 1
            for slot, (e, posts) in enumerate(entries):
                order = posts.sort_order
                v = posts.dense_vecs()[order]
                docs = posts.doc_ids[order]
                n = min(len(docs), bsize)
                if len(docs) > bsize:  # truncate by weight, keep doc sort
                    keep = np.sort(np.argsort(-posts.weights[order])[:bsize])
                    v, docs = v[keep], docs[keep]
                    n = bsize
                    n_truncated += 1
                vecs[slot, :n] = v[:n]
                # run segmentation: consecutive equal docs share a run id
                starts = np.concatenate([[True], docs[1:n] != docs[: n - 1]])
                rid = np.cumsum(starts) - 1
                run_id[slot, :n] = rid
                starts_all[slot, :n] = starts
                docs_all[slot, :n] = docs[:n]
                nruns[slot] = rid[-1] + 1 if n else 0
                if n:
                    lens = np.diff(np.append(np.flatnonzero(starts), n))
                    max_run_len = max(max_run_len, int(lens.max()))
                # pad positions: point at the last run (their scores are 0
                # and the zero floor keeps them harmless)
                if n < bsize:
                    run_id[slot, n:] = rid[-1] if n else 0
            # RUN-COMPACT emission layout: the combine scatter consumes one
            # triple per RUN (unique doc per expert), not per posting —
            # R_pad ~= padded_postings * fill / avg_run_len, measured ~2x
            # fewer scatter updates on the MS MARCO-scale synthetic layout
            R_pad = min(_pad_2bit(int(nruns.max(initial=1)), minimum=8), bsize)
            run_doc = np.full((n_exp, R_pad), -1, np.int64)
            start_pos = np.zeros((n_exp, R_pad), np.int32)
            for slot in range(len(entries)):
                sp = np.flatnonzero(starts_all[slot])
                nr = min(len(sp), R_pad)
                start_pos[slot, :nr] = sp[:nr]
                run_doc[slot, :nr] = docs_all[slot, sp[:nr]]
            shard = self._expert_sharding()
            self.buckets[bsize] = {
                "vecs": jax.device_put(jnp.asarray(vecs, dtype), shard),
                "run_id": jax.device_put(jnp.asarray(run_id), shard),
                "run_doc": jax.device_put(
                    jnp.asarray(run_doc.astype(np.int32)), shard
                ),
                "start_pos": jax.device_put(jnp.asarray(start_pos), shard),
                "max_run_len": max_run_len,
                "slot_of": {e: s for s, (e, _p) in enumerate(entries)},
            }
        if n_truncated:
            print(
                f"WARNING: {n_truncated} experts exceeded {BUCKET_SIZES[-1]} "
                "postings and were truncated to their highest-weight postings — "
                "device search diverges from host search for the dropped docs"
            )
        # dense expert -> (bucket, slot) routing tables: the host-side
        # routing loop becomes pure vectorized numpy (was ~13 ms of dict
        # lookups per B=64 batch)
        max_e = max(host_index.experts.keys(), default=-1)
        self._route_bsize = np.zeros(max_e + 2, np.int64)
        self._route_slot = np.zeros(max_e + 2, np.int64)
        for bsize, bucket in self.buckets.items():
            for e, s in bucket["slot_of"].items():
                self._route_bsize[e] = bsize
                self._route_slot[e] = s
        if host_index.cls is not None:
            if self.ndev > 1:
                # pad CLS rows to the accumulator's column grid and shard
                # by doc rows: each device adds its slice locally
                _nt, NT = self._tiles()
                cls_arr = np.zeros((NT, host_index.cls.shape[1]), np.float32)
                cls_arr[: host_index.cls.shape[0]] = host_index.cls
                self.cls = jax.device_put(
                    jnp.asarray(cls_arr, dtype), self._expert_sharding()
                )
            else:
                self.cls = jax.device_put(jnp.asarray(host_index.cls, dtype))
                # transposed ONCE at build: `.T` per search would dispatch
                # an eager whole-matrix transpose (num_docs x dim moved)
                # before every jitted call
                self.cls_t = jnp.asarray(self.cls.T)
        return self

    def _expert_sharding(self):
        """NamedSharding over the leading axis in expert-parallel mode."""
        if self.ndev == 1:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P

        return NamedSharding(self.mesh, P("data"))

    # ------------------------------------------------------------- #

    @staticmethod
    def _scores_pallas_serial(vecs, slots, qvecs):
        """r04 gather scorer (wait-all-DMAs-then-VPU-score, NO cross-step
        overlap) — kept for the A/B against the pipelined kernel below
        (env DPR_GATHER_KERNEL=serial; tools/bench_citadel_device.py)."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        E = slots.shape[0]
        _n_exp, L, D = vecs.shape
        TL = min(L, 2048)
        step_bytes = lambda g, tl: g * tl * D * vecs.dtype.itemsize
        BUDGET = 6 * 1024 * 1024
        G = 32
        while step_bytes(G, TL) > BUDGET and G > 1:
            G //= 2
        while step_bytes(G, TL) > BUDGET and TL > 256 and L % (TL // 2) == 0:
            TL //= 2
        G = min(G, E)
        while E % G:
            G //= 2

        def kern(slots_ref, v_hbm, q_ref, o_ref, scratch, sems):
            i = pl.program_id(0)
            j = pl.program_id(1)
            copies = []
            for g in range(G):
                c = pltpu.make_async_copy(
                    v_hbm.at[slots_ref[i * G + g], pl.ds(j * TL, TL)],
                    scratch.at[g],
                    sems.at[g],
                )
                c.start()
                copies.append(c)
            for c in copies:
                c.wait()
            prod = scratch[:].astype(jnp.float32) * q_ref[:][:, None, :].astype(
                jnp.float32
            )
            o_ref[:, :] = jnp.sum(prod, axis=-1)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(E // G, L // TL),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(
                    (G, D), lambda i, j, s: (i, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (G, TL), lambda i, j, s: (i, j), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((G, TL, D), vecs.dtype),
                pltpu.SemaphoreType.DMA((G,)),
            ],
        )
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((E, L), jnp.float32),
        )(slots, vecs, qvecs.astype(vecs.dtype))

    @staticmethod
    def _scores_pallas(vecs, slots, qvecs):
        """Posting-block fetch + score as ONE double-buffered Pallas kernel.

        ``vecs[slots]`` as an XLA gather measured 214 ms of a 268 ms
        B=128 search (tools/bench_citadel_device.py --stage gather:
        ~16 GB/s effective) — the whole bucket-scoring phase is that
        gather. Here the expert blocks stream HBM->VMEM via manual
        scalar-prefetch-indexed DMAs (descriptor cost ~200 ns vs the
        gather's per-element cost), DOUBLE-BUFFERED: step t+1's G copies
        are issued before step t's compute, so the fetch runs entirely
        under the score math (the r04 kernel waited all copies before
        computing — DMA and compute serialized, ~100-130 GB/s effective
        vs the ~800 GB/s streaming roofline). The score itself is one
        MXU batched dot (G*TL, D) x (G, D)^T with a static diagonal
        extraction — G x redundant MACs but off the VPU, whose
        broadcast-multiply-reduce was the serial tail (r05 rework,
        VERDICT r4 #3). Returns (E, L) fp32 scores.
        """
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        E = slots.shape[0]
        _n_exp, L, D = vecs.shape
        TL = min(L, 2048)
        # G entries per grid step: one entry/step costs ~5.5 us of fixed
        # step overhead; batching G manual DMAs per step amortizes it.
        # The scratch budget uses the REAL posting itemsize (fp32 parity
        # mode doubles bf16) and is PER BUFFER (two in flight); G bottoms
        # out at 1 and then TL halves — a hardcoded floor once let the
        # scratch exceed physical VMEM at D=768 and fail in Mosaic.
        step_bytes = lambda g, tl: g * tl * D * vecs.dtype.itemsize
        BUDGET = 4 * 1024 * 1024  # x2 buffers = 8 MB of ~16 MB VMEM
        G = 32
        while step_bytes(G, TL) > BUDGET and G > 1:
            G //= 2
        while step_bytes(G, TL) > BUDGET and TL > 256 and L % (TL // 2) == 0:
            TL //= 2
        G = min(G, E)
        while E % G:  # two-significant-bit E (e.g. 48) with pow2 G
            G //= 2
        J = L // TL
        prec = (
            jax.lax.Precision.HIGHEST
            if vecs.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )

        def kern(slots_ref, v_hbm, q_ref, o_ref, scratch, sems):
            i = pl.program_id(0)
            j = pl.program_id(1)
            t = i * J + j
            T = pl.num_programs(0) * J

            def copy(tn, slot, g):
                return pltpu.make_async_copy(
                    v_hbm.at[
                        slots_ref[(tn // J) * G + g],
                        pl.ds((tn % J) * TL, TL),
                    ],
                    scratch.at[slot, g],
                    sems.at[slot, g],
                )

            slot = jax.lax.rem(t, 2)

            @pl.when(t == 0)
            def _():
                for g in range(G):
                    copy(t, slot, g).start()

            @pl.when(t + 1 < T)
            def _():
                nxt = jax.lax.rem(t + 1, 2)
                for g in range(G):
                    copy(t + 1, nxt, g).start()

            for g in range(G):
                copy(t, slot, g).wait()
            vm = scratch[slot].reshape(G * TL, D)
            full = jax.lax.dot_general(
                vm,
                q_ref[:].astype(vm.dtype),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            ).reshape(G, TL, G)
            # entry g's scores are column g of its own row block:
            # one-hot mask + sum (a per-g slice concatenate hits a Mosaic
            # layout bug; the mask tensor is only (G, TL, G) fp32)
            ii = jax.lax.broadcasted_iota(jnp.int32, (G, 1, G), 0)
            kk = jax.lax.broadcasted_iota(jnp.int32, (G, 1, G), 2)
            o_ref[:, :] = jnp.sum(
                full * (ii == kk).astype(jnp.float32), axis=2
            )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(E // G, J),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # full vecs, stays HBM
                pl.BlockSpec(
                    (G, D), lambda i, j, s: (i, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (G, TL), lambda i, j, s: (i, j), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((2, G, TL, D), vecs.dtype),
                pltpu.SemaphoreType.DMA((2, G)),
            ],
        )
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((E, L), jnp.float32),
        )(slots, vecs, qvecs.astype(vecs.dtype))

    @staticmethod
    def _scores_streamed(vecs, qvecs, slots, steps):
        """Stream-and-pick bucket scorer: sequential posting streaming.

        Replaces the per-entry random fetch (XLA gather and per-entry
        DMA both measured 8-30 GB/s on v5e for 131 KB-2 MB chunks —
        ~215 ms of a 268 ms B=128 search) with SEQUENTIAL streaming:
        entries arrive slot-sorted, and a scalar-prefetched step table
        (``_stream_steps``) pairs each M-entry window with the ascending
        posting groups its entries touch, so the Pallas pipeline fetches
        each TOUCHED (G, TL, D) ~2 MB block exactly once per L-tile, in
        address order, double-buffered behind the compute. Per step the
        kernel scores the whole window against the whole group on the
        MXU and one-hot-masks each entry to its own expert; steps that
        share a window accumulate into the same output block (VMEM
        -resident across consecutive steps).

        vecs (n_exp, L, D); qvecs (E_pad, D) f32 slot-sorted (pad slot =
        n_exp, matching no group); slots (E_pad,) int32; steps (T, 4)
        int32. Returns (E_pad, L) f32 scores.
        """
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        n_exp, L, D = vecs.shape
        E_pad = qvecs.shape[0]
        M = STREAM_M
        G, TL = _stream_cfg(n_exp, L, D, vecs.dtype.itemsize)
        T = steps.shape[0]
        J = L // TL
        # fp32 postings are the PARITY mode (device_index_dtype=fp32,
        # host-vs-device equality tests): the MXU's default pass runs
        # fp32 operands at bf16 multiply precision (~2e-3 rel — fails
        # 1e-3-abs host parity at |score|~30), so request the 3-pass
        # fp32 path there; bf16 serving blocks keep the fast default.
        prec = (
            jax.lax.Precision.HIGHEST
            if vecs.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )

        def kern(steps_ref, q_ref, sl_ref, v_ref, o_ref):
            t = pl.program_id(1)
            pg = steps_ref[t, 0]
            init = steps_ref[t, 2]
            active = steps_ref[t, 3]
            v = v_ref[:].reshape(G * TL, D)
            full = jax.lax.dot_general(
                q_ref[:].astype(v.dtype),
                v,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            ).reshape(M, G, TL)
            local = sl_ref[:, 0] - pg * G  # (M,)
            sel = (
                local[:, None]
                == jax.lax.broadcasted_iota(jnp.int32, (M, G), 1)
            ) & (active > 0)
            contrib = jnp.sum(
                full * sel.astype(jnp.float32)[:, :, None], axis=1
            )  # (M, TL)

            @pl.when(init > 0)
            def _():
                o_ref[:, :] = contrib

            @pl.when(init == 0)
            def _():
                o_ref[:, :] += contrib

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(J, T),
            in_specs=[
                pl.BlockSpec(
                    (M, D), lambda j, t, s: (s[t, 1], 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (M, 1), lambda j, t, s: (s[t, 1], 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (G, TL, D), lambda j, t, s: (s[t, 0], j, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (M, TL), lambda j, t, s: (s[t, 1], j), memory_space=pltpu.VMEM
            ),
        )
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((E_pad, L), jnp.float32),
            # CPU: interpret-mode execution so the suite covers the kernel
            interpret=jax.default_backend() == "cpu",
        )(steps, qvecs, slots.reshape(E_pad, 1), vecs)

    def _score_bucket(
        self, vecs, run_id, run_doc, start_pos, slots, qvecs, qrows, mrl,
        steps=None,
    ):
        """Traceable per-bucket scoring WITHOUT the accumulator scatter.

        Returns flat (rows, docs, vals) update triples — one per RUN
        (unique doc within the expert), gathered at run-start positions.
        The scatter happens once for all buckets. Measured on v5e: an XLA
        scatter-add pays a whole-operand rewrite (~127 ms for a
        (64, 8.8M) fp32 accumulator) regardless of update count, so one
        search must contain exactly ONE scatter, and its per-update term
        scales with the RUN count, not the padded posting count.

        The MaxSim inner max uses a doubling suffix-max over the
        doc-sorted posting rows (``ceil(log2(max_run_len))`` shifted-max
        passes — pure VPU streaming) instead of ``segment_max``, whose
        XLA lowering is itself a scatter.
        """
        rid = run_id[slots]  # (E, L)
        rdoc = run_doc[slots]  # (E, R)
        spos = start_pos[slots]  # (E, R)
        D = qvecs.shape[-1]
        if steps is not None:
            # sequential stream-and-pick kernel (see _scores_streamed)
            scores = self._scores_streamed(vecs, qvecs, slots, steps)
        elif jax.default_backend() != "cpu" and D % 128 == 0:
            # fused DMA-gather + score kernel. The double-buffered MXU
            # variant (_scores_pallas) wins ISOLATED (363-379 GB/s vs the
            # serial kernel's 18-60 at big-bucket shapes) but LOSES the
            # in-program A/B at B=128/8.8M docs (546 vs 650 QPS wall,
            # 333 vs 369 device-resident — /tmp-queue job1, r05): the
            # score phase is no longer the in-program wall, and the
            # pipelined kernel's extra VMEM pressure (2x buffers + MXU
            # diag mask) costs more than the bandwidth it buys — the
            # same isolated-wins/in-program-loses pattern as the r04
            # stream scorer. Serial stays the default;
            # DPR_GATHER_KERNEL=pipelined opts in for A/Bs.
            import os as _os

            fn = (
                self._scores_pallas
                if _os.environ.get("DPR_GATHER_KERNEL") == "pipelined"
                else self._scores_pallas_serial
            )
            scores = fn(vecs, slots, qvecs)
        else:  # CPU tests / non-MXU dims: XLA gather + einsum
            pv = vecs[slots]  # (E, L, D)
            scores = jnp.einsum(
                "ed,eld->el", qvecs.astype(pv.dtype), pv,
                preferred_element_type=jnp.float32,
            )  # (E, L)
        E, L = scores.shape
        # doubling suffix max within runs: after ceil(log2(mrl)) rounds,
        # position i holds max(scores[i:end_of_run(i)]) — run STARTS hold
        # the full run max
        d = 1
        while d < mrl:
            sh_s = jnp.concatenate(
                [scores[:, d:], jnp.full((E, d), -jnp.inf, scores.dtype)], axis=1
            )
            sh_r = jnp.concatenate(
                [rid[:, d:], jnp.full((E, d), -1, rid.dtype)], axis=1
            )
            scores = jnp.where(sh_r == rid, jnp.maximum(scores, sh_s), scores)
            d *= 2
        seg = jnp.take_along_axis(scores, spos, axis=1)  # (E, R) run maxima
        # zero floor matches the training objective's gated-MaxSim
        # (non-matching pairs contribute 0)
        seg = jnp.maximum(seg, 0.0)
        # -1 docs (pure-pad runs) route to the trash column num_docs
        docs = jnp.where(rdoc >= 0, rdoc, self.num_docs)
        rows = jnp.repeat(qrows, rdoc.shape[1])
        return rows, docs.reshape(-1), seg.reshape(-1)

    # num_docs at or above this use the sort-based combine when there is
    # no dense CLS term. Below it, a row can touch fewer than k docs and
    # the dense accumulator's implicit all-zeros baseline changes the
    # returned top-k set; tests lower it to force the sorted path.
    sorted_combine_min_docs = 65536

    def _combine_updates_sorted(self, rows, docs, vals, batch, k, mdup):
        """Sort-based combine: cost scales with UPDATES, not B x num_docs.

        Measured on v5e (tools/microbench_citadel_prims.py, B=128): an XLA
        scatter-add costs ~9 ms per 1M updates into a (128, 8.8M) fp32
        accumulator plus ~15 ms of operand rewrite, and the tiled top-k
        another full read of the accumulator — while lax.sort moves 4M
        key/value pairs in ~10 ms. So: sort updates by (row, doc), reduce
        equal keys with a doubling suffix-sum (<= log2(mdup) shifted adds
        — a (row, doc) key repeats at most once per routed query entry),
        then sort by (row, -total) so each row's top-k is a CONTIGUOUS
        gather. No (B, num_docs) accumulator ever exists. Exact for the
        docs with updates; requires every row to touch >= k docs (large
        corpora — see sorted_combine_min_docs).
        """
        nd = self.num_docs
        # the sorts move every byte of every column ~log(U) times, so the
        # key is packed as narrow as the ranges allow and the doc/row
        # columns are NOT carried as payload — they are recomputed from
        # the sorted key (shift/mask or constant-divisor div, both cheap
        # VPU ops). Pad rows are B, so the key range is (B+1)*(nd+2).
        if (batch + 1) * (nd + 2) < 2**31:
            key = rows.astype(jnp.int32) * (nd + 2) + docs.astype(jnp.int32)
            skey, svals = jax.lax.sort((key, vals), num_keys=1)
            sdocs = (skey % (nd + 2)).astype(jnp.int32)
            srows = (skey // (nd + 2)).astype(jnp.int32)

            def shifted_equal(d):
                sh_k = jnp.concatenate([skey[d:], jnp.full((d,), -1, skey.dtype)])
                return sh_k == skey
        else:
            # the packed key would need int64, but without jax_enable_x64
            # astype(int64) SILENTLY stays int32 (overflowed keys would
            # merge unrelated (row, doc) pairs): sort lexicographically by
            # two int32 keys instead — one extra sort operand, same math
            srows, sdocs, svals = jax.lax.sort(
                (rows.astype(jnp.int32), docs.astype(jnp.int32), vals),
                num_keys=2,
            )

            def shifted_equal(d):
                sh_r = jnp.concatenate([srows[d:], jnp.full((d,), -1, jnp.int32)])
                sh_d = jnp.concatenate([sdocs[d:], jnp.full((d,), -1, jnp.int32)])
                return (sh_r == srows) & (sh_d == sdocs)

        U = srows.shape[0]
        d = 1
        while d < mdup:
            sh_v = jnp.concatenate([svals[d:], jnp.zeros((d,), svals.dtype)])
            svals = svals + jnp.where(shifted_equal(d), sh_v, 0.0)
            d *= 2
        is_start = jnp.concatenate(
            [
                jnp.ones((1,), bool),
                ~((srows[1:] == srows[:-1]) & (sdocs[1:] == sdocs[:-1])),
            ]
        )
        tot = jnp.where(is_start & (sdocs < nd), svals, -jnp.inf)
        r2, negtot, d2 = jax.lax.sort(
            (srows, -tot, sdocs), num_keys=2
        )
        row_starts = jnp.searchsorted(r2, jnp.arange(batch, dtype=r2.dtype))
        # end of row b = first index with row > b. NOT row_starts shifted
        # with U appended: pad entries carry row `batch` and sort AFTER the
        # real rows, so closing the last row at U would leak pad doc ids
        # (finite 0.0 scores) into its top-k whenever it touches < k docs.
        row_ends = jnp.searchsorted(r2, jnp.arange(1, batch + 1, dtype=r2.dtype))
        idx = row_starts[:, None] + jnp.arange(k)[None, :]
        idx_c = jnp.clip(idx, 0, U - 1)
        cand_s = -negtot[idx_c]
        cand_d = d2[idx_c]
        valid = (idx < row_ends[:, None]) & jnp.isfinite(cand_s)
        s = jnp.where(valid, cand_s, 0.0)
        # placeholder slots (rows touching < k docs) carry -1, not a
        # REPEATED doc 0 — duplicate doc ids per query corrupt TREC runs
        doc = jnp.where(valid, cand_d, -1)
        return s, doc

    def _combine_updates(self, rows, docs, vals, batch, k, has_cls, q_cls, cls_t):
        """Traceable: one scatter-add over all updates + tiled exact top-k.

        The tiled top-k (per-2048-column tile maxima -> top-k tiles -> gather
        -> re-top-k) is exact by the group-max containment argument (any tile
        holding a top-k element has tile-max >= it, so the top-k tiles by max
        contain all top-k elements); it replaces `lax.top_k` over the full
        (B, num_docs) accumulator, which reads at ~13 GB/s on v5e (~165 ms
        at B=64, 8.8M docs) versus ~bandwidth for the tile-max reduce.
        """
        tile = TILE
        nd = self.num_docs
        nt, _NT = self._tiles()
        kt = min(k, nt)
        acc = jnp.zeros((batch, nt * tile), jnp.float32)
        acc = acc.at[rows, docs].add(vals, mode="drop")
        acc = acc.reshape(batch, nt, tile)
        col = jnp.arange(nt * tile, dtype=jnp.int32).reshape(nt, tile)
        valid = col < nd
        if has_cls:
            # dense CLS scores fold into the same tiled view; XLA fuses
            # the add into the tile-max read
            cls_scores = jnp.dot(
                q_cls.astype(cls_t.dtype), cls_t,
                preferred_element_type=jnp.float32,
            )  # (B, nd)
            cls_scores = jnp.pad(cls_scores, ((0, 0), (0, nt * tile - nd)))
            acc = acc + cls_scores.reshape(batch, nt, tile)
        # mask fuses into the reduce (one streaming read of acc)
        tmax = jnp.where(valid[None], acc, -jnp.inf).max(axis=-1)  # (B, nt)
        _, tidx = jax.lax.top_k(tmax, kt)  # (B, kt)
        cand = jnp.take_along_axis(
            acc, tidx[:, :, None], axis=1
        )  # (B, kt, tile) — gather raw tiles, mask the small result
        cand_col = tidx[:, :, None] * tile + jnp.arange(tile, dtype=jnp.int32)
        cand = jnp.where(cand_col < nd, cand, -jnp.inf)
        s, within = jax.lax.top_k(cand.reshape(batch, kt * tile), k)
        doc = (
            jnp.take_along_axis(tidx, within // tile, axis=1) * tile
            + within % tile
        )
        return s, doc

    def _search_program(self, batch: int, spec: Tuple[Tuple[int, int], ...],
                        k: int, has_cls: bool, mdup: int = 1):
        """ONE jitted program for the whole search: every bucket's
        gather-score-segmax plus the combine — sort-based when there is
        no dense CLS term and the corpus is large (cost scales with
        updates), dense scatter + tiled top-k otherwise. A single
        dispatch matters over tunneled deployments (~16-32 ms per call)
        and lets XLA schedule bucket programs back-to-back without host
        round-trips.

        The per-search host arrays arrive PACKED into two uploads —
        ``packed_i`` (every bucket's slots ++ qrows ++ step table, int32)
        and ``packed_q`` (every bucket's padded query vectors, row
        -concatenated) — unpacked here with static offsets derived from
        ``spec``. Measured on the tunneled v5e: each separate device_put
        costs ~18-40 ms of per-call channel overhead, so the previous 4
        -arrays-per-bucket layout (20 puts/search) paid a ~390 ms floor
        before any device work ran; production PCIe hosts pay less but
        still win from 2 transfers instead of 20.

        spec: tuple of (bucket_size, n_entries_padded, max_run_len,
        n_step_rows) in call order — n_step_rows > 0 selects the
        streamed scorer; mdup bounds duplicate (row, doc) keys (sorted
        mode).
        """
        use_sorted = (not has_cls) and self.num_docs >= self.sorted_combine_min_docs
        key = ("program", batch, spec, k, has_cls, use_sorted and mdup)
        if key in self._search_fns:
            return self._search_fns[key]

        @jax.jit
        def run(bucket_tensors, packed_i, packed_q, q_cls=None, cls_t=None):
            parts = []
            oi = oq = 0
            for (_bsize, n_pad, mrl, n_steps), tensors in zip(
                spec, bucket_tensors
            ):
                slots = packed_i[oi : oi + n_pad]
                qrows = packed_i[oi + n_pad : oi + 2 * n_pad]
                oi += 2 * n_pad
                steps = None
                if n_steps:
                    steps = packed_i[oi : oi + 4 * n_steps].reshape(
                        n_steps, 4
                    )
                    oi += 4 * n_steps
                qvecs = packed_q[oq : oq + n_pad]
                oq += n_pad
                parts.append(
                    self._score_bucket(
                        *tensors, slots, qvecs, qrows, mrl, steps=steps
                    )
                )
            if parts:
                rows = jnp.concatenate([p[0] for p in parts])
                docs = jnp.concatenate([p[1] for p in parts])
                vals = jnp.concatenate([p[2] for p in parts])
            else:
                rows = jnp.zeros((8,), jnp.int32)
                docs = jnp.full((8,), self.num_docs, jnp.int32)
                vals = jnp.zeros((8,), jnp.float32)
            if use_sorted:
                return self._combine_updates_sorted(
                    rows, docs, vals, batch, k, mdup
                )
            return self._combine_updates(
                rows, docs, vals, batch, k, has_cls, q_cls, cls_t
            )

        self._search_fns[key] = run
        return run

    def _search_program_sharded(self, batch: int, spec: Tuple[Tuple[int, int], ...],
                                k: int, has_cls: bool):
        """Expert-parallel search: one shard_map program over the mesh.

        Per device: score LOCAL experts' postings -> all_gather the flat
        update triples (B*entries-scale, tiny next to the posting tensors)
        -> scatter-add into the LOCAL column shard of the accumulator
        (out-of-shard docs drop; per-device scatter operand is 1/ndev the
        size, which is where the single-chip scatter cost went) -> local
        tile maxima -> all_gather (B, nt) -> replicated top-k tile
        selection -> psum-merged candidate tile gather -> exact top-k.
        """
        key = ("program_ep", batch, spec, k, has_cls)
        if key in self._search_fns:
            return self._search_fns[key]
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        nd = self.num_docs
        nt, NT = self._tiles()
        ndev = self.ndev
        nt_l = nt // ndev
        ncols_l = NT // ndev
        kt = min(k, nt)
        tile = TILE

        def local(bucket_tensors, packed_i, packed_q, cls_l, q_cls):
            # per-search host arrays arrive PACKED into two sharded uploads
            # (same layout as the single-device program: per device, each
            # bucket contributes slots ++ qrows in packed_i and its padded
            # query vectors in packed_q) — 2 device_puts per search instead
            # of 3 per bucket (~18-40 ms per-call channel floor each over a
            # tunneled deployment; see _search_program)
            parts = []
            oi = oq = 0
            for (_bsize, n_pad, mrl), tensors in zip(spec, bucket_tensors):
                vecs_l, rid_l, rdoc_l, spos_l = tensors
                slots_l = packed_i[0, oi : oi + n_pad]
                qrows_l = packed_i[0, oi + n_pad : oi + 2 * n_pad]
                oi += 2 * n_pad
                qvecs_l = packed_q[0, oq : oq + n_pad]
                oq += n_pad
                r, d, v = self._score_bucket(
                    vecs_l, rid_l, rdoc_l, spos_l,
                    slots_l, qvecs_l, qrows_l, mrl,
                )
                parts.append((r, d, v))
            if parts:
                rows = jnp.concatenate([p[0] for p in parts])
                docs = jnp.concatenate([p[1] for p in parts])
                vals = jnp.concatenate([p[2] for p in parts])
            else:
                rows = jnp.zeros((8,), jnp.int32)
                docs = jnp.full((8,), nd, jnp.int32)
                vals = jnp.zeros((8,), jnp.float32)
            # every device needs every device's updates (a doc's score can
            # combine experts living on different devices)
            rows = jax.lax.all_gather(rows, "data", tiled=True)
            docs = jax.lax.all_gather(docs, "data", tiled=True)
            vals = jax.lax.all_gather(vals, "data", tiled=True)
            dev = jax.lax.axis_index("data")
            # CAREFUL: scatter mode="drop" only drops after JAX wraps
            # NEGATIVE advanced indices (idx + axis_size), so a doc owned by
            # device dev-1 would land in-bounds here and corrupt doc
            # doc+ncols_l. Route out-of-shard docs to the positive-OOB index
            # ncols_l, which mode="drop" genuinely discards.
            in_shard = (docs >= dev * ncols_l) & (docs < (dev + 1) * ncols_l)
            local_col = jnp.where(in_shard, docs - dev * ncols_l, ncols_l)
            acc = jnp.zeros((batch, ncols_l), jnp.float32)
            acc = acc.at[rows, local_col].add(vals, mode="drop")
            acc = acc.reshape(batch, nt_l, tile)
            gcol = (
                dev * ncols_l
                + jnp.arange(nt_l * tile, dtype=jnp.int32).reshape(nt_l, tile)
            )
            valid = gcol < nd
            if has_cls:
                cls_scores = jnp.dot(
                    q_cls.astype(cls_l.dtype), cls_l.T,
                    preferred_element_type=jnp.float32,
                )  # (B, ncols_l)
                acc = acc + cls_scores.reshape(batch, nt_l, tile)
            tmax_l = jnp.where(valid[None], acc, -jnp.inf).max(axis=-1)
            tmax = jax.lax.all_gather(
                tmax_l, "data", axis=1, tiled=True
            )  # (B, nt) replicated
            _, tidx = jax.lax.top_k(tmax, kt)  # identical on every device
            own = (tidx // nt_l) == dev
            lt = jnp.where(own, tidx % nt_l, 0)
            cand_l = jnp.take_along_axis(acc, lt[:, :, None], axis=1)
            cand_l = jnp.where(own[:, :, None], cand_l, 0.0)
            cand = jax.lax.psum(cand_l, "data")  # each tile owned by one dev
            cand_col = tidx[:, :, None] * tile + jnp.arange(tile, dtype=jnp.int32)
            cand = jnp.where(cand_col < nd, cand, -jnp.inf)
            s, within = jax.lax.top_k(cand.reshape(batch, kt * tile), k)
            doc = (
                jnp.take_along_axis(tidx, within // tile, axis=1) * tile
                + within % tile
            )
            return s, doc

        bucket_specs = tuple(
            (P("data"),) * 4
            for _ in spec
        )

        run = jax.jit(
            shard_map(
                local,
                mesh=self.mesh,
                in_specs=(
                    bucket_specs,
                    P("data", None),
                    P("data", None, None),
                    P("data"),
                    P(None, None),
                ),
                out_specs=(P(None, None), P(None, None)),
                check_vma=False,
            )
        )
        self._search_fns[key] = run
        return run

    def search(
        self, query_out: Dict[str, np.ndarray], topk: int = 100,
        as_numpy: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Same contract as InvertedExpertIndex.search, computed on device.

        ``as_numpy=False`` returns device arrays (scores, indices) without
        the device->host fetch — for benchmarking and for callers that feed
        the results into further device work.
        """
        expert_ids = np.asarray(query_out["expert_ids"])
        expert_repr = np.asarray(query_out["expert_repr"], dtype=np.float32)
        attn = np.asarray(query_out["attention_mask"])
        weights = query_out.get("expert_weights")
        weights = None if weights is None else np.asarray(weights, np.float32)
        B = expert_repr.shape[0]
        citadel = expert_ids.ndim == 3

        # host-side routing, fully vectorized: dense expert -> (bucket,
        # slot) table lookups over the flattened (B, T, K) routing grid
        tic = time.perf_counter()
        eid = expert_ids if citadel else expert_ids[..., None]
        if weights is None:
            w = np.ones(eid.shape, np.float32)
        else:
            w = weights if citadel else weights[..., None]
        valid = (attn[..., None] > 0) & (eid >= 0) & (w > 0)
        eid_c = np.clip(eid, 0, len(self._route_bsize) - 1)
        bs = np.where(valid & (eid == eid_c), self._route_bsize[eid_c], 0)
        b_idx, t_idx, k_idx = np.nonzero(bs)
        bsizes_sel = bs[b_idx, t_idx, k_idx]
        slots_sel = self._route_slot[eid[b_idx, t_idx, k_idx]]
        vecs_sel = (
            w[b_idx, t_idx, k_idx, None] * expert_repr[b_idx, t_idx]
        ).astype(np.float32)
        per_bucket: Dict[int, tuple] = {}
        for bsize in np.unique(bsizes_sel):
            m = bsizes_sel == bsize
            per_bucket[int(bsize)] = (b_idx[m], slots_sel[m], vecs_sel[m])

        self.latency["routing_time"] += time.perf_counter() - tic
        tic = time.perf_counter()
        has_cls = self.cls is not None and "cls_repr" in query_out
        k = min(topk, self.num_docs)
        D = expert_repr.shape[-1]
        spec = []  # (bucket_size, padded entries, max_run_len) per bucket
        bucket_args = []
        if self.ndev > 1:
            # expert-parallel: entries co-locate with their expert's device
            ints_ep: List[np.ndarray] = []  # per bucket (ndev, 2*n_pad)
            qs_ep: List[np.ndarray] = []  # per bucket (ndev, n_pad, D)
            for bsize, (rows_b, slots_b, vecs_b) in sorted(per_bucket.items()):
                bucket = self.buckets[bsize]
                epd = bucket["vecs"].shape[0] // self.ndev
                dev = slots_b // epd
                srt = np.argsort(dev, kind="stable")
                dev_s = dev[srt]
                starts = np.searchsorted(dev_s, np.arange(self.ndev))
                posin = np.arange(len(dev_s)) - starts[dev_s]
                counts = np.bincount(dev, minlength=self.ndev)
                n_max = max(1, int(counts.max(initial=1)))
                n_pad = max(8, 1 << (n_max - 1).bit_length())
                # pad entries use row B (positive-OOB): their zero-value
                # updates drop at the scatter / sort past all real rows,
                # so they can neither pollute row 0's doc segments nor
                # break the sorted combine's duplicate bound
                qrows = np.full((self.ndev, n_pad), B, np.int32)
                slots = np.zeros((self.ndev, n_pad), np.int32)
                qvecs = np.zeros((self.ndev, n_pad, D), np.float32)
                qrows[dev_s, posin] = rows_b[srt]
                slots[dev_s, posin] = (slots_b % epd)[srt]
                qvecs[dev_s, posin] = vecs_b[srt]
                spec.append((bsize, n_pad, bucket["max_run_len"]))
                ints_ep.append(np.concatenate([slots, qrows], axis=1))
                qs_ep.append(qvecs)
                bucket_args.append(
                    (
                        bucket["vecs"],
                        bucket["run_id"],
                        bucket["run_doc"],
                        bucket["start_pos"],
                    )
                )
            # the per-search host arrays ride in TWO sharded uploads (the
            # single-device packing, laid out per device) instead of 3
            # device_puts per bucket — see _search_program's measured
            # per-call channel floor
            from jax.sharding import NamedSharding, PartitionSpec as _P

            shard2 = NamedSharding(self.mesh, _P("data", None))
            shard3 = NamedSharding(self.mesh, _P("data", None, None))
            packed_i = jax.device_put(
                jnp.asarray(
                    np.concatenate(ints_ep, axis=1)
                    if ints_ep
                    else np.zeros((self.ndev, 0), np.int32)
                ),
                shard2,
            )
            packed_q = jax.device_put(
                jnp.asarray(
                    np.concatenate(qs_ep, axis=1)
                    if qs_ep
                    else np.zeros((self.ndev, 0, D), np.float32)
                ),
                shard3,
            )
            run = self._search_program_sharded(B, tuple(spec), k, has_cls)
            if has_cls:
                q_cls = jnp.asarray(np.asarray(query_out["cls_repr"], np.float32))
                cls_arg = self.cls
            else:
                q_cls = jnp.zeros((B, 1), jnp.float32)
                cls_arg = jax.device_put(
                    jnp.zeros((self.ndev, 1), self.dtype),
                    NamedSharding(self.mesh, _P("data")),
                )
            s, idx = run(tuple(bucket_args), packed_i, packed_q, cls_arg, q_cls)
        else:
            stream_capable = D % 128 == 0 and (
                STREAM_MODE == "on" or jax.default_backend() != "cpu"
            )
            ints: List[np.ndarray] = []
            qs: List[np.ndarray] = []
            for bsize, (rows_b, slots_b, vecs_b) in sorted(per_bucket.items()):
                bucket = self.buckets[bsize]
                n = len(rows_b)
                n_exp = bucket["vecs"].shape[0]
                itemsize = bucket["vecs"].dtype.itemsize
                use_stream = stream_capable and STREAM_MODE != "off"
                steps = None
                if use_stream and STREAM_MODE == "auto":
                    # shape gate BEFORE building the step table: the
                    # streamed kernel only ever beats the DMA gather at
                    # small-bucket shapes (see STREAM_MIN_GROUP)
                    use_stream = _stream_shape_ok(n_exp, bsize, D, itemsize)
                if use_stream:
                    # streamed scorer: entries slot-sorted so touched
                    # posting groups are visited in address order; pad
                    # slot = n_exp (matches no group -> contributes 0)
                    G, TL = _stream_cfg(n_exp, bsize, D, itemsize)
                    order = np.argsort(slots_b, kind="stable")
                    n_pad_s = _pad_2bit(n, minimum=STREAM_M, multiple=STREAM_M)
                    slots_s = np.full((n_pad_s,), n_exp, np.int32)
                    slots_s[:n] = slots_b[order]
                    steps_b = _stream_steps(slots_s, n, n_pad_s, G)
                    if STREAM_MODE == "auto":
                        use_stream = _stream_auto_wins(
                            steps_b, G, TL, bsize, D, itemsize, n
                        )
                if use_stream:
                    rows_b, slots_b, vecs_b = (
                        rows_b[order], slots_b[order], vecs_b[order],
                    )
                    n_pad = n_pad_s
                    pad_slot = n_exp
                    steps = steps_b
                else:
                    n_pad = _pad_2bit(n, minimum=8)
                    pad_slot = 0
                # pad rows = B (positive-OOB): dropped by the scatter,
                # sorted past all real rows by the sorted combine
                qrows = np.full((n_pad,), B, np.int32)
                slots = np.full((n_pad,), pad_slot, np.int32)
                qvecs = np.zeros((n_pad, D), np.float32)
                qrows[:n] = rows_b
                slots[:n] = slots_b
                qvecs[:n] = vecs_b
                # pad entries: zero qvec -> scores 0 -> zero floor
                bucket_args.append(
                    (
                        bucket["vecs"],
                        bucket["run_id"],
                        bucket["run_doc"],
                        bucket["start_pos"],
                    )
                )
                ints += [slots, qrows]
                qs.append(qvecs)
                if steps is not None:
                    ints.append(steps.ravel())
                    spec.append(
                        (bsize, n_pad, bucket["max_run_len"], steps.shape[0])
                    )
                else:
                    spec.append((bsize, n_pad, bucket["max_run_len"], 0))
            # duplicate-(row, doc) bound for the sorted combine: one
            # update per routed entry per doc, so <= entries per row
            mdup = 8
            while mdup < max(1, int(np.bincount(b_idx, minlength=1).max())):
                mdup *= 2
            # TWO uploads for the whole search (see _search_program):
            # every int array packed into one vector, every qvec block
            # into one matrix — in the index dtype, matching the in
            # -kernel cast, so bf16 indexes upload half the bytes
            packed_i = jnp.asarray(
                np.concatenate(ints) if ints else np.zeros(1, np.int32)
            )
            q_np = (
                np.concatenate(qs, axis=0) if qs else np.zeros((1, D), np.float32)
            )
            # host-side cast so a bf16 index uploads half the bytes (the
            # scorers cast q to the posting dtype anyway)
            packed_q = jnp.asarray(q_np.astype(np.dtype(self.dtype)))
            run = self._search_program(B, tuple(spec), k, has_cls, mdup)
            if has_cls:
                q_cls = jnp.asarray(np.asarray(query_out["cls_repr"], np.float32))
                s, idx = run(
                    tuple(bucket_args), packed_i, packed_q, q_cls, self.cls_t
                )
            else:
                s, idx = run(tuple(bucket_args), packed_i, packed_q)
        if not as_numpy:
            self.latency["search_time"] += time.perf_counter() - tic
            return s, idx
        out = np.asarray(s), np.asarray(idx)
        self.latency["search_time"] += time.perf_counter() - tic
        return out
