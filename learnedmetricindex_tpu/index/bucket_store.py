"""Chunked, device-resident bucket store and the batched bucket scan.

This replaces the reference's query-time bucket machinery — the pandas
``groupby(category_L*)`` re-scanned once per visited-bucket round with a
``faiss.knn`` call per (bucket, querysubset) pair
(``search/li/LearnedIndex.py:327-373``) — with a TPU-native layout:

* **Chunked CSR layout.**  Dataset rows are packed sorted-by-bucket into
  fixed-size *chunks* ``chunk_data[n_chunks, chunk, d]`` (plus 1-based
  object ids, 0 = padding).  Each bucket owns a contiguous chunk range
  (CSR offsets).  Only each bucket's last chunk is padded, so HBM
  overhead is ≤ ``n_buckets·chunk/n`` — unlike padding every bucket to
  the max bucket length (3× at LAION-10M imbalance).
* **Flat work list.**  A search visit-set ``bucket_order[q, :]``
  expands into uniform work items ``(query-tile, chunk)``; every item is
  one (qtile × d) @ (d × chunk) MXU matmul + top-k.  No ragged shapes,
  no host round-trips inside the scan.
* **Two-phase top-k.**  Items emit per-(query, chunk) top-k candidates;
  a final gather + ``lax.top_k`` per query merges them.  ``lax.top_k``
  is stable, so ties resolve toward the earlier candidate, mirroring the
  reference's stable merge (``LearnedIndex.py:125-146``) up to candidate
  order (bucket-index order here vs. visit order there — identical
  results unless exact distance ties span buckets).

Distances are the reference's convention: ``1 - <q, x>`` on normalized
vectors (``LearnedIndex.py:368``); queries with no valid candidate get
``dist=inf, id=0`` like the reference's initialization
(``LearnedIndex.py:340-341``).
"""

from __future__ import annotations

import functools
import os
import weakref
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# Which engine the most recent scan_buckets call actually ran
# ("pallas-fused" | "xla" | "xla-virtual") — introspection for benches
# and tests; auto-mode may fall back at runtime, so a prediction from
# the gate alone can be wrong.
LAST_ENGINE: str = "none"

# Sticky compiled-shape hints per (store, qtile): the fused engine's
# static shapes (n_pairs, W) derive from the navigation outcome, so
# every query batch would otherwise compile a fresh program whenever
# its raw sizes cross a ⅛-octave boundary.  Remembering the largest
# shape already compiled and padding up to it makes steady-state
# serving compile-free: shapes only grow, and only when a batch truly
# exceeds everything seen before.  Keyed by id() of the store's id
# grid (NamedTuple stores aren't hashable); a stale id collision after
# GC merely yields one suboptimal padding choice, never a wrong result.
_SHAPE_HINTS: dict = {}
_SHAPE_HINTS_MAX = 256


def migrate_shape_hints(old_id: int, new_id: int) -> None:
    """Re-key every hint entry of one store onto its successor — called
    by the mutation layer, whose every insert/delete creates a new
    ``chunk_ids`` array.  Without this, mutations would strand one dead
    entry each and eventually push the cache over its cap, evicting
    LIVE entries (including the search path's sticky query padding)."""
    for k in [k for k in _SHAPE_HINTS if k[0] == old_id]:
        _SHAPE_HINTS[(new_id,) + k[1:]] = _SHAPE_HINTS.pop(k)


def _sticky_quantize(key, name: str, size: int, multiple: int) -> int:
    """⅛-octave-quantize ``size``, but reuse the largest value already
    compiled for ``key`` when it still fits (see ``_SHAPE_HINTS``)."""
    if len(_SHAPE_HINTS) > _SHAPE_HINTS_MAX:
        # evict the least-recently-USED half (every lookup below
        # re-inserts its key at the end, so dict order is LRU→MRU) — a
        # wholesale clear would also drop hot entries and force every
        # active serving path to recompile at its next odd-sized batch
        for k in list(_SHAPE_HINTS)[: _SHAPE_HINTS_MAX // 2]:
            del _SHAPE_HINTS[k]
    # touch-on-use: move the key to the dict's end so a long-lived hot
    # store (a serving deployment) can never age into the evicted half
    # behind younger dead stores
    hints = _SHAPE_HINTS.pop(key, None)
    if hints is None:
        hints = {}
    _SHAPE_HINTS[key] = hints
    q = _quantize(size, multiple)
    prev = hints.get(name, 0)
    # prev % multiple: hint keys are id()-based, and a recycled id()
    # from a GC'd store with a different chunk/qtile could hand back a
    # padding that violates the caller's divisibility contract — treat
    # such a stale entry as absent instead of crashing the scan
    if prev >= size and prev % multiple == 0:
        return prev
    hints[name] = q
    return q


class BucketStore(NamedTuple):
    """Either *packed* (``chunk_data`` holds the vectors, padded) or
    *virtual* (``data_ref`` points at the unmoved original array and
    ``chunk_ids`` doubles as the gather map).  Virtual mode costs one
    extra row-gather per scan item but adds zero bytes of HBM beyond the
    id grid — the right trade when the dataset is already device
    resident (and mandatory when host↔device bandwidth is scarce)."""

    chunk_ids: jnp.ndarray  # (n_chunks, chunk) int32, 1-based, 0 = pad
    bucket_chunk_start: np.ndarray  # (n_buckets + 1,) host CSR over chunks
    bucket_sizes: np.ndarray  # (n_buckets,) host true row counts
    chunk: int
    n_buckets: int
    chunk_data: Optional[jnp.ndarray] = None  # (n_chunks*chunk, d) packed, flat
    data_ref: Optional[jnp.ndarray] = None  # (n, d) virtual
    chunk_scales: Optional[jnp.ndarray] = None  # (n_chunks*chunk,) f32, packed int8
    row_scales: Optional[jnp.ndarray] = None  # (n,) f32, virtual int8
    row_slot: Optional[jnp.ndarray] = None  # (n,) int32: object id-1 → packed slot
    # --- mutation bookkeeping (index/mutation.py); None on fresh builds.
    # After inserts a bucket's chunks are no longer a contiguous range:
    # bucket b owns chunks bucket_chunk_list[ptr[b]:ptr[b+1]] (in scan
    # order).  The kernel never cares — its only contiguity requirement
    # is that one (bucket, tile) pair's items are consecutive in the
    # WORK LIST, which build_scan_plan preserves for any chunk placement.
    bucket_chunk_ptr: Optional[np.ndarray] = None  # (n_buckets + 1,) host CSR
    bucket_chunk_list: Optional[np.ndarray] = None  # (n_assigned,) chunk idx
    bucket_fill: Optional[np.ndarray] = None  # (n_buckets,) int32 high-water
    #   row count within the bucket's chunk sequence (inserts append
    #   here; deletes leave holes below it)

    @property
    def d(self) -> int:
        if self.chunk_data is not None:
            return self.chunk_data.shape[-1]
        return self.data_ref.shape[-1]

    @property
    def n_chunks(self) -> int:
        return self.chunk_ids.shape[0]

    @classmethod
    def build(
        cls,
        data: np.ndarray,
        bucket_ids: np.ndarray,
        n_buckets: int,
        chunk: int = 2048,
        dtype=jnp.float32,
        object_ids: Optional[np.ndarray] = None,
    ) -> "BucketStore":
        """Pack rows into the chunked layout (host-side counting sort).

        ``object_ids``: 1-based ids to report for each row (defaults to
        ``row_index + 1``, the reference's convention,
        ``search/search.py:190-191``).
        """
        data = np.asarray(data, dtype=np.float32)
        bucket_ids = np.asarray(bucket_ids)
        n, d = data.shape
        if object_ids is None:
            object_ids = np.arange(1, n + 1, dtype=np.int32)
        else:
            object_ids = np.asarray(object_ids, dtype=np.int32)

        from learnedmetricindex_tpu import native

        counts = native.bincount(bucket_ids, n_buckets)
        nchunks = -(-counts // chunk)  # empty bucket → 0 chunks
        starts = np.concatenate([[0], np.cumsum(nchunks)]).astype(np.int32)
        total_chunks = int(starts[-1])

        padded = total_chunks * chunk
        slot_rows, _ = native.fill_slots(
            bucket_ids, starts.astype(np.int64) * chunk, padded
        )
        valid = slot_rows >= 0
        flat = np.zeros((padded, d), dtype=np.float32)
        flat[valid] = data[slot_rows[valid]]
        ids = np.zeros(padded, dtype=np.int32)
        ids[valid] = object_ids[slot_rows[valid]]

        # inverse mapping (object id-1 → slot) for the exact rerank stage
        max_id = int(object_ids.max()) if len(object_ids) else 0
        row_slot = np.zeros(max_id, dtype=np.int32)
        row_slot[ids[valid] - 1] = np.nonzero(valid)[0].astype(np.int32)

        return cls(
            chunk_data=jnp.asarray(flat, dtype=dtype),
            chunk_ids=jnp.asarray(ids.reshape(total_chunks, chunk)),
            bucket_chunk_start=starts,
            bucket_sizes=counts.astype(np.int32),
            chunk=chunk,
            n_buckets=n_buckets,
            row_slot=jnp.asarray(row_slot),
        )

    @classmethod
    def build_packed_int8(
        cls,
        data: np.ndarray,
        bucket_ids: np.ndarray,
        n_buckets: int,
        chunk: int = 2048,
        object_ids: Optional[np.ndarray] = None,
    ) -> "BucketStore":
        """Packed store with symmetric per-row int8 quantization done
        **host-side** (``q = round(x / scale)``, ``scale = max|x| / 127``
        — the ``ops/quantize.py`` semantics): the device receives only
        the final int8 slabs + per-slot f32 scales, so peak HBM is the
        store itself; the f32 corpus never touches the device.  This is
        the staged-real-data path (``bench.py --dataset``) where the
        corpus arrives as host HDF5 rather than device-generated rows.
        """
        data = np.asarray(data, dtype=np.float32)
        bucket_ids = np.asarray(bucket_ids)
        n, d = data.shape
        if object_ids is None:
            object_ids = np.arange(1, n + 1, dtype=np.int32)
        else:
            object_ids = np.asarray(object_ids, dtype=np.int32)

        from learnedmetricindex_tpu import native

        counts = native.bincount(bucket_ids, n_buckets)
        nchunks = -(-counts // chunk)
        starts = np.concatenate([[0], np.cumsum(nchunks)]).astype(np.int32)
        total_chunks = int(starts[-1])
        padded = total_chunks * chunk
        slot_rows, _ = native.fill_slots(
            bucket_ids, starts.astype(np.int64) * chunk, padded
        )
        valid = slot_rows >= 0

        from learnedmetricindex_tpu.ops.quantize import (
            quantize_with_scales_np,
            row_scales_np,
        )

        # BLOCK-WISE host packing: one-shot fancy indexing + quantize
        # materializes ~3 extra f32 corpus copies (gather copy, divide
        # temp, abs temp) — ~120 GB transient at 10M×768, which
        # OOM-killed the staged 2-level rehearsal on a 125 GB host.
        # Blocked, the transient is ~3 × BLOCK×d f32 ≈ 9 GB and the
        # resident peak stays ≈ corpus + int8 store.
        BLOCK = 1_000_000
        row_scales = np.empty(n, dtype=np.float32)
        for s in range(0, n, BLOCK):
            row_scales[s:s + BLOCK] = row_scales_np(data[s:s + BLOCK])
        flat = np.zeros((padded, d), dtype=np.int8)
        valid_idx = np.nonzero(valid)[0]
        for s in range(0, len(valid_idx), BLOCK):
            vi = valid_idx[s:s + BLOCK]
            rows = slot_rows[vi]
            flat[vi] = quantize_with_scales_np(
                data[rows], row_scales[rows]
            )
        slot_scales = np.zeros(padded, dtype=np.float32)
        slot_scales[valid] = row_scales[slot_rows[valid]]
        ids = np.zeros(padded, dtype=np.int32)
        ids[valid] = object_ids[slot_rows[valid]]

        max_id = int(object_ids.max()) if len(object_ids) else 0
        row_slot = np.zeros(max_id, dtype=np.int32)
        row_slot[ids[valid] - 1] = np.nonzero(valid)[0].astype(np.int32)

        return cls(
            chunk_data=jnp.asarray(flat),
            chunk_ids=jnp.asarray(ids.reshape(total_chunks, chunk)),
            chunk_scales=jnp.asarray(slot_scales),
            bucket_chunk_start=starts,
            bucket_sizes=counts.astype(np.int32),
            chunk=chunk,
            n_buckets=n_buckets,
            row_slot=jnp.asarray(row_slot),
        )

    @classmethod
    def build_virtual(
        cls,
        data_ref: jnp.ndarray,
        bucket_ids: np.ndarray,
        n_buckets: int,
        chunk: int = 2048,
    ) -> "BucketStore":
        """Index-only layout over an unmoved device array: only the
        (n_chunks, chunk) id grid is materialized (host-side counting
        sort on indices; the 10M×768 data itself never moves)."""
        from learnedmetricindex_tpu import native

        bucket_ids = np.asarray(bucket_ids)
        n = bucket_ids.shape[0]
        assert data_ref.shape[0] >= n

        counts = native.bincount(bucket_ids, n_buckets)
        nchunks = -(-counts // chunk)
        starts = np.concatenate([[0], np.cumsum(nchunks)]).astype(np.int32)
        total_chunks = int(starts[-1])

        # 1-based object ids == row + 1, filled by the native engine
        ids = native.fill_slots_1based(
            bucket_ids, starts.astype(np.int64) * chunk, total_chunks * chunk
        )

        return cls(
            data_ref=data_ref,
            chunk_ids=jnp.asarray(ids.reshape(total_chunks, chunk)),
            bucket_chunk_start=starts,
            bucket_sizes=counts.astype(np.int32),
            chunk=chunk,
            n_buckets=n_buckets,
        )

    @classmethod
    def build_packed_device(
        cls,
        data_ref: jnp.ndarray,
        bucket_ids: np.ndarray,
        n_buckets: int,
        chunk: int = 2048,
        row_scales: Optional[jnp.ndarray] = None,
        slab_batch: int = 128,
    ) -> "BucketStore":
        """Materialize a *packed* store from a device-resident corpus.

        One pass of slab-sized gathers (donated updates into a
        preallocated buffer), after which scans read contiguous DMA
        slabs at full HBM speed instead of 1.5 KB random row gathers —
        at the price of a second corpus-sized buffer (halve it with an
        int8 corpus + ``row_scales``).  The caller may drop the original
        corpus afterwards; the store is self-contained.
        """
        virtual = cls.build_virtual(data_ref, bucket_ids, n_buckets, chunk)
        nch = virtual.n_chunks
        d = data_ref.shape[1]

        # inverse mapping (object id-1 → slot) for the exact rerank stage
        from learnedmetricindex_tpu import native

        ids_host = native.fill_slots_1based(
            np.asarray(bucket_ids),
            virtual.bucket_chunk_start.astype(np.int64) * chunk,
            nch * chunk,
        )
        row_slot = np.empty(len(bucket_ids), dtype=np.int32)
        valid = ids_host > 0
        row_slot[ids_host[valid] - 1] = np.nonzero(valid)[0].astype(np.int32)

        @functools.partial(
            jax.jit, donate_argnums=(0,), static_argnames=("start",)
        )
        def pack_slab(out, cids, data, *, start):
            slab = data[jnp.maximum(cids.reshape(-1) - 1, 0)]
            return jax.lax.dynamic_update_slice(out, slab, (start, 0))

        @functools.partial(
            jax.jit, donate_argnums=(0,), static_argnames=("start",)
        )
        def pack_scales(out, cids, scales, *, start):
            flat_ids = cids.reshape(-1)
            slab = jnp.where(
                flat_ids > 0, scales[jnp.maximum(flat_ids - 1, 0)], 0.0
            )
            return jax.lax.dynamic_update_slice(out, slab, (start,))

        chunk_data = jnp.zeros((nch * chunk, d), dtype=data_ref.dtype)
        chunk_scales = None
        if row_scales is not None:
            chunk_scales = jnp.zeros((nch * chunk,), jnp.float32)
        for s0 in range(0, nch, slab_batch):
            e = min(s0 + slab_batch, nch)
            cids = virtual.chunk_ids[s0:e]
            chunk_data = pack_slab(chunk_data, cids, data_ref, start=s0 * chunk)
            if row_scales is not None:
                chunk_scales = pack_scales(
                    chunk_scales, cids, jnp.asarray(row_scales), start=s0 * chunk
                )
        jax.block_until_ready(chunk_data)
        return virtual._replace(
            data_ref=None,
            row_scales=None,
            chunk_data=chunk_data,
            chunk_scales=chunk_scales,
            row_slot=jnp.asarray(row_slot),
        )

    def nbytes(self) -> int:
        data_bytes = self.chunk_data.nbytes if self.chunk_data is not None else 0
        return data_bytes + self.chunk_ids.nbytes


class ScanPlan(NamedTuple):
    """Host-built execution plan for one visit-set (see module docstring)."""

    qidx: np.ndarray  # (QP,) query index per padded pair slot, -1 = pad
    item_q_start: np.ndarray  # (W,) slot offset of each item's query tile
    item_chunk: np.ndarray  # (W,) chunk processed by each item
    n_queries: int
    qtile: int
    pair_slot: Optional[np.ndarray] = None  # (Q*V,) slot of each
    # (query, visit) pair in row-major bucket_order, -1 = unused visit
    item_meta: Optional[np.ndarray] = None  # (W,) packed Pallas-kernel
    # metadata: pair<<6 | tile_in_group<<2 | is_first_chunk<<1 |
    # is_last_chunk (see ops.scan_kernel bit-layout constants)


def build_scan_plan(
    store: BucketStore, bucket_order: np.ndarray, qtile: int = 128
) -> ScanPlan:
    """Expand per-query visit lists into the flat uniform work list.

    ``bucket_order``: (Q, V) int bucket indices, -1 for unused slots.
    """
    Q, V = bucket_order.shape
    if store.bucket_chunk_list is not None:
        # mutated store: per-bucket chunk indirection (see BucketStore)
        ptr = store.bucket_chunk_ptr.astype(np.int64)
        chunk_list = store.bucket_chunk_list
        nchunks_all = ptr[1:] - ptr[:-1]
    else:
        ptr = store.bucket_chunk_start.astype(np.int64)
        chunk_list = None
        nchunks_all = ptr[1:] - ptr[:-1]

    # --- (query, bucket) pairs, sorted by bucket --------------------
    q_of_pair = np.repeat(np.arange(Q, dtype=np.int64), V)
    b_of_pair = bucket_order.reshape(-1).astype(np.int64)
    keep = b_of_pair >= 0
    q_of_pair, b_of_pair = q_of_pair[keep], b_of_pair[keep]
    order = np.argsort(b_of_pair, kind="stable")
    q_sorted, b_sorted = q_of_pair[order], b_of_pair[order]

    pair_counts = np.bincount(b_sorted, minlength=store.n_buckets)
    padded_counts = -(-pair_counts // qtile) * qtile  # 0 stays 0
    pad_starts = np.concatenate([[0], np.cumsum(padded_counts)[:-1]])
    QP = int(padded_counts.sum())

    src_starts = np.concatenate([[0], np.cumsum(pair_counts)[:-1]])
    slot = pad_starts[b_sorted] + np.arange(len(b_sorted)) - src_starts[b_sorted]
    qidx = np.full(QP, -1, dtype=np.int32)
    qidx[slot] = q_sorted
    # inverse map for the dense merge: (query, visit) → its slot (the
    # kernel's candidate-row index); -1 where bucket_order was -1
    pair_slot = np.full(Q * V, -1, dtype=np.int32)
    pair_slot[np.nonzero(keep)[0][order]] = slot.astype(np.int32)

    # --- work items: for bucket b, for tile-GROUP g, for chunk c, for
    # tile t within the group (slab-residency order) ------------------
    # Grouping amortizes slab DMA: within a group, one chunk's slab
    # serves up to TILE_GROUP query tiles before the next chunk streams
    # in (consecutive items share the slab block index, so the Pallas
    # pipeline skips the re-fetch).  The ungrouped (b, t, c) order
    # re-reads every slab once per tile — ~T× the HBM traffic of the
    # store itself at T tiles/bucket.  Measured wall-time NEUTRAL at
    # the flagship shape (kernel is VPU-bound, DMA overlapped — see
    # ops/scan_kernel.py); kept for DMA headroom at visit-heavy /
    # wide-dtype shapes.  (Successor of reference hot loop #6,
    # ``LearnedIndex.py:360-368``.)
    # The XLA engine consumes the same items and is order-independent.
    from learnedmetricindex_tpu.ops.scan_kernel import (
        META_FIRST,
        META_LAST,
        META_PAIR_SHIFT,
        META_TILE_SHIFT,
        TILE_GROUP,
    )

    # A/B knob: LMI_TILE_GROUP=1 reproduces the ungrouped (bucket,
    # tile, chunk) order (one slab stream per tile); values >16 would
    # overflow the 4 meta bits (the kernel's scratch is sized for
    # TILE_GROUP, so larger-than-default values also need a kernel
    # rebuild — clamp instead)
    G = min(max(int(os.environ.get("LMI_TILE_GROUP", TILE_GROUP)), 1),
            TILE_GROUP)
    ntiles = padded_counts // qtile  # per bucket
    nchunks = nchunks_all
    items_per_bucket = ntiles * nchunks
    W = int(items_per_bucket.sum())
    item_base = np.concatenate([[0], np.cumsum(items_per_bucket)[:-1]])

    active = np.nonzero(items_per_bucket)[0]
    rep_b = np.repeat(active, items_per_bucket[active])
    within = np.arange(W, dtype=np.int64) - item_base[rep_b]
    Tb = ntiles[rep_b]
    Cb = nchunks[rep_b]
    # item index within bucket = C·G·g + c·gsize + t_in_group, where
    # gsize = min(G, T - g·G) (the last group may be partial)
    g = within // (Cb * G)
    gsize = np.minimum(G, Tb - g * G)
    rem = within - Cb * G * g
    c_of_item = rem // gsize
    t_in_group = rem % gsize
    t_of_item = g * G + t_in_group
    item_q_start = (pad_starts[rep_b] + t_of_item * qtile).astype(np.int32)
    if chunk_list is not None:
        item_chunk = chunk_list[ptr[rep_b] + c_of_item].astype(np.int32)
    else:
        item_chunk = (ptr[rep_b] + c_of_item).astype(np.int32)

    pair = pad_starts[rep_b] // qtile + t_of_item
    assert QP // qtile < (1 << (31 - META_PAIR_SHIFT)), (
        "pair index overflows the packed item metadata"
    )
    item_meta = (
        (pair << META_PAIR_SHIFT)
        | (t_in_group << META_TILE_SHIFT)
        | np.where(c_of_item == 0, META_FIRST, 0)
        | np.where(c_of_item == Cb - 1, META_LAST, 0)
    ).astype(np.int32)

    return ScanPlan(
        qidx=qidx,
        item_q_start=item_q_start,
        item_chunk=item_chunk,
        n_queries=Q,
        qtile=qtile,
        pair_slot=pair_slot,
        item_meta=item_meta,
    )


@jax.jit
def _gather_work_queries(queries, qidx):
    """(QP, d) query row per padded pair slot (zeros on -1 padding)."""
    wq = queries[jnp.maximum(qidx, 0)]
    return jnp.where((qidx >= 0)[:, None], wq, 0.0)


def _gather_rows_fast(table, idx, *, use_kernel: bool):
    """``table[idx]`` through the Pallas VMEM-resident gather kernel
    when the table qualifies (fits the VMEM budget, lane-aligned rows,
    real TPU) — XLA's per-row gather chain is latency-bound at
    ~0.3–0.7 µs/row (tools/probe_fused.py) across the query-tile and
    merge stages of the fused dispatch.  Out-of-range / negative
    indices clamp; callers mask downstream (the exact contract the
    XLA gathers had)."""
    from learnedmetricindex_tpu.ops import gather_kernel as gk

    if (
        use_kernel
        and gk.gather_rows_ok(table)
        and table.size * table.dtype.itemsize <= gk.VMEM_TABLE_BYTES
    ):
        return gk.gather_rows(table, idx)
    return table[jnp.clip(idx, 0, table.shape[0] - 1)]


def _item_topk(dists, k, approx_recall):
    """Per-row smallest-k of an item's distance block.

    The exact path is k passes of (min, argmin, mask) on the VPU —
    measured 12× faster than ``lax.top_k`` (which lowers to a full
    sort on TPU) and 2× faster than ``lax.approx_max_k`` (the hardware
    PartialReduce op, TPU-KNN arXiv:2206.14286) for k ≈ 10-16.  Ties
    break toward the first index, like the reference's stable ordering.
    ``approx_recall`` switches to the PartialReduce op (useful for
    k ≳ 64 where the k-pass loop loses).
    """
    if approx_recall is not None:
        neg, pos = jax.lax.approx_max_k(
            -dists, k, recall_target=float(approx_recall)
        )
        return -neg, pos
    vals, idxs = [], []
    d = dists
    for _ in range(k):
        vals.append(jnp.min(d, axis=-1))
        am = jnp.argmin(d, axis=-1)
        idxs.append(am)
        d = jnp.where(
            jax.nn.one_hot(am, d.shape[-1], dtype=bool), jnp.inf, d
        )
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("k", "qtile", "items_per_step", "precision",
                     "approx_recall"),
)
def _scan_items(
    work_queries: jnp.ndarray,  # (QP, d) pre-gathered per-slot query rows
    qidx: jnp.ndarray,  # (QP,)
    item_q_start: jnp.ndarray,  # (Wp,) padded to items_per_step multiple
    item_chunk: jnp.ndarray,  # (Wp,)
    item_valid: jnp.ndarray,  # (Wp,) bool
    chunk_data: jnp.ndarray,
    chunk_ids: jnp.ndarray,
    chunk_scales,  # (n_slots,) f32 or None (int8 stores)
    *,
    k: int,
    qtile: int,
    items_per_step: int,
    precision: str,
    approx_recall=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Phase 1 (packed): per-item distances + top-k candidates.

    Every read is a contiguous ``dynamic_slice`` DMA: the chunk slab,
    its id/scale rows, and the pre-gathered query tile (gathering the
    query rows per item would re-fetch each tile once per chunk of its
    bucket).  Dequantization scales multiply the similarity *columns*
    (qtile × chunk) rather than the slab (chunk × d) — ~6× fewer VPU
    ops.  Index-array gathers are avoided throughout: XLA:TPU lowers
    them orders of magnitude slower than slice DMAs.
    """
    Wp = item_q_start.shape[0]
    S = items_per_step
    steps = Wp // S
    chunk = chunk_ids.shape[1]
    d = chunk_data.shape[1]
    prec = (
        jax.lax.Precision.HIGHEST if precision == "highest" else jax.lax.Precision.DEFAULT
    )

    def body(_, inputs):
        q_start, chunk_idx, valid = inputs
        qv = jnp.stack(
            [
                jax.lax.dynamic_slice(work_queries, (q_start[j], 0), (qtile, d))
                for j in range(S)
            ]
        )  # (S, qtile, d)
        qi = jnp.stack(
            [
                jax.lax.dynamic_slice(qidx, (q_start[j],), (qtile,))
                for j in range(S)
            ]
        )  # (S, qtile)
        cd = jnp.stack(
            [
                jax.lax.dynamic_slice(
                    chunk_data, (chunk_idx[j] * chunk, 0), (chunk, d)
                )
                for j in range(S)
            ]
        ).astype(jnp.float32)  # (S, chunk, d)
        ids = jnp.stack(
            [
                jax.lax.dynamic_slice_in_dim(chunk_ids, chunk_idx[j], 1, 0)[0]
                for j in range(S)
            ]
        )  # (S, chunk)
        sims = jnp.einsum(
            "sqd,scd->sqc", qv, cd,
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        if chunk_scales is not None:
            sc = jnp.stack(
                [
                    jax.lax.dynamic_slice(
                        chunk_scales, (chunk_idx[j] * chunk,), (chunk,)
                    )
                    for j in range(S)
                ]
            )  # (S, chunk)
            sims = sims * sc[:, None, :]
        dists = 1.0 - sims
        dists = jnp.where(ids[:, None, :] == 0, jnp.inf, dists)
        dists = jnp.where(qi[:, :, None] < 0, jnp.inf, dists)
        dists = jnp.where(valid[:, None, None], dists, jnp.inf)
        neg, pos = _item_topk(dists, k, approx_recall)  # (S, qtile, k)
        cid = jnp.take_along_axis(
            jnp.broadcast_to(ids[:, None, :], dists.shape), pos, axis=2
        )
        return None, (neg, cid, qi)

    _, (cd_out, ci_out, cq_out) = jax.lax.scan(
        body,
        None,
        (
            item_q_start.reshape(steps, S),
            item_chunk.reshape(steps, S),
            item_valid.reshape(steps, S),
        ),
    )
    # (steps, S, qtile, k) → (Wp * qtile, k)
    cand_d = cd_out.reshape(Wp * qtile, k)
    cand_i = ci_out.reshape(Wp * qtile, k)
    cand_q = cq_out.reshape(Wp * qtile)
    return cand_d, cand_i, cand_q


@functools.partial(
    jax.jit,
    static_argnames=("k", "qtile", "items_per_step", "precision",
                     "approx_recall"),
)
def _scan_items_virtual(
    work_queries: jnp.ndarray,  # (QP, d) pre-gathered per-slot query rows
    qidx: jnp.ndarray,  # (QP,)
    item_q_start: jnp.ndarray,  # (Wp,)
    item_chunk: jnp.ndarray,  # (Wp,)
    item_valid: jnp.ndarray,  # (Wp,) bool
    data_ref: jnp.ndarray,  # (n, d) unmoved dataset
    chunk_ids: jnp.ndarray,  # (n_chunks, chunk)
    row_scales,  # (n,) f32 or None (int8 corpora)
    *,
    k: int,
    qtile: int,
    items_per_step: int,
    precision: str,
    approx_recall=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Phase 1 over a virtual store: the chunk slab is gathered row-wise
    from ``data_ref`` through the id grid (ids are 1-based rows)."""
    Wp = item_q_start.shape[0]
    S = items_per_step
    steps = Wp // S
    prec = (
        jax.lax.Precision.HIGHEST if precision == "highest" else jax.lax.Precision.DEFAULT
    )

    d = data_ref.shape[1]

    def body(_, inputs):
        q_start, chunk_idx, valid = inputs
        qv = jnp.stack(
            [
                jax.lax.dynamic_slice(work_queries, (q_start[j], 0), (qtile, d))
                for j in range(S)
            ]
        )  # (S, qtile, d)
        qi = jnp.stack(
            [
                jax.lax.dynamic_slice(qidx, (q_start[j],), (qtile,))
                for j in range(S)
            ]
        )  # (S, qtile)
        ids = jnp.stack(
            [
                jax.lax.dynamic_slice_in_dim(chunk_ids, chunk_idx[j], 1, 0)[0]
                for j in range(S)
            ]
        )  # (S, chunk)
        cd = data_ref[jnp.maximum(ids - 1, 0)].astype(jnp.float32)
        sims = jnp.einsum(
            "sqd,scd->sqc", qv, cd,
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        if row_scales is not None:
            sims = sims * row_scales[jnp.maximum(ids - 1, 0)][:, None, :]
        dists = 1.0 - sims
        dists = jnp.where(ids[:, None, :] == 0, jnp.inf, dists)
        dists = jnp.where(qi[:, :, None] < 0, jnp.inf, dists)
        dists = jnp.where(valid[:, None, None], dists, jnp.inf)
        neg, pos = _item_topk(dists, k, approx_recall)
        cid = jnp.take_along_axis(
            jnp.broadcast_to(ids[:, None, :], dists.shape), pos, axis=2
        )
        return None, (neg, cid, qi)

    _, (cd_out, ci_out, cq_out) = jax.lax.scan(
        body,
        None,
        (
            item_q_start.reshape(steps, S),
            item_chunk.reshape(steps, S),
            item_valid.reshape(steps, S),
        ),
    )
    cand_d = cd_out.reshape(Wp * qtile, k)
    cand_i = ci_out.reshape(Wp * qtile, k)
    cand_q = cq_out.reshape(Wp * qtile)
    return cand_d, cand_i, cand_q


@functools.partial(jax.jit, static_argnames=("k", "n_queries"))
def _merge_candidates(
    cand_d: jnp.ndarray,  # (R, k)
    cand_i: jnp.ndarray,  # (R, k)
    cand_q: jnp.ndarray,  # (R,) owning query of each candidate row, -1 pad
    *,
    k: int,
    n_queries: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Phase 2: global per-query top-k via one stable multi-key sort.

    A gather-based merge (index candidate rows per query) lowers to
    millions of tiny slice-gathers, which XLA:TPU executes pathologically
    slowly; sorting all candidates by ``(query, distance)`` and slicing
    the first k per query is orders of magnitude faster on the VPU.  The
    sort is stable, so equal distances resolve toward the earlier
    candidate (bucket-index order), mirroring the reference's stable
    merge (``LearnedIndex.py:125-146``).
    """
    R = cand_d.shape[0]
    q_key = jnp.where(cand_q < 0, n_queries, cand_q).astype(jnp.int32)
    q_rep = jnp.repeat(q_key, k, total_repeat_length=R * k)
    d_flat = cand_d.reshape(R * k)
    i_flat = cand_i.reshape(R * k)
    q_s, d_s, i_s = jax.lax.sort((q_rep, d_flat, i_flat), num_keys=2)

    starts = jnp.searchsorted(q_s, jnp.arange(n_queries, dtype=jnp.int32))
    idx = jnp.minimum(starts[:, None] + jnp.arange(k)[None, :], R * k - 1)
    out_d = d_s[idx]
    out_i = i_s[idx]
    valid = (q_s[idx] == jnp.arange(n_queries, dtype=jnp.int32)[:, None]) & (
        ~jnp.isinf(out_d)
    )
    out_d = jnp.where(valid, out_d, jnp.inf)
    out_i = jnp.where(valid, out_i, 0)  # cf. LearnedIndex.py:340-341
    return out_d, out_i


def _pack_plan_blob(qidx, item_meta, item_chunk, w_real, pair_rows, pair_ok):
    """All per-call host plan arrays as ONE int32 buffer.  Six separate
    host→device uploads each pay a relay round-trip; one ~400 KB blob
    pays one, and the jitted scan slices it back out for free (static
    offsets — the program already specializes on these shapes)."""
    return np.concatenate([
        np.asarray(qidx, np.int32),
        np.asarray(item_meta, np.int32),
        np.asarray(item_chunk, np.int32),
        np.asarray(w_real, np.int32).reshape(-1),
        np.asarray(pair_rows, np.int32),
        np.asarray(pair_ok, np.int32),
    ])


@functools.partial(
    jax.jit,
    static_argnames=(
        "W", "k_scan", "k", "qtile", "chunk", "n_pairs", "compute",
        "interpret", "rerank", "n_visits", "gate", "gather_mode",
    ),
)
def _scan_fused_pallas(
    plan_blob,  # (QP + 2W + 1 + 2QV,) int32 — see _pack_plan_blob
    chunk_data,  # (n_slots, d) packed store
    scales_flat,  # (n_slots,) f32, 0.0 = pad slot
    ids_flat,  # (n_slots,) int32 1-based object ids
    queries_all,  # (Q, d) f32
    *,
    W: int,
    k_scan: int,
    k: int,
    qtile: int,
    chunk: int,
    n_pairs: int,
    compute: str,
    interpret: bool,
    rerank: bool,
    n_visits: int,
    gate: str = "count",
    gather_mode: str = "auto",
):
    """The whole Pallas-engine scan — query-tile gather, kernel, dense
    merge, optional exact rerank, id resolution — as ONE jitted
    dispatch over ONE uploaded plan blob.  Issuing these as separate
    device calls costs one relay round-trip each on the remote TPU (the
    dominant per-search fixed overhead once phase 1 is fast)."""
    from learnedmetricindex_tpu.ops.scan_kernel import pallas_scan_pairs

    QP = n_pairs * qtile
    QV = queries_all.shape[0] * n_visits
    qidx = plan_blob[:QP]
    item_meta = plan_blob[QP : QP + W]
    item_chunk = plan_blob[QP + W : QP + 2 * W]
    w_real = plan_blob[QP + 2 * W : QP + 2 * W + 1]
    pair_rows = plan_blob[QP + 2 * W + 1 : QP + 2 * W + 1 + QV]
    pair_ok = plan_blob[QP + 2 * W + 1 + QV :] != 0
    return _fused_core(
        qidx, item_meta, item_chunk, w_real, pair_rows, pair_ok,
        chunk_data, scales_flat, ids_flat, queries_all,
        k_scan=k_scan, k=k, qtile=qtile, chunk=chunk, n_pairs=n_pairs,
        compute=compute, interpret=interpret, rerank=rerank,
        n_visits=n_visits, gate=gate, gather_mode=gather_mode,
    )


def _fused_core(
    qidx, item_meta, item_chunk, w_real, pair_rows, pair_ok,
    chunk_data, scales_flat, ids_flat, queries_all,
    *, k_scan, k, qtile, chunk, n_pairs, compute, interpret, rerank,
    n_visits, gate, gather_mode="auto",
):
    """Traced body shared by the blob path (``_scan_fused_pallas``) and
    the device-plan path (``_scan_device_plan``): query-tile gather,
    Pallas kernel, dense merge, optional exact rerank, id resolution,
    one flat packed output."""
    from learnedmetricindex_tpu.ops.scan_kernel import pallas_scan_pairs

    # "auto" resolves to the XLA gathers: the in-situ A/B
    # (tools/ab_gather.py, 8M store, interleaved full dispatches)
    # measured xla 154.2 ms vs kernel 154.5 ms median — the per-stage
    # "27/29/33 ms gather" numbers that motivated the Pallas gathers
    # were relay-timing artifacts (block_until_ready is a free async
    # enqueue on axon), not device time.  The kernels stay as opt-in
    # instrumentation (LMI_GATHER_MODE=kernel) with bitwise-identical
    # results.
    use_kernel = gather_mode == "kernel"
    qscale2d = None
    if compute == "int8":
        # default: quantize BEFORE the work-tile gather (quantize_rows
        # is per-row, so quantize(queries)[g] == quantize(queries[g])
        # bit-for-bit) — the gather moves int8 rows and the quantize
        # runs over Q rows instead of QP ≈ 4.6 Q.  Kernel mode gathers
        # the f32 rows instead (the Pallas copy path vectorizes f32)
        # and quantizes the gathered tiles — same bits either way.
        from learnedmetricindex_tpu.ops.quantize import quantize_rows

        valid = qidx >= 0
        if use_kernel:
            wq_f = jnp.where(
                valid[:, None],
                _gather_rows_fast(queries_all, qidx, use_kernel=True),
                0.0,
            )
            work_queries, wq_sc = quantize_rows(wq_f)
            qscale2d = jnp.where(valid, wq_sc, 0.0).reshape(
                n_pairs, qtile
            )
        else:
            q_int, q_sc_all = quantize_rows(queries_all)
            g = jnp.maximum(qidx, 0)
            work_queries = jnp.where(valid[:, None], q_int[g], 0)
            qscale2d = jnp.where(valid, q_sc_all[g], 0.0).reshape(
                n_pairs, qtile
            )
    else:
        work_queries = jnp.where(
            (qidx >= 0)[:, None],
            _gather_rows_fast(queries_all, qidx, use_kernel=use_kernel),
            0.0,
        )
    cand_d, cand_slot = pallas_scan_pairs(
        work_queries,
        item_meta,
        item_chunk,
        w_real,
        chunk_data,
        scales_flat,
        qscale2d,
        k=k_scan,
        qtile=qtile,
        chunk=chunk,
        n_pairs=n_pairs,
        compute=compute,
        interpret=interpret,
        gate=gate,
    )
    # Merge and rerank on SLOT indices; object ids resolve with one
    # (Q, k) gather at the very end.  Resolving ids for every candidate
    # up front (R × k_scan ≈ 580k elements at the flagship shape) was
    # ~0.06 s of the 0.17 s dispatch — XLA:TPU per-element gathers are
    # pathological, and the final result needs only Q × k of them.
    R = (n_pairs + 1) * qtile
    dists, slots = _merge_pairs_dense(
        cand_d.reshape(R, k_scan),
        cand_slot.reshape(R, k_scan),
        pair_rows,
        pair_ok,
        k=k_scan,
        V=n_visits,
        use_kernel=use_kernel,
    )
    if rerank:
        dists, slots = _rerank_exact_slots(
            dists, slots, queries_all, chunk_data, scales_flat, k=k
        )
    ids = jnp.where(slots >= 0, ids_flat[jnp.maximum(slots, 0)], 0)
    # ONE packed FLAT output array: a host VALUE readback through the
    # axon relay costs ~33 ms flat (probe_rtt; block_until_ready is a
    # free async enqueue), so dists and ids return as one transfer —
    # and a (Q, k) device array is lane-padded k→128, so the wire
    # would carry ~10× the real bytes; a 1-D array keeps the compact
    # T(1024) layout.  Measured: two (Q, 12) readbacks 110 ms → one
    # flat readback ~45 ms.  Bits ride in int space (f32 views of ints
    # are denormals the TPU flushes — see _merge_pairs_dense).
    return jnp.stack(
        [jax.lax.bitcast_convert_type(dists, jnp.int32), ids]
    ).reshape(-1)


def _build_plan_device(
    bucket_order,  # (Q, V) int32 device, -1 = unused visit
    ptr,  # (n_buckets + 1,) int32 chunk CSR (device)
    chunk_of,  # (n_assigned,) int32: CSR position → physical chunk
    *,
    qtile: int,
    G: int,
    QP_env: int,
    W_env: int,
):
    """All-device ``build_scan_plan`` + ``pallas_host_args``: the same
    (bucket, tile-group, chunk, tile-in-group) work list, built from a
    DEVICE-resident navigation result — no bucket_order readback (a
    ~33 ms relay round-trip per search) and no plan-blob upload.

    Shapes are static ENVELOPES: ``QP_env`` bounds the padded pair
    slots exactly (per-bucket padding < qtile each), ``W_env`` is a
    heuristic bound on the work list — the returned ``w_actual``
    exceeds it when navigation concentrates visits on large buckets,
    and the caller must then fall back to the host plan (the packed
    result carries the flag out in the same readback).
    """
    from learnedmetricindex_tpu.ops.scan_kernel import (
        META_FIRST,
        META_LAST,
        META_PAIR_SHIFT,
        META_TILE_SHIFT,
        pad_item_meta,
    )

    Q, V = bucket_order.shape
    QV = Q * V
    n_buckets = ptr.shape[0] - 1
    n_pairs_env = QP_env // qtile
    i32 = jnp.int32

    b_of = bucket_order.reshape(-1).astype(i32)  # (QV,)
    valid = b_of >= 0
    bq = jnp.where(valid, b_of, n_buckets)  # invalid pairs sort last
    order = jnp.argsort(bq, stable=True).astype(i32)
    b_sorted = bq[order]
    q_sorted = (order // V).astype(i32)
    valid_sorted = b_sorted < n_buckets

    counts = jnp.bincount(bq, length=n_buckets + 1)[:n_buckets].astype(i32)
    padded = -(-counts // qtile) * qtile
    pad_starts = jnp.concatenate(
        [jnp.zeros(1, i32), jnp.cumsum(padded)[:-1].astype(i32)]
    )
    src_starts = jnp.concatenate(
        [jnp.zeros(1, i32), jnp.cumsum(counts)[:-1].astype(i32)]
    )
    bs = jnp.minimum(b_sorted, n_buckets - 1)
    rank = jnp.arange(QV, dtype=i32) - src_starts[bs]
    slot = pad_starts[bs] + rank  # (QV,) padded pair slot
    slot = jnp.where(valid_sorted, slot, QP_env)

    qidx = jnp.full(QP_env, -1, i32).at[slot].set(q_sorted, mode="drop")
    # inverse map in ORIGINAL (query, visit) order
    pair_slot = (
        jnp.full(QV, -1, i32).at[order].set(jnp.where(
            valid_sorted, slot, -1
        ))
    )

    # ---- work items (same arithmetic as the host builder) ----------
    nchunks = (ptr[1:] - ptr[:-1]).astype(i32)
    ntiles = padded // qtile
    items_pb = ntiles * nchunks
    cum = jnp.cumsum(items_pb).astype(i32)  # inclusive
    w_actual = cum[-1]

    w_iota = jnp.arange(W_env, dtype=i32)
    bkt = jnp.searchsorted(cum, w_iota, side="right").astype(i32)
    in_range = w_iota < w_actual
    bc = jnp.minimum(bkt, n_buckets - 1)
    within = w_iota - (cum[bc] - items_pb[bc])
    Tb = ntiles[bc]
    Cb = jnp.maximum(nchunks[bc], 1)
    g = within // (Cb * G)
    gsize = jnp.maximum(jnp.minimum(G, Tb - g * G), 1)
    rem = within - Cb * G * g
    c = rem // gsize
    t_in_g = rem % gsize
    t = g * G + t_in_g
    item_chunk = jnp.where(in_range, chunk_of[ptr[bc] + c], 0)
    pair = pad_starts[bc] // qtile + t
    meta = (
        (pair << META_PAIR_SHIFT)
        | (t_in_g << META_TILE_SHIFT)
        | jnp.where(c == 0, META_FIRST, 0)
        | jnp.where(c == Cb - 1, META_LAST, 0)
    )
    item_meta = jnp.where(
        in_range, meta, pad_item_meta(n_pairs_env)
    ).astype(i32)
    w_real = jnp.minimum(w_actual, W_env).reshape(1)

    # ---- dense-merge map -------------------------------------------
    pair_written = (
        jnp.zeros(n_pairs_env + 1, bool)
        .at[jnp.where(in_range, pair, n_pairs_env)]
        .set(True, mode="drop")
        .at[n_pairs_env]
        .set(False)
    )
    ok = pair_slot >= 0
    pair_rows = jnp.where(ok, pair_slot, n_pairs_env * qtile)
    pair_ok = ok & pair_written[
        jnp.minimum(pair_rows // qtile, n_pairs_env)
    ]
    return (
        qidx, item_meta, item_chunk, w_real, pair_rows, pair_ok, w_actual
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_scan", "k", "qtile", "chunk", "compute", "interpret",
        "rerank", "gate", "G", "QP_env", "W_env", "gather_mode",
    ),
)
def _scan_device_plan(
    bucket_order,  # (Q, V) int32 DEVICE array (navigation output)
    ptr,  # (n_buckets + 1,) int32 chunk CSR
    chunk_of,  # (n_assigned,) int32 CSR position → physical chunk
    chunk_data,
    scales_flat,
    ids_flat,
    queries_all,
    *,
    k_scan: int,
    k: int,
    qtile: int,
    chunk: int,
    compute: str,
    interpret: bool,
    rerank: bool,
    gate: str,
    G: int,
    QP_env: int,
    W_env: int,
    gather_mode: str = "auto",
):
    """ZERO-SYNC search dispatch: plan building + kernel + merge +
    rerank + id resolve in one jitted call over the DEVICE navigation
    result.  vs the blob path this removes the per-search
    bucket_order readback (~33 ms relay RTT) and the plan upload; the
    host sees only the final flat packed result, whose LAST element is
    ``w_actual`` — when it exceeds the static ``W_env`` envelope the
    results are invalid and the caller reruns via the host plan."""
    qidx, item_meta, item_chunk, w_real, pair_rows, pair_ok, w_actual = (
        _build_plan_device(
            bucket_order, ptr, chunk_of,
            qtile=qtile, G=G, QP_env=QP_env, W_env=W_env,
        )
    )
    packed = _fused_core(
        qidx, item_meta, item_chunk, w_real, pair_rows, pair_ok,
        chunk_data, scales_flat, ids_flat, queries_all,
        k_scan=k_scan, k=k, qtile=qtile, chunk=chunk,
        n_pairs=QP_env // qtile, compute=compute, interpret=interpret,
        rerank=rerank, n_visits=bucket_order.shape[1], gate=gate,
        gather_mode=gather_mode,
    )
    return jnp.concatenate([packed, w_actual.reshape(1)])


def scan_buckets_device(
    store: BucketStore,
    queries,  # (Q, d) f32 — host or device
    bucket_order,  # (Q, V) int32 DEVICE array
    k: int = 10,
    *,
    qtile: int = 128,
    precision: str = "default",
    rerank: bool = True,
    rerank_margin: int = 6,
):
    """Zero-sync Pallas scan over a device-resident navigation result.

    Returns ``(dists, ids)`` like :func:`scan_buckets`, or ``None``
    when the work list overflowed the compiled envelope (caller falls
    back to the host-plan path; the envelope hint is grown so the NEXT
    call compiles large enough).  Callers gate on
    ``_pallas_engine_usable`` and packed stores.
    """
    global LAST_ENGINE
    Q, V = int(bucket_order.shape[0]), int(bucket_order.shape[1])
    k_scan = k + rerank_margin if rerank else k
    if store.bucket_chunk_list is not None:
        ptr_np = store.bucket_chunk_ptr.astype(np.int32)
        chunk_of_np = store.bucket_chunk_list.astype(np.int32)
    else:
        ptr_np = store.bucket_chunk_start.astype(np.int32)
        chunk_of_np = None  # identity
    n_buckets = store.n_buckets
    total_chunks = int(ptr_np[-1])

    # static envelopes (sticky per store/qtile/V; key leads with
    # id(chunk_ids) so migrate_shape_hints re-keys on mutation).
    # The per-bucket padding term is bounded by the number of buckets
    # that can actually be visited — min(n_buckets, Q·V) — not the
    # total bucket count: a fine-partitioned index (tens of thousands
    # of buckets) must not allocate a work envelope proportional to
    # buckets it never touches.
    QP_env = (
        -(-(Q * V) // qtile) * qtile + min(n_buckets, Q * V) * qtile
    )
    hints = _SHAPE_HINTS.setdefault(
        (id(store.chunk_ids), "devplan", qtile, V), {}
    )
    if "W_env" not in hints:
        # balanced-visits estimate with 2× slack; grows on overflow
        nb_active = max(int((ptr_np[1:] > ptr_np[:-1]).sum()), 1)
        est = (Q * V / (nb_active * qtile) + 1.0) * total_chunks
        hints["W_env"] = int(2 * est) + 8
    W_env = -(-hints["W_env"] // 8) * 8

    from learnedmetricindex_tpu.ops.scan_kernel import META_PAIR_SHIFT

    if QP_env // qtile >= (1 << (31 - META_PAIR_SHIFT)):
        return None  # pair id would overflow the packed metadata

    # cached CSR device arrays, revalidated BY OBJECT IDENTITY against
    # the store's current host metadata: every mutation replaces these
    # arrays, and a migrated hint must not carry a stale chunk map.
    # The cache holds only a WEAK reference to the host metadata (plus
    # a finalizer that clears the cached device arrays when the store's
    # host arrays are collected) — a strong ref here pinned dead
    # stores' CSR device arrays until LRU eviction happened to fire.
    src = (store.bucket_chunk_start, store.bucket_chunk_list)
    dev_cache = hints.setdefault("dev_arrays", {})
    cached = dev_cache.get("src")
    if cached is None or cached[0]() is not src[0] or (
        (cached[1]() if cached[1] is not None else None)
        is not src[1]
    ):
        dev_cache.clear()
        dev_cache["src"] = (
            weakref.ref(src[0]),
            weakref.ref(src[1]) if src[1] is not None else None,
        )
        dev_cache["ptr"] = jnp.asarray(ptr_np)
        dev_cache["chunk_of"] = jnp.asarray(
            chunk_of_np
            if chunk_of_np is not None
            else np.arange(max(total_chunks, 1), dtype=np.int32)
        )
        # release the device arrays the moment the host metadata dies
        # (id() recycling is also impossible to confuse: a dead weakref
        # never compares identical to a live array)
        weakref.finalize(src[0], dev_cache.clear)
    if store.chunk_scales is not None:
        scales_flat = store.chunk_scales.reshape(-1)
    else:
        scales_flat = (store.chunk_ids.reshape(-1) > 0).astype(jnp.float32)

    G = min(max(int(os.environ.get("LMI_TILE_GROUP", 8)), 1), 8)
    out = _scan_device_plan(
        bucket_order,
        dev_cache["ptr"],
        dev_cache["chunk_of"],
        store.chunk_data,
        scales_flat,
        store.chunk_ids.reshape(-1),
        queries if isinstance(queries, jax.Array)
        else jnp.asarray(queries, jnp.float32),
        k_scan=k_scan,
        k=k,
        qtile=qtile,
        chunk=store.chunk,
        compute={"highest": "f32", "int8": "int8"}.get(precision, "bf16"),
        interpret=jax.default_backend() != "tpu",
        rerank=rerank,
        gate=os.environ.get("LMI_SCAN_GATE", "count"),
        G=G,
        QP_env=QP_env,
        W_env=W_env,
        gather_mode=os.environ.get("LMI_GATHER_MODE", "auto"),
    )
    flat = np.asarray(out)  # ONE readback: results + w_actual
    w_actual = int(flat[-1])
    if w_actual > W_env:
        # envelope overflow: results are truncated — grow the sticky
        # envelope (next call compiles once at the bigger size) and
        # tell the caller to rerun via the host plan
        hints["W_env"] = int(w_actual * 1.25)
        return None
    both = flat[:-1].reshape(2, Q, k)
    LAST_ENGINE = "pallas-fused-devplan"
    return both[0].view(np.float32), both[1].view(np.uint32)


@functools.partial(jax.jit, static_argnames=("k", "V", "use_kernel"))
def _merge_pairs_dense(
    cand_d: jnp.ndarray,  # (R, k) per-pair candidate distances
    cand_s: jnp.ndarray,  # (R, k) per-pair candidate slots, -1 invalid
    pair_rows: jnp.ndarray,  # (Q*V,) row of each (query, visit) pair
    pair_ok: jnp.ndarray,  # (Q*V,) bool: row exists AND was written
    *,
    k: int,
    V: int,
    use_kernel: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Phase 2 for the Pallas engine: each query has AT MOST ``V``
    candidate rows (one per visited bucket — the kernel already merged
    across chunks), so the global per-query top-k is a dense (Q, V·k)
    row-gather + k-pass — not a 3-key sort over every candidate.  The
    sort-based ``_merge_candidates`` (still used by the XLA engine,
    whose phase 1 emits per-chunk candidates of unbounded per-query
    count) measured ~0.06 s of the 0.17 s flagship dispatch; this is
    ~milliseconds."""
    Q = pair_rows.shape[0] // V
    # ONE interleaved row gather instead of two.  The interleave rides
    # in INT space: slot values viewed as f32 are denormal bit patterns
    # that TPU ops flush to zero (measured: recall 0.0002), while f32
    # distances viewed as int32 survive any data movement untouched.
    packed = jnp.concatenate(
        [jax.lax.bitcast_convert_type(cand_d, jnp.int32), cand_s],
        axis=1,
    )
    # (Q*V, 2k) row gather — on TPU, zero-pad the rows to one 128-lane
    # tile so the VMEM-resident Pallas gather applies (the zero columns
    # cost ~4× VMEM for the small candidate table, nothing at HBM)
    pad_cols = (-packed.shape[1]) % 128
    if use_kernel and pad_cols:
        packed = jnp.pad(packed, ((0, 0), (0, pad_cols)))
    g = _gather_rows_fast(packed, pair_rows, use_kernel=use_kernel)
    d = jax.lax.bitcast_convert_type(g[:, :k], jnp.float32)
    s = g[:, k : 2 * k]
    d = jnp.where(pair_ok[:, None], d, jnp.inf).reshape(Q, V * k)
    s = jnp.where(pair_ok[:, None], s, -1).reshape(Q, V * k)
    vals, pos = _item_topk(d, k, None)
    out_s = jnp.take_along_axis(s, pos, axis=1)
    out_s = jnp.where(jnp.isinf(vals), -1, out_s)
    return vals, out_s


@functools.partial(jax.jit, static_argnames=("k",))
def _rerank_exact_slots(
    cand_d: jnp.ndarray,  # (Q, kk) approximate candidate distances
    cand_s: jnp.ndarray,  # (Q, kk) packed-store slot indices, -1 invalid
    queries: jnp.ndarray,  # (Q, d)
    chunk_data: jnp.ndarray,  # (n_slots, d) packed store
    scales_flat: jnp.ndarray,  # (n_slots,) f32 (1.0 when unscaled)
    *,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slot-native stage 2 (Pallas engine): exact f32 distances for the
    shortlist, gathered straight from the packed slabs — no id→slot
    indirection."""
    rows = jnp.maximum(cand_s, 0)
    vecs = chunk_data[rows].astype(jnp.float32)  # (Q, kk, d)
    vecs = vecs * scales_flat[rows][:, :, None]
    sims = jnp.einsum(
        "qkd,qd->qk", vecs, queries,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    dists = jnp.where(cand_s >= 0, 1.0 - sims, jnp.inf)
    neg, pos = jax.lax.top_k(-dists, k)
    out_s = jnp.take_along_axis(cand_s, pos, axis=1)
    out_d = -neg
    out_s = jnp.where(jnp.isinf(out_d), -1, out_s)
    return out_d, out_s


@functools.partial(jax.jit, static_argnames=("k",))
def _rerank_exact(
    cand_d: jnp.ndarray,  # (Q, kk) candidate distances (approximate)
    cand_i: jnp.ndarray,  # (Q, kk) candidate ids, 1-based, 0 invalid
    queries: jnp.ndarray,  # (Q, d)
    source_data: jnp.ndarray,  # (n, d) corpus OR (n_chunks, chunk, d) packed
    source_scales,  # matching-shape scales or None
    row_slot,  # (n,) int32 or None (identity: id-1 is the row)
    *,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stage 2 of the fast path: exact full-precision distances for the
    shortlisted candidates only.  The bulk scan can then run at DEFAULT
    matmul precision (single bf16 pass, ~6× cheaper) without losing
    exactness of the final ranking."""
    rows = jnp.maximum(cand_i.astype(jnp.int32) - 1, 0)
    if row_slot is not None:
        rows = row_slot[rows]
    vecs = source_data[rows].astype(jnp.float32)  # (Q, kk, d)
    if source_scales is not None:
        vecs = vecs * source_scales[rows][:, :, None]
    sims = jnp.einsum(
        "qkd,qd->qk", vecs, queries,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    dists = jnp.where(cand_i > 0, 1.0 - sims, jnp.inf)
    neg, pos = jax.lax.top_k(-dists, k)
    out_i = jnp.take_along_axis(cand_i, pos, axis=1)
    out_d = -neg
    out_i = jnp.where(jnp.isinf(out_d), 0, out_i)
    return out_d, out_i


def _quantize(size: int, multiple: int) -> int:
    """Round up to a 1/8-octave boundary (≤12.5% padding) so the number
    of distinct compiled shapes stays logarithmic — the sort-based merge
    in particular compiles slowly per shape.  The step is itself rounded
    up to a multiple of ``multiple`` so the result always divides evenly
    (a bare power-of-2 step breaks non-power-of-2 ``items_per_step``,
    e.g. chunk=3000 → items_per_step=5: 130 items → 144, not ÷5)."""
    size = max(size, multiple)
    step = 1 << max(size.bit_length() - 4, 0)
    step = -(-step // multiple) * multiple
    return -(-size // step) * step


def _pallas_engine_usable(
    store: BucketStore, qtile: int, for_tpu: Optional[bool] = None
) -> bool:
    """The fused Pallas kernel covers packed stores with ids in int32
    range; Mosaic compilation additionally needs lane-aligned shapes
    (interpret mode off-TPU handles any shape)."""
    if store.chunk_data is None:
        return False
    n_rows = store.chunk_ids.size
    from learnedmetricindex_tpu.ops.scan_kernel import MAX_PALLAS_ID

    if n_rows >= MAX_PALLAS_ID:
        return False
    if for_tpu is None:
        for_tpu = jax.default_backend() == "tpu"
    if not for_tpu:
        return True
    d = store.chunk_data.shape[1]
    # chunk must divide the 1-D f32 HBM tile T(1024): the kernel's
    # (chunk,) scales BlockSpec fails Mosaic layout checks otherwise
    return d % 128 == 0 and store.chunk % 1024 == 0 and qtile % 8 == 0


def scan_buckets(
    store: BucketStore,
    queries: np.ndarray,
    bucket_order: np.ndarray,
    k: int = 10,
    qtile: int = 128,
    items_per_step: Optional[int] = None,
    precision: str = "highest",
    approx_recall=None,
    rerank: bool = False,
    rerank_margin: int = 6,
    engine: str = "auto",
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact kNN over each query's visit set.

    Returns ``(dists (Q, k) float32, ids (Q, k) uint32 1-based)``.
    Functional equivalent of the reference's phase B
    (``LearnedIndex.py:107-146``) in two jitted device passes.

    ``rerank=True`` runs the bulk scan at ``precision`` with a
    ``k + rerank_margin`` shortlist and recomputes exact
    HIGHEST-precision distances for the shortlist only.
    ``precision="int8"`` (Pallas engine, packed int8 stores only) goes
    further: queries are row-quantized on device and the bulk pass
    runs int8×int8→int32 on the MXU — 2× the bf16 throughput with
    comparable (~2e-3) similarity noise, which the exact rerank
    absorbs the same way.  With
    ``precision="default"`` (one bf16 MXU pass) this is the fast path:
    the final ranking is exact *over the shortlist*, but a true
    neighbor pushed past the shortlist by ~2e-3 bf16 noise in a dense
    near-tie region can be missed — pass ``precision="highest"`` for
    strict parity with the reference's all-f32 in-bucket scan
    (``LearnedIndex.py:360-368``).

    ``engine``: ``"auto"`` (default) picks the fused Pallas kernel on
    TPU when the store shape allows (``ops/scan_kernel.py`` — exact,
    VMEM-resident, cross-chunk accumulation; measured 0.16 s vs 0.23 s
    XLA phase 1 at 2M×768/visit-4 with a 40× smaller merge input), else
    the ``"xla"`` dynamic-slice + einsum + k-pass program; ``"pallas"``
    forces the kernel (interpret mode off-TPU).  The Pallas engine is
    always exact per visited bucket — ``approx_recall`` only affects
    the XLA engine.
    """
    import os
    import time as _time

    debug = bool(os.environ.get("LMI_SCAN_DEBUG"))

    def _dbg(tag, t0, block=None):
        if debug:
            if block is not None:
                jax.block_until_ready(block)
                float(jnp.sum(block[0]) if hasattr(block, "ndim") else 0)
            print(f"[scan] {tag}: {_time.perf_counter() - t0:.3f}s",
                  flush=True)
        return _time.perf_counter()

    t0 = _time.perf_counter()
    if items_per_step is None:
        # keep the per-step distance block (S, qtile, chunk) f32 within
        # ~8 MB so the k-pass top-k stays VMEM-resident (spilling makes
        # each of its ~3k passes stream from HBM)
        items_per_step = max(1, min(32, 2_097_152 // (qtile * store.chunk)))
    if not isinstance(queries, jax.Array):
        queries = np.asarray(queries, dtype=np.float32)
    k_scan = k + rerank_margin if rerank else k
    scan_precision = precision
    if scan_precision == "int8" and (
        store.chunk_data is None or store.chunk_data.dtype != jnp.int8
    ):
        raise ValueError(
            "precision='int8' runs the int8×int8 MXU bulk scan and "
            "needs a packed int8 store (build_packed_int8 / "
            "build_packed_device with row_scales); this store is "
            + ("virtual" if store.chunk_data is None
               else str(store.chunk_data.dtype))
        )
    plan = build_scan_plan(store, np.asarray(bucket_order), qtile=qtile)
    t0 = _dbg("plan", t0)

    # keyed by visit count too: n_visits is its own jit static, so
    # cross-V hint sharing could never save a compile — it would only
    # pad a small-V call up to a large-V work list
    hint_key = (id(store.chunk_ids), qtile, np.asarray(bucket_order).shape[1])

    W = len(plan.item_chunk)
    # sticky like the fused path's W: XLA padded items DO run (masked)
    # matmuls, but bounded growth beats re-jitting the sort-merge —
    # measured ~50 s per fresh serving batch at 200K×96 without this
    Wp = _sticky_quantize(hint_key, "Wp", max(W, 1), items_per_step)
    assert Wp % items_per_step == 0
    item_q_start = np.zeros(Wp, dtype=np.int32)
    item_chunk = np.zeros(Wp, dtype=np.int32)
    item_valid = np.zeros(Wp, dtype=bool)
    item_q_start[:W] = plan.item_q_start
    item_chunk[:W] = plan.item_chunk
    item_valid[:W] = True

    qidx = plan.qidx
    QP = _sticky_quantize(hint_key, "QP", max(len(qidx), 1), qtile)
    if QP != len(qidx):
        qidx = np.concatenate(
            [qidx, np.full(QP - len(qidx), -1, dtype=np.int32)]
        )

    common = dict(
        k=k_scan, qtile=qtile, items_per_step=items_per_step,
        precision=scan_precision, approx_recall=approx_recall,
    )
    q_dev_all = jnp.asarray(queries)

    global LAST_ENGINE
    use_pallas = engine == "pallas" or (
        engine == "auto" and jax.default_backend() == "tpu"
    )
    if engine == "pallas" and not _pallas_engine_usable(store, qtile):
        raise ValueError(
            "engine='pallas' forced but the store shape is outside the "
            "kernel's coverage (packed store with int32-range ids "
            "required; on TPU additionally d % 128 == 0, "
            "chunk % 1024 == 0, qtile % 8 == 0) — use engine='auto' "
            "for silent fallback to the XLA engine"
        )
    ran_pallas = False
    if use_pallas and _pallas_engine_usable(store, qtile):
        from learnedmetricindex_tpu.ops.scan_kernel import (
            pad_item_meta,
            pallas_host_args,
        )

        try:
            n_pairs = QP // qtile
            item_meta, item_chunk_p, w_real, scales_flat, pair_written = (
                pallas_host_args(store, plan, qtile, n_pairs)
            )
            # Sticky-pad the item axis like QP above: the raw W is
            # data-dependent (navigation outcome), so without padding
            # EVERY new query batch recompiles the fused program.
            # Padding items carry the dummy-pair metadata word and are
            # skipped by the kernel's ``i < w_real`` gate.
            Wq = _sticky_quantize(hint_key, "W", len(item_meta), 8)
            if Wq != len(item_meta):
                pad = Wq - len(item_meta)
                item_meta = np.concatenate(
                    [item_meta, np.full(pad, pad_item_meta(n_pairs), np.int32)]
                )
                item_chunk_p = np.concatenate(
                    [item_chunk_p, np.zeros(pad, np.int32)]
                )
            # dense-merge map: (query, visit) → candidate row; invalid
            # visits point at the never-written overflow tile
            ok = plan.pair_slot >= 0
            pair_rows = np.where(ok, plan.pair_slot, n_pairs * qtile)
            pair_ok = ok & pair_written[
                np.minimum(pair_rows // qtile, n_pairs)
            ]
            # kernel + merge + rerank + id resolve in ONE dispatch over
            # ONE uploaded plan blob (six small uploads → one)
            blob = _pack_plan_blob(
                qidx, item_meta, item_chunk_p, w_real, pair_rows, pair_ok
            )
            packed_di = _scan_fused_pallas(
                jnp.asarray(blob),
                store.chunk_data,
                scales_flat,
                store.chunk_ids.reshape(-1),
                q_dev_all,
                W=len(item_meta),
                k_scan=k_scan,
                k=k,
                qtile=qtile,
                chunk=store.chunk,
                n_pairs=n_pairs,
                compute={"highest": "f32", "int8": "int8"}.get(
                    scan_precision, "bf16"
                ),
                interpret=jax.default_backend() != "tpu",
                rerank=rerank,
                n_visits=int(np.asarray(bucket_order).shape[1]),
                # selection-loop gating: "count" (default) bounds the
                # per-chunk extraction sweeps by a counting pass;
                # "fixed" is the legacy k-trip loop (A/B knob)
                gate=os.environ.get("LMI_SCAN_GATE", "count"),
                # "auto" = Pallas VMEM gather for the query-tile and
                # merge row gathers on TPU; "xla" forces the XLA
                # gathers (A/B knob — see _gather_rows_fast)
                gather_mode=os.environ.get("LMI_GATHER_MODE", "auto"),
            )
            ran_pallas = True
            t0 = _dbg("scan-fused-pallas", t0, packed_di)
        except Exception as e:
            if engine == "pallas":
                raise  # explicit request: surface the error
            # auto mode: fall back to the XLA engine (e.g. a compiler
            # failure at an extreme work-list size) — loudly, or a
            # silent perf regression would be invisible in production
            import logging

            logging.getLogger(__name__).warning(
                "Pallas scan engine failed (%s: %s); falling back to "
                "the XLA engine for this call",
                type(e).__name__,
                e,
            )
            ran_pallas = False
    if not ran_pallas and scan_precision == "int8":
        # the int8×int8 MXU bulk pass exists only in the Pallas kernel;
        # running the XLA engine silently at bf16 would misreport the
        # mode (bench labels, parity claims) — refuse or downgrade loudly
        if engine != "auto":
            raise ValueError(
                "precision='int8' requires the Pallas engine "
                "(engine='auto' on TPU, or engine='pallas'); the XLA "
                "engine has no int8 MXU path"
            )
        import logging

        logging.getLogger(__name__).warning(
            "precision='int8' requested but the Pallas engine did not "
            "run; scanning at DEFAULT (bf16) precision instead"
        )
        common["precision"] = "default"
    if ran_pallas:
        LAST_ENGINE = "pallas-fused"
        # ONE flat host transfer for both result arrays (each
        # np.asarray is a ~33 ms relay round-trip, and 2-D (Q, k)
        # layouts pad k to 128 lanes on the wire — probe_rtt/read)
        both = np.asarray(packed_di).reshape(2, -1, k)
        return both[0].view(np.float32), both[1].view(np.uint32)
    qidx_dev = jnp.asarray(qidx)
    work_queries = _gather_work_queries(q_dev_all, qidx_dev)
    if store.chunk_data is not None:
        LAST_ENGINE = "xla"
        cand_d, cand_i, cand_q = _scan_items(
            work_queries,
            qidx_dev,
            jnp.asarray(item_q_start),
            jnp.asarray(item_chunk),
            jnp.asarray(item_valid),
            store.chunk_data,
            store.chunk_ids,
            store.chunk_scales,
            **common,
        )
    else:
        LAST_ENGINE = "xla-virtual"
        cand_d, cand_i, cand_q = _scan_items_virtual(
            work_queries,
            qidx_dev,
            jnp.asarray(item_q_start),
            jnp.asarray(item_chunk),
            jnp.asarray(item_valid),
            store.data_ref,
            store.chunk_ids,
            store.row_scales,
            **common,
        )
    t0 = _dbg("phase1", t0, cand_d)
    dists, ids = _merge_candidates(
        cand_d, cand_i, cand_q, k=k_scan, n_queries=plan.n_queries
    )
    t0 = _dbg("merge", t0, dists)
    if rerank:
        if store.chunk_data is not None:
            dists, ids = _rerank_exact(
                dists, ids, q_dev_all, store.chunk_data, store.chunk_scales,
                store.row_slot, k=k,
            )
        else:
            dists, ids = _rerank_exact(
                dists, ids, q_dev_all, store.data_ref, store.row_scales,
                None, k=k,
            )
        t0 = _dbg("rerank", t0, dists)
    return np.asarray(dists), np.asarray(ids).astype(np.uint32)
