"""Dynamic index mutation: insert / delete without a rebuild.

The reference index is build-once (``search/li/LearnedIndexBuilder.py``
has no insert or delete path; updating means re-running the 5.8 h
build).  A serving deployment (``serve.py``) needs the corpus to move
while the index stays online, so this module adds TPU-native store
mutation on top of the unchanged learned routers:

* **Insert** = classify the new rows through the existing per-level
  MLPs (the same "partition by the model's own predictions" semantics
  the builder uses, ``LearnedIndexBuilder.py:76,270-274``) and append
  them to their predicted buckets' chunks.  The packed layout keeps a
  per-bucket *chunk list* (``BucketStore.bucket_chunk_list``): a full
  bucket grows by taking a spare chunk from a free pool instead of
  repacking — the scan kernel only requires a pair's work items to be
  consecutive in the WORK LIST, never that a bucket's chunks be
  contiguous in HBM.  When the pool runs dry the device arrays grow
  geometrically (amortized O(1) copies; each growth recompiles the
  scan once — bounded, like the sticky-shape serving ladder).
* **Delete** = zero the row's slot (id 0 + scale 0.0): both scan
  engines already treat that as padding (XLA masks ``ids == 0``,
  Pallas masks ``scales == 0.0``), so deletion is two O(1) scatter
  updates and needs no compaction.  Holes are reclaimed lazily — a
  ``compact()`` rebuild repacks when the waste matters.

Mutated stores answer searches through the ordinary engines
(``scan_buckets`` — fused Pallas kernel on TPU) with zero overhead on
the hot path: the only change is the host-side plan builder reading
chunk indices through the per-bucket list.

``DynamicIndex`` is the serving-facing wrapper: a built
:class:`~learnedmetricindex_tpu.index.index.LearnedIndex` + a packed
store + id allocation, with ``insert`` / ``delete`` / ``search``.
Single-controller stores only (a sharded store re-shards on rebuild).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from learnedmetricindex_tpu.index.bucket_store import BucketStore
from learnedmetricindex_tpu.utils.logging import Logger

_INT32_MAX = 2**31 - 1


# ----------------------------------------------------------------------
# classification (per-row tree path through the trained routers)
# ----------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("cats",))
def _classify_device(queries, level_params, level_masks, *, cats):
    """(Q, n_levels) int32 — each row's per-level argmax class, each
    level conditioned on the parent node the previous levels chose
    (model index = raveled path prefix, exactly the builder's
    ``ravel_multi_index`` convention)."""
    from learnedmetricindex_tpu.index.index import _masked_level_probs

    Q = queries.shape[0]
    model_idx = jnp.zeros(Q, jnp.int32)
    preds = []
    for lvl in range(len(cats)):
        probs = _masked_level_probs(
            level_params[lvl], level_masks[lvl], queries
        )  # (Q, M, C)
        own = jnp.take_along_axis(
            probs, model_idx[:, None, None], axis=1
        )[:, 0, :]  # (Q, C)
        c = jnp.argmax(own, axis=-1).astype(jnp.int32)
        preds.append(c)
        model_idx = model_idx * jnp.int32(cats[lvl]) + c
    return jnp.stack(preds, axis=1)


def classify(index, vectors) -> np.ndarray:
    """Predict each row's full tree path — the rows' ``data_prediction``
    entries had they been present at build time (the multi-level analog
    of the reference's per-node ``model.predict``,
    ``search/li/model.py:213-224``)."""
    if isinstance(vectors, jax.Array):
        q = vectors  # device callers manage their own shapes
        m = q.shape[0]
    else:
        q = np.asarray(vectors, np.float32)
        m = len(q)
        if m == 0:
            return np.zeros((0, len(index.levels)), np.int64)
        # serving inserts arrive at arbitrary batch sizes; the batch
        # size is a traced shape, so pad to an ⅛-octave boundary
        # (repeat row 0) to bound the number of compiled programs —
        # the search path's same trick (index.py sticky Q-padding)
        from learnedmetricindex_tpu.index.bucket_store import _quantize

        mp = _quantize(m, 8)
        if mp != m:
            q = np.concatenate(
                [q, np.broadcast_to(q[:1], (mp - m, q.shape[1]))]
            )
    out = _classify_device(
        jnp.asarray(q),
        tuple(level.params for level in index.levels),
        tuple(jnp.asarray(level.class_mask) for level in index.levels),
        cats=tuple(index.config.n_categories),
    )
    return np.asarray(out)[:m].astype(np.int64)


# ----------------------------------------------------------------------
# store mutation primitives
# ----------------------------------------------------------------------
def _require_packed(store: BucketStore, op: str) -> None:
    if store.chunk_data is None:
        raise ValueError(
            f"{op} needs a *packed* store (chunk_data present); this "
            "store is virtual — rebuild with BucketStore.build / "
            "prepare_packed_store, or rebuild the virtual store from "
            "the updated corpus (it holds no copies to mutate)"
        )
    if getattr(store, "mesh", None) is not None:
        raise ValueError(
            f"{op} mutates a single-controller store; sharded stores "
            "rebalance on rebuild (get_sharded_store)"
        )


def ensure_mutable(store: BucketStore) -> BucketStore:
    """Attach mutation bookkeeping to a freshly built packed store:
    the per-bucket chunk list (identity over the contiguous CSR), the
    high-water fill (== bucket_sizes on a fresh store), and the
    id→slot map if the builder didn't produce one."""
    _require_packed(store, "ensure_mutable")
    if store.bucket_chunk_list is not None:
        return store
    starts = store.bucket_chunk_start.astype(np.int64)
    n_chunks = int(starts[-1])
    out = store._replace(
        bucket_chunk_ptr=starts.copy(),
        bucket_chunk_list=np.arange(n_chunks, dtype=np.int32),
        bucket_fill=store.bucket_sizes.astype(np.int32).copy(),
    )
    if out.row_slot is None:
        flat_ids = out.chunk_ids.reshape(-1)
        max_id = int(jnp.max(flat_ids))
        n_slots = max(max_id, 1)
        # padding slots (id 0) route to index n_slots and are dropped
        idx = jnp.where(flat_ids > 0, flat_ids - 1, n_slots)
        row_slot = jnp.zeros(n_slots, jnp.int32).at[idx].set(
            jnp.arange(flat_ids.shape[0], dtype=jnp.int32), mode="drop"
        )
        out = out._replace(row_slot=row_slot)
    return out


def _grow_device(store: BucketStore, extra_chunks: int) -> BucketStore:
    """Append ``extra_chunks`` zeroed chunks to the device arrays (one
    O(n) copy; callers grow geometrically so copies amortize).

    HBM peak during the copy is old + new store bytes.  Near the
    single-chip ceiling (e.g. the 10M×768 int8 flagship at ~7.9 GB)
    budget for that spike: fresh builds carry ≤ n_buckets·chunk slots
    of tail padding to absorb inserts copy-free, and ``compact()``
    restores that headroom after heavy churn."""
    chunk, d = store.chunk, store.chunk_data.shape[1]
    pad_rows = extra_chunks * chunk
    chunk_data = jnp.concatenate(
        [
            store.chunk_data,
            jnp.zeros((pad_rows, d), store.chunk_data.dtype),
        ]
    )
    chunk_ids = jnp.concatenate(
        [
            store.chunk_ids,
            jnp.zeros((extra_chunks, chunk), store.chunk_ids.dtype),
        ]
    )
    chunk_scales = store.chunk_scales
    if chunk_scales is not None:
        chunk_scales = jnp.concatenate(
            [chunk_scales, jnp.zeros(pad_rows, chunk_scales.dtype)]
        )
    return store._replace(
        chunk_data=chunk_data, chunk_ids=chunk_ids, chunk_scales=chunk_scales
    )


def insert_rows(
    store: BucketStore,
    vectors: np.ndarray,
    bucket_ids: np.ndarray,
    object_ids: np.ndarray,
) -> BucketStore:
    """Append rows to their buckets' chunks; returns the updated store
    (functional — the input store is unchanged and stays searchable).

    ``bucket_ids``: dense global bucket index per row (see
    ``LearnedIndex.bucket_ids_from_prediction``).  ``object_ids``:
    1-based, caller-allocated (``DynamicIndex`` auto-allocates).
    """
    store = ensure_mutable(store)
    orig_hint_id = id(store.chunk_ids)  # _grow_device may swap it
    vectors = np.asarray(vectors, np.float32)
    bucket_ids = np.asarray(bucket_ids, np.int64)
    object_ids = np.asarray(object_ids, np.int64)
    m = len(vectors)
    if m == 0:
        return store
    if not (len(bucket_ids) == len(object_ids) == m):
        raise ValueError("vectors / bucket_ids / object_ids length mismatch")
    if object_ids.min() < 1:
        raise ValueError("object ids are 1-based (reference convention)")
    max_id = int(object_ids.max())
    # ids live in int32 device arrays (chunk_ids); anything larger
    # would silently wrap negative and become an invisible ghost row.
    # row_slot is dense over the id space (4 bytes per allocated id),
    # so a huge sparse id is also an allocation hazard — serving
    # deployments reach this path straight from HTTP.  Both bounds are
    # therefore hard errors, the second one configurable.
    if max_id > _INT32_MAX:
        raise ValueError(
            f"object id {max_id} exceeds int32 range ({_INT32_MAX}); "
            "ids are stored as int32 on device"
        )
    id_cap = int(os.environ.get("LMI_MAX_OBJECT_ID", 1 << 28))
    if max_id > id_cap:
        raise ValueError(
            f"object id {max_id} exceeds the configured id-space cap "
            f"({id_cap}); the id→slot map is dense (4 B per id up to "
            "the max id), so sparse giant ids waste HBM — renumber, "
            "or raise LMI_MAX_OBJECT_ID if the allocation is intended"
        )
    if bucket_ids.min() < 0 or bucket_ids.max() >= store.n_buckets:
        raise ValueError("bucket id out of range")
    # id-collision guard: a duplicate live id would create a second row
    # whose twin becomes an undeletable ghost (row_slot can only point
    # at one of them) — reject both intra-batch dupes and live ids
    if len(np.unique(object_ids)) != m:
        raise ValueError("duplicate object ids within the insert batch")
    maybe = object_ids[object_ids <= store.row_slot.shape[0]]
    if len(maybe):
        ids_dev = jnp.asarray(maybe, jnp.int32)
        slots_of = store.row_slot[ids_dev - 1]
        live = np.asarray(
            store.chunk_ids.reshape(-1)[slots_of] == ids_dev
        )
        if live.any():
            raise ValueError(
                f"{int(live.sum())} object id(s) already live (e.g. "
                f"{int(maybe[np.argmax(live)])}) — delete first or "
                "use fresh ids"
            )

    chunk = store.chunk
    ptr = store.bucket_chunk_ptr.astype(np.int64)
    clist = store.bucket_chunk_list
    fill = store.bucket_fill.astype(np.int64).copy()
    sizes = store.bucket_sizes.astype(np.int64).copy()

    # --- per-bucket chunk demand --------------------------------------
    counts_new = np.bincount(bucket_ids, minlength=store.n_buckets)
    affected = np.nonzero(counts_new)[0]
    have = ptr[1:] - ptr[:-1]
    need = -(-(fill + counts_new) // chunk)
    extra_per_bucket = np.maximum(need - have, 0)
    n_extra = int(extra_per_bucket.sum())

    if n_extra:
        # free pool = allocated-but-unassigned chunks, then grow
        total = store.n_chunks
        assigned = np.zeros(total, bool)
        assigned[clist] = True
        free = np.nonzero(~assigned)[0]
        if len(free) < n_extra:
            shortfall = n_extra - len(free)
            grow = max(shortfall, total // 8, 1)
            store = _grow_device(store, grow)
            free = np.concatenate(
                [free, np.arange(total, total + grow, dtype=np.int64)]
            )
        # splice the new chunks into each bucket's run (rebuild the
        # CSR once — host O(n_chunks), trivial next to the device work)
        new_ptr = np.concatenate(
            [[0], np.cumsum(have + extra_per_bucket)]
        ).astype(np.int64)
        new_list = np.zeros(int(new_ptr[-1]), dtype=np.int32)
        src = np.arange(len(clist), dtype=np.int64)
        # old entries keep their within-bucket position
        old_bucket = np.repeat(
            np.arange(store.n_buckets, dtype=np.int64), have
        )
        new_list[new_ptr[old_bucket] + (src - ptr[old_bucket])] = clist
        take = 0
        for b in np.nonzero(extra_per_bucket)[0]:
            g = int(extra_per_bucket[b])
            new_list[
                new_ptr[b] + have[b] : new_ptr[b] + have[b] + g
            ] = free[take : take + g]
            take += g
        ptr, clist = new_ptr, new_list

    # --- slot assignment (within-bucket append at the high-water) ----
    order = np.argsort(bucket_ids, kind="stable")
    rank = np.empty(m, np.int64)
    starts_in_sorted = np.concatenate(
        [[0], np.cumsum(counts_new)[:-1]]
    )
    rank[order] = np.arange(m) - starts_in_sorted[bucket_ids[order]]
    pos = fill[bucket_ids] + rank  # within-bucket row position
    slots = (
        clist[ptr[bucket_ids] + pos // chunk].astype(np.int64) * chunk
        + pos % chunk
    )

    # --- device scatter updates ---------------------------------------
    slots_dev = jnp.asarray(slots, jnp.int32)
    if store.chunk_data.dtype == jnp.int8:
        from learnedmetricindex_tpu.ops.quantize import quantize_rows_np

        q, scales = quantize_rows_np(vectors)
        rows_dev = jnp.asarray(q)
        scales_dev = jnp.asarray(scales, jnp.float32)
    else:
        rows_dev = jnp.asarray(vectors, store.chunk_data.dtype)
        scales_dev = None
    chunk_data = store.chunk_data.at[slots_dev].set(rows_dev)
    n_chunks = store.n_chunks
    chunk_ids = (
        store.chunk_ids.reshape(-1)
        .at[slots_dev]
        .set(jnp.asarray(object_ids, jnp.int32))
        .reshape(n_chunks, chunk)
    )
    chunk_scales = store.chunk_scales
    if chunk_scales is not None:
        chunk_scales = chunk_scales.at[slots_dev].set(
            scales_dev
            if scales_dev is not None
            else jnp.ones(m, chunk_scales.dtype)
        )
    row_slot = store.row_slot
    max_id = int(object_ids.max())
    if max_id > row_slot.shape[0]:
        row_slot = jnp.concatenate(
            [
                row_slot,
                jnp.zeros(
                    max(max_id - row_slot.shape[0], row_slot.shape[0] // 4),
                    jnp.int32,
                ),
            ]
        )
    row_slot = row_slot.at[jnp.asarray(object_ids - 1)].set(slots_dev)

    fill[affected] += counts_new[affected]
    sizes[affected] += counts_new[affected]
    out = store._replace(
        chunk_data=chunk_data,
        chunk_ids=chunk_ids,
        chunk_scales=chunk_scales,
        row_slot=row_slot,
        bucket_chunk_ptr=ptr,
        bucket_chunk_list=clist,
        bucket_fill=fill.astype(np.int32),
        bucket_sizes=sizes.astype(np.int32),
    )
    # carry compiled-shape hints across the array swap (serving
    # stability: without this every mutation strands a hint entry)
    from learnedmetricindex_tpu.index.bucket_store import (
        migrate_shape_hints,
    )

    migrate_shape_hints(orig_hint_id, id(out.chunk_ids))
    return out


def _compact_gather_impl(chunk_data, ids_flat, chunk_scales, gather, valid):
    """Fused gather + padding-select for all three store arrays in ONE
    jitted program: XLA fuses the gather into the select, so the
    gathered temporary is never materialized and peak HBM during
    compaction stays at old + new store bytes (the ``_grow_device``
    budget) instead of old + temp + new."""
    zero_row = jnp.zeros((), chunk_data.dtype)
    data = jnp.where(valid[:, None], chunk_data[gather], zero_row)
    ids = jnp.where(valid, ids_flat[gather], 0).astype(jnp.int32)
    scales = (
        None
        if chunk_scales is None
        else jnp.where(valid, chunk_scales[gather], 0.0)
    )
    return data, ids, scales


_compact_gather = jax.jit(_compact_gather_impl)
# donating the old arrays lets XLA release them as soon as the gather
# reads them — for callers that drop the input store (DynamicIndex owns
# its store and replaces it), not for the functional default
_compact_gather_donated = jax.jit(
    _compact_gather_impl, donate_argnums=(0, 1, 2)
)


def compact_store(store: BucketStore, *, donate: bool = False) -> BucketStore:
    """Repack a mutated store on device: drop delete holes and
    overflow-chunk fragmentation without moving the corpus through the
    host.

    The host reads ONLY the id grid (4 B per slot — ~40 MB at 10M
    slots) and computes the live-slot permutation; the vectors
    themselves move in one on-device row gather.  The previous
    implementation pulled every live row to the host and rebuilt
    (``np.asarray(chunk_data[live])`` + re-upload) — at the 10M×768
    flagship that is ~15 GB through a 20–50 MB/s host link (hours);
    this path is seconds.  Rows KEEP their buckets (compaction is a
    layout operation, not a re-route) and their relative within-bucket
    scan order, so tie-breaking — and therefore search output — is
    bit-identical before/after; int8 stores keep their exact quantized
    values and scales (no dequantize/requantize drift).

    ``donate=True`` additionally donates the old device arrays to the
    gather, letting XLA alias them into the outputs when shapes match
    (peak ~max(old, new)); when compaction shrinks the store the
    donation is unusable and XLA falls back to old + new — the same
    budget as the default.  A donated-and-aliased input store becomes
    unusable, so only pass it when you own the store exclusively
    (``DynamicIndex.compact`` offline; never while searches can run
    concurrently)."""
    store = ensure_mutable(store)
    chunk = store.chunk
    flat_ids = np.asarray(store.chunk_ids.reshape(-1))
    n_slots = flat_ids.shape[0]

    # slot → (bucket, within-bucket scan position) via the chunk list
    ptr = store.bucket_chunk_ptr.astype(np.int64)
    clist = store.bucket_chunk_list.astype(np.int64)
    per_bucket = ptr[1:] - ptr[:-1]
    entry_bucket = np.repeat(
        np.arange(store.n_buckets, dtype=np.int64), per_bucket
    )
    chunk_bucket = np.full(store.n_chunks, -1, np.int64)
    chunk_bucket[clist] = entry_bucket
    chunk_pos = np.zeros(store.n_chunks, np.int64)
    chunk_pos[clist] = (
        np.arange(len(clist), dtype=np.int64) - ptr[entry_bucket]
    )
    slot_chunk = np.arange(n_slots, dtype=np.int64) // chunk
    b_of_slot = chunk_bucket[slot_chunk]
    # free-pool chunks are unassigned (bucket -1) and hold only id-0
    # padding, but guard anyway
    live_idx = np.nonzero((flat_ids > 0) & (b_of_slot >= 0))[0]
    scan_pos = chunk_pos[slot_chunk] * chunk + np.arange(n_slots) % chunk
    order = np.lexsort((scan_pos[live_idx], b_of_slot[live_idx]))
    src = live_idx[order]  # old slots, new scan order
    bs = b_of_slot[src]

    new_sizes = np.bincount(bs, minlength=store.n_buckets)
    nchunks = -(-new_sizes // chunk)
    starts = np.concatenate([[0], np.cumsum(nchunks)]).astype(np.int64)
    # engines need ≥ 1 chunk, but a forced padding chunk must stay
    # UNASSIGNED (free pool): starts[-1] stays 0, so the chunk list is
    # empty and the next insert draws the chunk from the pool.  Giving
    # it to the list would desync list length from ptr[-1] and crash
    # the next compact.
    n_chunks_new = max(int(starts[-1]), 1)
    cum = np.concatenate([[0], np.cumsum(new_sizes)]).astype(np.int64)
    within = np.arange(len(src), dtype=np.int64) - cum[bs]
    dst = starts[bs] * chunk + within
    src_for_dst = np.full(n_chunks_new * chunk, -1, np.int64)
    src_for_dst[dst] = src

    # one fused device gather for all arrays; padding slots zero out so
    # the engines' markers (id 0 / scale 0.0) hold and no stale row
    # leaks.  id() of the old ids array is read BEFORE a donating call
    # deletes the buffers (the python objects survive, but take the id
    # up front to keep the hint migration obviously ordered).
    orig_hint_id = id(store.chunk_ids)
    gather = jnp.asarray(np.maximum(src_for_dst, 0), jnp.int32)
    valid = jnp.asarray(src_for_dst >= 0)
    fn = _compact_gather_donated if donate else _compact_gather
    chunk_data, ids_new, chunk_scales = fn(
        store.chunk_data,
        store.chunk_ids.reshape(-1),
        store.chunk_scales,
        gather,
        valid,
    )
    n_ids = store.row_slot.shape[0]
    row_slot = (
        jnp.zeros(n_ids, jnp.int32)
        .at[jnp.where(ids_new > 0, ids_new - 1, n_ids)]
        .set(
            jnp.arange(ids_new.shape[0], dtype=jnp.int32), mode="drop"
        )
    )

    out = store._replace(
        chunk_data=chunk_data,
        chunk_ids=ids_new.reshape(n_chunks_new, chunk),
        chunk_scales=chunk_scales,
        row_slot=row_slot,
        bucket_chunk_start=starts.astype(np.int32),
        bucket_sizes=new_sizes.astype(np.int32),
        bucket_chunk_ptr=starts.copy(),
        bucket_chunk_list=np.arange(int(starts[-1]), dtype=np.int32),
        bucket_fill=new_sizes.astype(np.int32),
    )
    from learnedmetricindex_tpu.index.bucket_store import (
        migrate_shape_hints,
    )

    migrate_shape_hints(orig_hint_id, id(out.chunk_ids))
    return out


def delete_ids(
    store: BucketStore, object_ids: np.ndarray
) -> Tuple[BucketStore, int]:
    """Remove rows by 1-based object id; returns ``(store, n_deleted)``.
    Absent ids are skipped (idempotent).  Slots become padding in place
    (id 0, scale 0.0) — both scan engines already ignore them."""
    store = ensure_mutable(store)
    # dedup: duplicate ids in one call must count (and decrement the
    # bucket-size accounting) once, not once per occurrence
    object_ids = np.unique(np.asarray(object_ids, np.int64))
    if len(object_ids) == 0:
        return store, 0
    in_range = (object_ids >= 1) & (object_ids <= store.row_slot.shape[0])
    ids = object_ids[in_range]
    if len(ids) == 0:
        return store, 0
    ids_dev = jnp.asarray(ids, jnp.int32)
    slots = store.row_slot[ids_dev - 1]
    present = store.chunk_ids.reshape(-1)[slots] == ids_dev
    slots_np = np.asarray(slots)[np.asarray(present)]
    n_del = int(len(slots_np))
    if n_del == 0:
        return store, 0
    slots_dev = jnp.asarray(slots_np, jnp.int32)
    orig_hint_id = id(store.chunk_ids)
    chunk_ids = (
        store.chunk_ids.reshape(-1)
        .at[slots_dev]
        .set(0)
        .reshape(store.n_chunks, store.chunk)
    )
    chunk_scales = store.chunk_scales
    if chunk_scales is not None:
        chunk_scales = chunk_scales.at[slots_dev].set(0.0)
    # live-count bookkeeping (navigation cost model / introspection)
    chunk_of = slots_np // store.chunk
    nchunks = store.bucket_chunk_ptr[1:] - store.bucket_chunk_ptr[:-1]
    chunk_bucket = np.full(store.n_chunks, -1, np.int64)
    chunk_bucket[store.bucket_chunk_list] = np.repeat(
        np.arange(store.n_buckets, dtype=np.int64), nchunks
    )
    sizes = store.bucket_sizes.astype(np.int64).copy()
    np.subtract.at(sizes, chunk_bucket[chunk_of], 1)
    out = store._replace(
        chunk_ids=chunk_ids,
        chunk_scales=chunk_scales,
        bucket_sizes=sizes.astype(np.int32),
    )
    from learnedmetricindex_tpu.index.bucket_store import (
        migrate_shape_hints,
    )

    migrate_shape_hints(orig_hint_id, id(out.chunk_ids))
    return out, n_del


# ----------------------------------------------------------------------
# serving-facing wrapper
# ----------------------------------------------------------------------
class DynamicIndex(Logger):
    """A built index that accepts inserts and deletes while serving.

    Wraps a :class:`LearnedIndex` (the routers stay fixed — like the
    reference, the partition is whatever the models predict) and a
    packed :class:`BucketStore` that this class owns and replaces on
    every mutation.  Single-embedding corpora (navigation and scan on
    the same vectors); for the dual-embedding experiment layout use the
    immutable build path.

    >>> dyn = DynamicIndex.from_built(index, data, data_prediction)
    >>> ids = dyn.insert(new_vectors)
    >>> dyn.delete(ids[:5])
    >>> dists, nns, t = dyn.search(queries, n_buckets=4, k=10)
    """

    def __init__(self, index, store: BucketStore, next_id: Optional[int] = None):
        _require_packed(store, "DynamicIndex")
        self.index = index
        self.store = ensure_mutable(store)
        if next_id is None:
            mx = int(jnp.max(self.store.chunk_ids))
            next_id = mx + 1
        self.next_id = int(next_id)

    @classmethod
    def from_built(
        cls,
        index,
        data_search,
        data_prediction: np.ndarray,
        chunk: Optional[int] = None,
        dtype=None,
    ) -> "DynamicIndex":
        """Stand up a mutable store from a fresh build's outputs (host
        corpus + the builder's ``data_prediction``).  ``dtype=jnp.int8``
        builds the row-scaled quantized store (``build_packed_int8``
        semantics — a bare cast would truncate unit-norm components to
        all zeros)."""
        bucket_ids = index.bucket_ids_from_prediction(data_prediction)
        n_total = int(
            np.prod(index.config.n_categories, dtype=np.int64)
        )
        chunk = chunk or index.config.chunk_size
        dtype = jnp.dtype(dtype or index.config.dtype)
        if dtype == jnp.int8:
            store = BucketStore.build_packed_int8(
                np.asarray(data_search, np.float32),
                bucket_ids,
                n_buckets=n_total,
                chunk=chunk,
            )
        else:
            store = BucketStore.build(
                np.asarray(data_search, np.float32),
                bucket_ids,
                n_buckets=n_total,
                chunk=chunk,
                dtype=dtype,
            )
        return cls(index, store)

    @property
    def n_rows(self) -> int:
        """Live (non-deleted) rows."""
        return int(self.store.bucket_sizes.sum())

    # ---- persistence (the corpus lives in the store: serve-time
    # inserts exist nowhere else, so checkpoints save the packed
    # arrays, unlike the plain index's models-only npz) ----

    def save(self, path: str) -> None:
        from learnedmetricindex_tpu.index.serialization import (
            save_dynamic_index,
        )

        save_dynamic_index(self, path)

    @classmethod
    def load(cls, path: str) -> "DynamicIndex":
        from learnedmetricindex_tpu.index.serialization import (
            load_dynamic_index,
        )

        return load_dynamic_index(path)

    def insert(self, vectors, object_ids=None) -> np.ndarray:
        """Classify + append; returns the rows' 1-based object ids."""
        vectors = np.asarray(vectors, np.float32)
        m = len(vectors)
        if object_ids is None:
            object_ids = np.arange(
                self.next_id, self.next_id + m, dtype=np.int64
            )
        else:
            object_ids = np.asarray(object_ids, np.int64)
        if m == 0:
            return object_ids[:0]
        pred = classify(self.index, vectors)
        bucket_ids = self.index.bucket_ids_from_prediction(pred)
        self.store = insert_rows(self.store, vectors, bucket_ids, object_ids)
        self.next_id = max(self.next_id, int(object_ids.max()) + 1)
        return object_ids

    def delete(self, object_ids) -> int:
        self.store, n = delete_ids(self.store, object_ids)
        return n

    def search(
        self,
        queries,
        n_buckets: int = 1,
        k: int = 10,
        **knobs,
    ):
        """Search the live store (same knobs as ``LearnedIndex.search``:
        ``policy`` / ``precision`` / ``rerank`` / ``rerank_margin``)."""
        q = np.asarray(queries, np.float32)
        return self.index.search(
            None,
            q,
            None,
            q,
            None,
            n_buckets=n_buckets,
            k=k,
            store=self.store,
            **knobs,
        )

    def compact(self, donate: bool = False) -> None:
        """Repack the store on device: drop delete holes and overflow
        fragmentation (see :func:`compact_store` — the host touches
        only the id grid, rows keep their buckets and scan order, and
        search output is bit-identical before/after).

        ``donate=True`` lets XLA alias the old arrays into the new
        ones when shapes match (peak ~max(old,new) instead of old+new)
        — only safe when no search can run concurrently (offline
        maintenance; a serving deployment's searches don't hold the
        mutate lock)."""
        self.store = compact_store(self.store, donate=donate)
