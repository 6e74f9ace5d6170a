"""Dynamic mutation over a mesh-sharded bucket store.

``index/mutation.py`` mutates single-controller packed stores; above
the measured single-chip ceiling (17.5M×768 int8 on one v5e chip,
``PERFORMANCE.md``) the corpus must shard — and without this module it
would freeze there.  ``ShardedDynamicIndex`` gives the sharded store
the same insert / delete / compact surface:

* **Insert** routes rows through the unchanged learned routers
  (``mutation.classify`` — the builder's own "partition by the model's
  predictions" semantics, reference
  ``search/li/LearnedIndexBuilder.py:76,270-274``), maps each bucket to
  its owning device, plans slots against that device's host-side CSR
  metadata (chunk list + free pool, mirroring the packed design), and
  applies ONE ``shard_map`` scatter where every device writes only its
  local rows.  When any device runs out of chunks the stacked arrays
  grow geometrically on their common chunk axis.
* **Delete** resolves ids through a host-side id → (device, slot) map
  (the single-controller owns every mutation, so the host map is
  authoritative — no device round-trip) and zeroes the slots in place
  (id 0 + scale 0.0 — both scan engines already treat that as padding).
* **Compact** repacks every device in one ``shard_map`` gather: each
  device's live rows re-pack into its own slabs (rows never change
  owners — compaction is a layout operation, not a re-route), so
  search results are bit-identical before/after, exactly like the
  single-chip ``compact_store``.

The reference has no counterpart (its index is build-once:
``LearnedIndexBuilder.py`` has no update path) — this is serving
infrastructure the TPU framework adds, scaled past one chip.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from learnedmetricindex_tpu.index.bucket_store import (
    BucketStore,
    migrate_shape_hints,
)
from learnedmetricindex_tpu.index.mutation import _INT32_MAX, classify
from learnedmetricindex_tpu.parallel.mesh import shard_map_nocheck
from learnedmetricindex_tpu.parallel.sharded_index import (
    ShardedStore,
    sharded_search,
)
from learnedmetricindex_tpu.utils.logging import Logger


# ----------------------------------------------------------------------
# device primitives (shard-local — every device touches only its rows)
# ----------------------------------------------------------------------
@functools.lru_cache(maxsize=64)
def _apply_updates_fn(mesh, n_chunks: int, chunk: int, donate: bool):
    """Jitted shard-local scatter, memoized per (mesh, layout) — a
    fresh closure per call would miss jax's jit cache (keyed on
    function identity) and retrace EVERY insert/delete, minutes per
    mutation on remote-compile TPU runtimes."""
    axis = mesh.axis_names

    def local(cd, ci, cs, r, s, i, sc):
        s0 = s[0]
        cd = cd.at[0, s0].set(r[0], mode="drop")
        ci = (
            ci.reshape(1, -1)
            .at[0, s0]
            .set(i[0], mode="drop")
            .reshape(1, n_chunks, chunk)
        )
        cs = cs.at[0, s0].set(sc[0], mode="drop")
        return cd, ci, cs

    return jax.jit(
        shard_map_nocheck(
            local,
            mesh,
            in_specs=(
                P(axis, None, None),
                P(axis, None, None),
                P(axis, None),
                P(axis, None, None),
                P(axis, None),
                P(axis, None),
                P(axis, None),
            ),
            out_specs=(P(axis, None, None), P(axis, None, None), P(axis, None)),
        ),
        # donation is OPT-IN and unsafe while serving: an in-flight
        # dispatch still reading the previous store snapshot would hit
        # deleted buffers (serve.py promises it finishes on the old
        # snapshot, and the dispatcher thread does not hold
        # _mutate_lock) — matching the single-chip insert_rows /
        # compact_store defaults
        donate_argnums=(0, 1, 2) if donate else (),
    )


def _apply_updates(sharded: ShardedStore, rows, slots, ids, scales,
                   donate: bool = False):
    """Scatter per-device update batches into the stacked store arrays.

    ``rows (D, M, d)``, ``slots (D, M)``, ``ids (D, M)``, ``scales
    (D, M)`` — padding entries carry ``slot == n_slots`` (out of range)
    and are dropped by the scatter.  ``donate=True`` updates in place
    (no full-store copy) but is only safe OFFLINE — see
    :func:`_apply_updates_fn`."""
    mesh = sharded.mesh
    axis = mesh.axis_names
    n_chunks, chunk = sharded.chunk_ids.shape[1:]
    fn = _apply_updates_fn(mesh, int(n_chunks), int(chunk), donate)
    put = lambda x, nd: jax.device_put(  # noqa: E731
        x, NamedSharding(mesh, P(axis, *([None] * nd)))
    )
    cd, ci, cs = fn(
        sharded.chunk_data,
        sharded.chunk_ids,
        sharded.chunk_scales,
        put(rows, 2),
        put(slots, 1),
        put(ids, 1),
        put(scales, 1),
    )
    return sharded._replace(chunk_data=cd, chunk_ids=ci, chunk_scales=cs)


@functools.lru_cache(maxsize=64)
def _grow_stacked_fn(mesh, extra_chunks: int, chunk: int, donate: bool):
    """Jitted stacked-array growth, memoized per (mesh, growth shape).
    ONE jit level: the previous inner-jit-in-outer-jit nesting inlined
    the inner function and silently dropped its ``donate_argnums``,
    peaking at old+new store bytes."""
    axis = mesh.axis_names
    pad_rows = extra_chunks * chunk

    def grow(cd, ci, cs):
        return (
            jnp.concatenate(
                [cd, jnp.zeros((cd.shape[0], pad_rows, cd.shape[2]), cd.dtype)],
                axis=1,
            ),
            jnp.concatenate(
                [ci, jnp.zeros((ci.shape[0], extra_chunks, chunk), ci.dtype)],
                axis=1,
            ),
            jnp.concatenate(
                [cs, jnp.zeros((cs.shape[0], pad_rows), cs.dtype)], axis=1
            ),
        )

    return jax.jit(
        grow,
        out_shardings=(
            NamedSharding(mesh, P(axis, None, None)),
            NamedSharding(mesh, P(axis, None, None)),
            NamedSharding(mesh, P(axis, None)),
        ),
        # same serving-concurrency caveat as _apply_updates_fn: donation
        # frees the old arrays while an in-flight dispatch may read them
        donate_argnums=(0, 1, 2) if donate else (),
    )


def _grow_stacked(sharded: ShardedStore, extra_chunks: int,
                  donate: bool = False) -> ShardedStore:
    """Append ``extra_chunks`` zeroed chunks to EVERY device's slab
    region (the stacked layout shares one chunk axis; one O(store)
    copy, callers grow geometrically)."""
    fn = _grow_stacked_fn(
        sharded.mesh, int(extra_chunks), int(sharded.chunk), donate
    )
    cd, ci, cs = fn(sharded.chunk_data, sharded.chunk_ids,
                    sharded.chunk_scales)
    return sharded._replace(chunk_data=cd, chunk_ids=ci, chunk_scales=cs)


@functools.lru_cache(maxsize=64)
def _compact_gather_fn(mesh, new_chunks: int, chunk: int, donate: bool):
    """Jitted per-device repack, memoized per (mesh, layout) — see
    :func:`_apply_updates_fn` for the retrace and donation rationale."""
    axis = mesh.axis_names

    def local(cd, ci, cs, g, v):
        g0, v0 = g[0], v[0]
        data = jnp.where(v0[:, None], cd[0][g0], jnp.zeros((), cd.dtype))
        ids = jnp.where(v0, ci.reshape(1, -1)[0][g0], 0).astype(jnp.int32)
        sc = jnp.where(v0, cs[0][g0], 0.0)
        return (
            data[None],
            ids.reshape(1, new_chunks, chunk),
            sc[None],
        )

    return jax.jit(
        shard_map_nocheck(
            local,
            mesh,
            in_specs=(
                P(axis, None, None),
                P(axis, None, None),
                P(axis, None),
                P(axis, None),
                P(axis, None),
            ),
            out_specs=(P(axis, None, None), P(axis, None, None), P(axis, None)),
        ),
        donate_argnums=(0, 1, 2) if donate else (),
    )


def _compact_gather(sharded: ShardedStore, gather, valid,
                    donate: bool = False):
    """Per-device repack: ``gather (D, new_slots)`` old-slot index per
    new slot (``valid`` False → zero padding).  One fused gather+select
    per device, same budget as the single-chip ``_compact_gather``."""
    mesh = sharded.mesh
    axis = mesh.axis_names
    chunk = sharded.chunk
    new_chunks = gather.shape[1] // chunk
    fn = _compact_gather_fn(mesh, int(new_chunks), int(chunk), donate)
    put = lambda x, nd: jax.device_put(  # noqa: E731
        x, NamedSharding(mesh, P(axis, *([None] * nd)))
    )
    cd, ci, cs = fn(
        sharded.chunk_data,
        sharded.chunk_ids,
        sharded.chunk_scales,
        put(gather, 1),
        put(valid, 1),
    )
    return sharded._replace(chunk_data=cd, chunk_ids=ci, chunk_scales=cs)


# ----------------------------------------------------------------------
# host-side per-device CSR planning (mirrors index/mutation.insert_rows)
# ----------------------------------------------------------------------
def _ensure_sub_mutable(sub: BucketStore, c_max: int) -> BucketStore:
    """Attach chunk-list bookkeeping to a sub-store's host metadata.
    Chunks ``[bucket_chunk_start[-1], c_max)`` are the device's initial
    free pool (the stacked layout pads every device to the widest)."""
    if sub.bucket_chunk_list is not None:
        return sub
    starts = sub.bucket_chunk_start.astype(np.int64)
    return sub._replace(
        bucket_chunk_ptr=starts.copy(),
        bucket_chunk_list=np.arange(int(starts[-1]), dtype=np.int32),
        bucket_fill=sub.bucket_sizes.astype(np.int32).copy(),
    )


def _plan_insert_local(
    sub: BucketStore, c_max: int, local_buckets: np.ndarray
) -> Tuple[BucketStore, np.ndarray, int]:
    """Assign a slot to every new row of one device (append at each
    bucket's high-water mark, splicing free-pool chunks into the
    bucket's chunk list as needed).  Returns ``(updated sub-metadata,
    slots, chunks_short)`` — ``chunks_short > 0`` means the device's
    pool ran dry and the caller must grow the stacked arrays and retry.
    """
    sub = _ensure_sub_mutable(sub, c_max)
    chunk = sub.chunk
    ptr = sub.bucket_chunk_ptr.astype(np.int64)
    clist = sub.bucket_chunk_list
    fill = sub.bucket_fill.astype(np.int64).copy()
    sizes = sub.bucket_sizes.astype(np.int64).copy()
    m = len(local_buckets)

    counts_new = np.bincount(local_buckets, minlength=sub.n_buckets)
    have = ptr[1:] - ptr[:-1]
    need = -(-(fill + counts_new) // chunk)
    extra_per_bucket = np.maximum(need - have, 0)
    n_extra = int(extra_per_bucket.sum())

    if n_extra:
        assigned = np.zeros(c_max, bool)
        assigned[clist] = True
        free = np.nonzero(~assigned)[0]
        if len(free) < n_extra:
            return sub, None, n_extra - len(free)
        new_ptr = np.concatenate(
            [[0], np.cumsum(have + extra_per_bucket)]
        ).astype(np.int64)
        new_list = np.zeros(int(new_ptr[-1]), dtype=np.int32)
        old_bucket = np.repeat(np.arange(sub.n_buckets, dtype=np.int64), have)
        src = np.arange(len(clist), dtype=np.int64)
        new_list[new_ptr[old_bucket] + (src - ptr[old_bucket])] = clist
        take = 0
        for b in np.nonzero(extra_per_bucket)[0]:
            g = int(extra_per_bucket[b])
            new_list[new_ptr[b] + have[b] : new_ptr[b] + have[b] + g] = free[
                take : take + g
            ]
            take += g
        ptr, clist = new_ptr, new_list

    order = np.argsort(local_buckets, kind="stable")
    rank = np.empty(m, np.int64)
    starts_in_sorted = np.concatenate([[0], np.cumsum(counts_new)[:-1]])
    rank[order] = np.arange(m) - starts_in_sorted[local_buckets[order]]
    pos = fill[local_buckets] + rank
    slots = (
        clist[ptr[local_buckets] + pos // chunk].astype(np.int64) * chunk
        + pos % chunk
    )

    affected = np.nonzero(counts_new)[0]
    fill[affected] += counts_new[affected]
    sizes[affected] += counts_new[affected]
    out = sub._replace(
        bucket_chunk_ptr=ptr,
        bucket_chunk_list=clist,
        bucket_fill=fill.astype(np.int32),
        bucket_sizes=sizes.astype(np.int32),
    )
    return out, slots, 0


# ----------------------------------------------------------------------
# serving-facing wrapper
# ----------------------------------------------------------------------
class ShardedDynamicIndex(Logger):
    """A built index over a mesh-sharded store that accepts inserts and
    deletes while serving — the multi-chip counterpart of
    :class:`~learnedmetricindex_tpu.index.mutation.DynamicIndex`.

    Single-controller only (one process driving all mesh devices —
    every local device of a single-process mesh, or a jit-only
    multi-device topology).  The routers stay fixed; the store moves.

    >>> dyn = ShardedDynamicIndex.from_built(index, data, pred, mesh=mesh)
    >>> ids = dyn.insert(new_vectors)
    >>> dyn.delete(ids[:5])
    >>> dists, nns, t = dyn.search(queries, n_buckets=4, k=10)
    """

    def __init__(
        self,
        index,
        sharded: ShardedStore,
        next_id: Optional[int] = None,
        donate: bool = False,
    ):
        # donate=True applies mutations in place (no O(store) copy per
        # insert/delete/compact/grow) but is ONLY safe offline: while
        # serving, an in-flight dispatch reading the previous snapshot
        # would hit donated (deleted) buffers.  Default matches the
        # single-chip DynamicIndex (functional updates).
        self.donate = bool(donate)
        # next_id: pass the source deployment's allocator mark when
        # promoting a mutated store (``shard_packed_store``) — the
        # store itself only records LIVE ids, so the default
        # (max live id + 1) could re-issue a deleted id.
        from learnedmetricindex_tpu.parallel import multiprocess as mp

        if mp.is_multiprocess(sharded.mesh):
            raise ValueError(
                "ShardedDynamicIndex is single-controller: a "
                "multi-process mesh would need every process to apply "
                "the same mutation log — drive mutations from one "
                "controller or rebuild via shard_store"
            )
        self.index = index
        self.sharded = sharded
        n_dev = sharded.mesh.devices.size
        self._c_max = sharded.chunk_ids.shape[1]
        self.sharded = sharded._replace(
            sub_stores=[
                _ensure_sub_mutable(s, self._c_max)
                for s in sharded.sub_stores
            ]
        )
        # authoritative host id → (device, slot) map (single controller
        # owns every mutation, so no device readback is ever needed).
        # Built once from the id grid: 4+1 bytes per allocated id.
        ids_host = np.asarray(sharded.chunk_ids).reshape(n_dev, -1)
        max_id = int(ids_host.max(initial=0))
        cap = max(max_id, 1)
        self._id_dev = np.full(cap, -1, np.int8 if n_dev <= 127 else np.int16)
        self._id_slot = np.zeros(cap, np.int32)
        for dev in range(n_dev):
            ids_d = ids_host[dev]
            live = ids_d > 0
            self._id_dev[ids_d[live] - 1] = dev
            self._id_slot[ids_d[live] - 1] = np.nonzero(live)[0].astype(
                np.int32
            )
        self.next_id = int(next_id if next_id is not None else max_id + 1)

    # ---- construction ------------------------------------------------
    @classmethod
    def from_built(
        cls,
        index,
        data_search,
        data_prediction: np.ndarray,
        mesh,
        chunk: Optional[int] = None,
    ) -> "ShardedDynamicIndex":
        """Stand up a mutable sharded store from a fresh build's outputs
        (same row→bucket semantics as the immutable
        ``LearnedIndex.get_sharded_store``)."""
        from learnedmetricindex_tpu.parallel.sharded_index import shard_store

        bucket_ids = index.bucket_ids_from_prediction(data_prediction)
        n_total = int(np.prod(index.config.n_categories, dtype=np.int64))
        sharded = shard_store(
            np.asarray(data_search, np.float32),
            bucket_ids,
            n_total,
            mesh,
            chunk=chunk or index.config.chunk_size,
        )
        return cls(index, sharded)

    @property
    def n_rows(self) -> int:
        """Live (non-deleted) rows across all devices."""
        return int(
            sum(int(s.bucket_sizes.sum()) for s in self.sharded.sub_stores)
        )

    @property
    def mesh(self):
        return self.sharded.mesh

    @property
    def store(self):
        """The live store snapshot (``SearchServer`` reads this after
        every mutation, same as the single-chip ``DynamicIndex``)."""
        return self.sharded

    # ---- id-map helpers ----------------------------------------------
    def _id_capacity(self) -> int:
        return self._id_dev.shape[0]

    def _grow_id_maps(self, max_id: int) -> None:
        cap = self._id_capacity()
        if max_id <= cap:
            return
        new_cap = max(max_id, cap + cap // 4)
        id_dev = np.full(new_cap, -1, self._id_dev.dtype)
        id_dev[:cap] = self._id_dev
        id_slot = np.zeros(new_cap, np.int32)
        id_slot[:cap] = self._id_slot
        self._id_dev, self._id_slot = id_dev, id_slot

    # ---- mutation surface ----------------------------------------------
    def insert(self, vectors, object_ids=None) -> np.ndarray:
        """Classify + append to the owning shards; returns the rows'
        1-based object ids.  Same validation surface as the
        single-chip ``insert_rows`` (id range / dense-map cap /
        duplicate and live-id rejection)."""
        import os

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
        if len(object_ids) != m:
            raise ValueError("vectors / object_ids length mismatch")
        if object_ids.min() < 1:
            raise ValueError("object ids are 1-based (reference convention)")
        max_id = int(object_ids.max())
        if max_id > _INT32_MAX:
            raise ValueError(
                f"object id {max_id} exceeds int32 range ({_INT32_MAX})"
            )
        id_cap = int(os.environ.get("LMI_MAX_OBJECT_ID", 1 << 28))
        if max_id > id_cap:
            raise ValueError(
                f"object id {max_id} exceeds the configured id-space cap "
                f"({id_cap}) — renumber, or raise LMI_MAX_OBJECT_ID"
            )
        if len(np.unique(object_ids)) != m:
            raise ValueError("duplicate object ids within the insert batch")
        in_map = object_ids[object_ids <= self._id_capacity()]
        if len(in_map) and (self._id_dev[in_map - 1] >= 0).any():
            bad = in_map[self._id_dev[in_map - 1] >= 0][0]
            raise ValueError(
                f"object id(s) already live (e.g. {int(bad)}) — delete "
                "first or use fresh ids"
            )

        pred = classify(self.index, vectors)
        buckets = self.index.bucket_ids_from_prediction(pred)
        dev_of = self.sharded.bucket_device[buckets]
        local_b = self.sharded.bucket_local[buckets]
        n_dev = self.mesh.devices.size

        # per-device slot planning (retry once after a grow)
        for _attempt in range(2):
            new_subs = list(self.sharded.sub_stores)
            slots_of_row = np.empty(m, np.int64)
            shortfall = 0
            for dev in range(n_dev):
                sel = np.nonzero(dev_of == dev)[0]
                if not len(sel):
                    continue
                sub, slots, short = _plan_insert_local(
                    new_subs[dev], self._c_max, local_b[sel]
                )
                if short:
                    shortfall = max(shortfall, short)
                    continue
                new_subs[dev] = sub
                slots_of_row[sel] = slots
            if not shortfall:
                break
            grow = max(shortfall, self._c_max // 8, 1)
            old_hint = id(self.sharded.chunk_ids)
            self.sharded = _grow_stacked(self.sharded, grow,
                                             donate=self.donate)
            self._c_max += grow
            migrate_shape_hints(old_hint, id(self.sharded.chunk_ids))
        else:  # pragma: no cover — one grow always suffices
            raise RuntimeError("insert could not allocate chunks")

        # padded per-device update batches (pad slot == n_slots drops)
        n_slots = self._c_max * self.sharded.chunk
        counts_dev = np.bincount(dev_of, minlength=n_dev)
        M = max(int(counts_dev.max()), 1)
        d = vectors.shape[1]
        if self.sharded.chunk_data.dtype == jnp.int8:
            from learnedmetricindex_tpu.ops.quantize import quantize_rows_np

            rows_payload, scales_payload = quantize_rows_np(vectors)
        else:
            rows_payload = vectors.astype(
                np.dtype(self.sharded.chunk_data.dtype)
            )
            scales_payload = np.ones(m, np.float32)

        rows = np.zeros((n_dev, M, d), rows_payload.dtype)
        slots = np.full((n_dev, M), n_slots, np.int64)
        ids = np.zeros((n_dev, M), np.int32)
        scales = np.zeros((n_dev, M), np.float32)
        for dev in range(n_dev):
            sel = np.nonzero(dev_of == dev)[0]
            if not len(sel):
                continue
            c = len(sel)
            rows[dev, :c] = rows_payload[sel]
            slots[dev, :c] = slots_of_row[sel]
            ids[dev, :c] = object_ids[sel]
            scales[dev, :c] = scales_payload[sel]

        old_hint = id(self.sharded.chunk_ids)
        self.sharded = _apply_updates(
            self.sharded._replace(sub_stores=new_subs),
            rows,
            slots.astype(np.int32),
            ids,
            scales,
            donate=self.donate,
        )
        migrate_shape_hints(old_hint, id(self.sharded.chunk_ids))

        self._grow_id_maps(max_id)
        self._id_dev[object_ids - 1] = dev_of
        self._id_slot[object_ids - 1] = slots_of_row
        self.next_id = max(self.next_id, max_id + 1)
        return object_ids

    def delete(self, object_ids) -> int:
        """Remove rows by 1-based object id (idempotent); returns the
        number deleted.  Slots become padding in place."""
        object_ids = np.unique(np.asarray(object_ids, np.int64))
        object_ids = object_ids[
            (object_ids >= 1) & (object_ids <= self._id_capacity())
        ]
        live = object_ids[self._id_dev[object_ids - 1] >= 0]
        n_del = len(live)
        if n_del == 0:
            return 0
        dev_of = self._id_dev[live - 1].astype(np.int64)
        slot_of = self._id_slot[live - 1].astype(np.int64)
        n_dev = self.mesh.devices.size
        n_slots = self._c_max * self.sharded.chunk
        counts_dev = np.bincount(dev_of, minlength=n_dev)
        M = max(int(counts_dev.max()), 1)
        d = self.sharded.chunk_data.shape[-1]

        rows = np.zeros((n_dev, M, d), np.dtype(self.sharded.chunk_data.dtype))
        slots = np.full((n_dev, M), n_slots, np.int64)
        ids = np.zeros((n_dev, M), np.int32)
        scales = np.zeros((n_dev, M), np.float32)
        new_subs = list(self.sharded.sub_stores)
        chunk = self.sharded.chunk
        for dev in range(n_dev):
            sel = np.nonzero(dev_of == dev)[0]
            if not len(sel):
                continue
            slots[dev, : len(sel)] = slot_of[sel]
            # bucket-size bookkeeping (navigation cost model)
            sub = new_subs[dev]
            nch = sub.bucket_chunk_ptr[1:] - sub.bucket_chunk_ptr[:-1]
            chunk_bucket = np.full(self._c_max, -1, np.int64)
            chunk_bucket[sub.bucket_chunk_list] = np.repeat(
                np.arange(sub.n_buckets, dtype=np.int64), nch
            )
            sizes = sub.bucket_sizes.astype(np.int64).copy()
            np.subtract.at(sizes, chunk_bucket[slot_of[sel] // chunk], 1)
            new_subs[dev] = sub._replace(bucket_sizes=sizes.astype(np.int32))

        old_hint = id(self.sharded.chunk_ids)
        self.sharded = _apply_updates(
            self.sharded._replace(sub_stores=new_subs),
            rows,
            slots.astype(np.int32),
            ids,
            scales,
            donate=self.donate,
        )
        migrate_shape_hints(old_hint, id(self.sharded.chunk_ids))
        self._id_dev[live - 1] = -1
        return n_del

    def compact(self) -> dict:
        """Repack every device's slabs: drop delete holes and overflow
        fragmentation.  Rows keep their device, bucket and relative
        scan order, so search output is bit-identical before/after.
        Returns ``{"chunks_before", "chunks_after"}`` (per-device
        common chunk-axis length)."""
        n_dev = self.mesh.devices.size
        chunk = self.sharded.chunk
        before = self._c_max

        per_dev = []
        new_c = 1
        for dev in range(n_dev):
            sub = self.sharded.sub_stores[dev]
            ids_live = np.nonzero(self._id_dev == dev)[0]  # 0-based ids
            slots = self._id_slot[ids_live].astype(np.int64)
            # slot → (bucket, scan position) through the chunk list
            ptr = sub.bucket_chunk_ptr.astype(np.int64)
            clist = sub.bucket_chunk_list.astype(np.int64)
            per_bucket = ptr[1:] - ptr[:-1]
            entry_bucket = np.repeat(
                np.arange(sub.n_buckets, dtype=np.int64), per_bucket
            )
            chunk_bucket = np.full(self._c_max, -1, np.int64)
            chunk_bucket[clist] = entry_bucket
            chunk_pos = np.zeros(self._c_max, np.int64)
            chunk_pos[clist] = np.arange(len(clist)) - ptr[entry_bucket]
            b_of = chunk_bucket[slots // chunk]
            pos = chunk_pos[slots // chunk] * chunk + slots % chunk
            order = np.lexsort((pos, b_of))
            src = slots[order]
            bs = b_of[order]
            new_sizes = np.bincount(bs, minlength=sub.n_buckets)
            nchunks = -(-new_sizes // chunk)
            starts = np.concatenate([[0], np.cumsum(nchunks)]).astype(
                np.int64
            )
            cum = np.concatenate([[0], np.cumsum(new_sizes)]).astype(np.int64)
            within = np.arange(len(src), dtype=np.int64) - cum[bs]
            dst = starts[bs] * chunk + within
            per_dev.append(
                (ids_live[order], src, dst, starts, new_sizes)
            )
            new_c = max(new_c, int(starts[-1]))

        gather = np.zeros((n_dev, new_c * chunk), np.int64)
        valid = np.zeros((n_dev, new_c * chunk), bool)
        new_subs = []
        for dev, (ids_o, src, dst, starts, new_sizes) in enumerate(per_dev):
            gather[dev, dst] = src
            valid[dev, dst] = True
            sub = self.sharded.sub_stores[dev]
            new_subs.append(
                sub._replace(
                    bucket_chunk_start=starts.astype(np.int32),
                    bucket_sizes=new_sizes.astype(np.int32),
                    bucket_chunk_ptr=starts.copy(),
                    bucket_chunk_list=np.arange(
                        int(starts[-1]), dtype=np.int32
                    ),
                    bucket_fill=new_sizes.astype(np.int32),
                )
            )
            # id map follows the move
            self._id_slot[ids_o] = dst

        old_hint = id(self.sharded.chunk_ids)
        self.sharded = _compact_gather(
            self.sharded._replace(sub_stores=new_subs),
            gather.astype(np.int32),
            valid,
            donate=self.donate,
        )
        self._c_max = new_c
        migrate_shape_hints(old_hint, id(self.sharded.chunk_ids))
        return {"chunks_before": before, "chunks_after": new_c}

    # ---- queries -------------------------------------------------------
    def search(self, queries, n_buckets: int = 1, k: int = 10, **knobs):
        """Search the live sharded store (``index.search`` routes a
        ``ShardedStore`` through ``sharded_search``)."""
        q = np.asarray(queries, np.float32)
        return self.index.search(
            None,
            q,
            None,
            q,
            None,
            n_buckets=n_buckets,
            k=k,
            store=self.sharded,
            **knobs,
        )
