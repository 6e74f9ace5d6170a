"""Multi-chip bucket search: the store sharded over the mesh by bucket.

This is the framework's scale-out query path (the reference has no
distributed counterpart — SURVEY.md §2.3; its scaling axis, dataset
size, was bounded by single-host RAM, ``README.md:70-75``):

* **Bucket sharding.**  Leaf buckets are assigned round-robin by size
  to mesh devices; each device holds a self-contained packed sub-store
  (its buckets' chunk slabs + id grid).  The stacked per-device arrays
  are sharded on their leading axis, so every device touches only local
  HBM during the scan.
* **Replicated queries, local plans.**  A search builds one scan plan
  per device (host-side, against that device's sub-store) padded to a
  common work-list length; queries are replicated.
* **`shard_map` scan + collective merge.**  Each device runs the same
  phase-1 kernel over its local items, reduces its candidates to a
  per-query top-k, then the per-device results are combined with one
  ``all_gather`` over the mesh (k·D candidates per query) and a final
  top-k — the cross-chip merge rides ICI.

At 100M×768 (int8) this is ~76 GB of slabs over 8 chips ≈ 9.5 GB each:
exactly the v5e-8 deployment the BASELINE.json north star names.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from learnedmetricindex_tpu.index.bucket_store import (
    BucketStore,
    _gather_work_queries,
    _item_topk,
    _merge_pairs_dense,
    _rerank_exact_slots,
    build_scan_plan,
)


def _flat_axis_index(mesh):
    """Flattened device index along all mesh axes (inside shard_map),
    matching ``mesh.devices.flat`` order."""
    idx = 0
    for name in mesh.axis_names:
        idx = idx * mesh.shape[name] + jax.lax.axis_index(name)
    return idx


from learnedmetricindex_tpu.parallel.mesh import (  # noqa: E402
    shard_map_nocheck as _shard_map_fn,
)


def _fill_from_sharded_corpus(data, ids_grid, mesh):
    """Pack per-device slabs from a ROW-SHARDED corpus (multi-device or
    multi-process): each device gathers the slot rows it owns from its
    local row block and one ``psum_scatter`` per slot block delivers
    each target device its summed slab — contributions are disjoint
    (every row has one owner), so the sum is a routed exchange.  Total
    communication ≈ one corpus pass over ICI/DCN; no process ever
    addresses a remote device (the multi-host ``shard_store`` path,
    VERDICT r2 missing #1).

    ``ids_grid``: (n_dev, max_slots) 1-based global row ids (0 = pad),
    identical on every process (derived from the replicated bucket
    metadata); replicated transiently (4 bytes/slot).
    """
    from jax.sharding import PartitionSpec as P

    from learnedmetricindex_tpu.parallel import multiprocess as mp

    axis = mesh.axis_names
    n_dev = mesh.devices.size
    n, d = data.shape
    pad = (-n) % n_dev
    if pad:
        data = jnp.pad(data, ((0, pad), (0, 0)))
    data = mp.reshard(data, mesh, P(axis, None))
    L = data.shape[0] // n_dev
    max_slots = ids_grid.shape[1]

    # slot block size: bound the transient (n_dev, B, d) contribution
    itemsize = np.dtype(data.dtype).itemsize
    B = max(1, min(max_slots, (128 << 20) // max(n_dev * d * itemsize, 1)))
    n_blocks = -(-max_slots // B)
    ids_pad = np.zeros((n_dev, n_blocks * B), np.int32)
    ids_pad[:, :max_slots] = ids_grid.reshape(n_dev, max_slots)
    ids_dev = mp.put_global(ids_pad, mesh, P())

    def local(rows, ids):  # rows (L, d) local block; ids replicated
        r0 = _flat_axis_index(mesh) * L
        out = jnp.zeros((1, n_blocks * B, d), rows.dtype)

        def body(c, out):
            ids_c = jax.lax.dynamic_slice(ids, (0, c * B), (n_dev, B)) - 1
            own = (ids_c >= r0) & (ids_c < r0 + L)
            loc = jnp.clip(ids_c - r0, 0, L - 1)
            contrib = rows[loc.reshape(-1)].reshape(n_dev, B, d)
            contrib = jnp.where(own[:, :, None], contrib, 0)
            mine = jax.lax.psum_scatter(
                contrib, axis, scatter_dimension=0, tiled=True
            )  # (1, B, d): this device's slots of the block
            return jax.lax.dynamic_update_slice(out, mine, (0, c * B, 0))

        return jax.lax.fori_loop(0, n_blocks, body, out)

    filled = jax.jit(
        _shard_map_fn(
            local, mesh,
            in_specs=(P(axis, None), P()),
            out_specs=P(axis, None, None),
        )
    )(data, ids_dev)
    return filled[:, :max_slots, :]


class ShardedStore(NamedTuple):
    """Per-device packed sub-stores, stacked on a leading device axis.

    ``chunk_data`` keeps the corpus dtype end-to-end (an int8 corpus
    stays int8 on device — the cast to f32 happens per chunk slab inside
    the scan body, exactly like the single-chip ``_scan_items``), so the
    per-chip footprint is ``corpus_bytes / n_devices`` + the id grid:
    100M × 768 int8 ≈ 9.5 GB per v5e-8 chip.
    """

    chunk_data: jnp.ndarray  # (D, n_slots, d) sharded on axis 0, corpus dtype
    chunk_ids: jnp.ndarray  # (D, n_chunks, chunk) sharded on axis 0
    chunk_scales: jnp.ndarray  # (D, n_slots) sharded on axis 0 (ones if unscaled)
    sub_stores: List[BucketStore]  # host-side CSR metadata per device (no arrays)
    bucket_device: np.ndarray  # (n_buckets,) owning device
    bucket_local: np.ndarray  # (n_buckets,) bucket index within its device
    mesh: Mesh
    chunk: int

    def nbytes_device_arrays(self) -> int:
        return (
            self.chunk_data.nbytes
            + self.chunk_ids.nbytes
            + self.chunk_scales.nbytes
        )

    @property
    def n_chunks(self) -> int:
        """Per-device chunk-axis length (the stacked layout pads every
        device to a common width) — the serving layer's capacity stat,
        name-compatible with the packed ``BucketStore``."""
        return int(self.chunk_ids.shape[1])


def shard_store(
    data,
    bucket_ids: np.ndarray,
    n_buckets: int,
    mesh: Mesh,
    chunk: int = 256,
    row_scales=None,
) -> ShardedStore:
    """Partition buckets over mesh devices (balanced by size) and build
    one packed sub-store per device, stacked on a sharded device axis.

    ``data`` may be a host array or a device-resident ``jax.Array``; a
    device corpus is **never** round-tripped through the host — each
    target device's slab is gathered on the source device and moved
    directly (one corpus-sized pass in total, 1/D per target, riding
    ICI on real hardware).  The stored dtype is the corpus dtype
    (int8 stays int8); ``row_scales`` supplies per-row dequantization
    scales applied inside the scan.
    """
    bucket_ids = np.asarray(bucket_ids)
    n_dev = mesh.devices.size
    from learnedmetricindex_tpu import native

    counts = native.bincount(bucket_ids, n_buckets)

    # balanced assignment: biggest buckets first, to the lightest device
    order = np.argsort(-counts, kind="stable")
    load = np.zeros(n_dev, dtype=np.int64)
    bucket_device = np.zeros(n_buckets, dtype=np.int32)
    for b in order:
        dev = int(np.argmin(load))
        bucket_device[b] = dev
        load[dev] += counts[b]

    # per-device local bucket order + chunk CSR
    bucket_local = np.zeros(n_buckets, dtype=np.int32)
    nchunks = -(-counts // chunk)  # empty bucket → 0 chunks
    mine_list = []
    starts_local = []
    slots_per_dev = []
    for dev in range(n_dev):
        mine = np.nonzero(bucket_device == dev)[0]
        bucket_local[mine] = np.arange(len(mine))
        mine_list.append(mine)
        st = np.concatenate([[0], np.cumsum(nchunks[mine])]).astype(np.int32)
        starts_local.append(st)
        slots_per_dev.append(int(st[-1]) * chunk)
    max_slots = max(max(slots_per_dev), chunk)
    c_max = max_slots // chunk

    # ONE global grouped fill: segments ordered (device, local bucket),
    # each device's region padded to max_slots
    seg_starts = np.concatenate(
        [
            dev * max_slots + starts_local[dev][:-1].astype(np.int64) * chunk
            for dev in range(n_dev)
        ]
    )
    seg_base = np.concatenate(
        [[0], np.cumsum([len(m) for m in mine_list])]
    ).astype(np.int64)
    seg_of_row = seg_base[bucket_device[bucket_ids]] + bucket_local[bucket_ids]
    ids_flat = native.fill_slots_1based(
        seg_of_row, seg_starts, n_dev * max_slots
    )  # 1-based GLOBAL row ids, 0 = pad
    ids_grid = ids_flat.reshape(n_dev, c_max, chunk)

    # host-side dequantization scales per slot
    scales_host = np.ones(n_dev * max_slots, np.float32)
    if row_scales is not None:
        valid = ids_flat > 0
        scales_host[:] = 0.0
        scales_host[valid] = np.asarray(row_scales, np.float32)[
            ids_flat[valid] - 1
        ]
    scales_grid = scales_host.reshape(n_dev, max_slots)

    from learnedmetricindex_tpu.parallel import multiprocess as mp

    axis = mesh.axis_names
    shard3 = NamedSharding(mesh, P(axis, None, None))
    devices = list(mesh.devices.flat)

    if isinstance(data, jax.Array) and (
        len(data.sharding.device_set) > 1 or not data.is_fully_addressable
    ):
        # row-sharded (multi-device / multi-process) corpus: routed
        # shard-local gathers + psum_scatter — no host round-trip and
        # no cross-process addressing
        d = data.shape[1]
        chunk_data = _fill_from_sharded_corpus(
            data, ids_grid.reshape(n_dev, max_slots), mesh
        )
    elif isinstance(data, jax.Array):
        d = data.shape[1]
        src_dev = list(data.devices())[0]

        @jax.jit
        def gather_slab(ids, corpus):
            slab = corpus[jnp.maximum(ids - 1, 0)]
            return jnp.where((ids > 0)[:, None], slab, 0).astype(corpus.dtype)

        shards = []
        for i, dev in enumerate(devices):
            ids_i = jax.device_put(ids_grid[i].reshape(-1), src_dev)
            slab = gather_slab(ids_i, data)  # (max_slots, d) on source
            shards.append(jax.device_put(slab[None], dev))
        chunk_data = jax.make_array_from_single_device_arrays(
            (n_dev, max_slots, d), shard3, shards
        )
    else:
        data = np.asarray(data)
        d = data.shape[1]
        cd = data[np.maximum(ids_flat - 1, 0)]
        cd[ids_flat == 0] = 0
        chunk_data = mp.put_global(
            cd.reshape(n_dev, max_slots, d), mesh, P(axis, None, None)
        )

    # lightweight per-device metadata for host-side plan building
    sub_stores = [
        BucketStore(
            chunk_ids=None,
            bucket_chunk_start=starts_local[dev],
            bucket_sizes=counts[mine_list[dev]].astype(np.int32),
            chunk=chunk,
            n_buckets=len(mine_list[dev]),
        )
        for dev in range(n_dev)
    ]

    return ShardedStore(
        chunk_data=chunk_data,
        chunk_ids=mp.put_global(ids_grid, mesh, P(axis, None, None)),
        chunk_scales=mp.put_global(scales_grid, mesh, P(axis, None)),
        sub_stores=sub_stores,
        bucket_device=bucket_device,
        bucket_local=bucket_local,
        mesh=mesh,
        chunk=chunk,
    )


def shard_packed_store(store: BucketStore, mesh: Mesh) -> ShardedStore:
    """Promote a packed single-chip store to a mesh-sharded store
    WITHOUT a host corpus round-trip.

    Both layouts are chunk-granular, so the whole transform is one
    chunk-level device gather per target device: bucket b's chunk
    sequence (CSR range, or the chunk list of a mutated store — holes
    and overflow chunks travel verbatim) lands contiguously in its
    owner's slab region.  Per-bucket scan order is preserved, so
    searches return bit-identical neighbors.  Use case: a corpus built
    and packed on one chip that must become mutable/servable across
    the mesh (``ShardedDynamicIndex(index, shard_packed_store(...))``).
    """
    if store.chunk_data is None:
        raise ValueError(
            "shard_packed_store needs a packed store (virtual stores "
            "reference a row-major corpus — use shard_store on it)"
        )
    n_dev = mesh.devices.size
    counts = np.asarray(store.bucket_sizes, np.int64)
    n_buckets = store.n_buckets
    chunk = store.chunk
    if store.bucket_chunk_list is not None:
        ptr = store.bucket_chunk_ptr.astype(np.int64)
        chunk_of = store.bucket_chunk_list.astype(np.int64)
    else:
        ptr = store.bucket_chunk_start.astype(np.int64)
        chunk_of = np.arange(int(ptr[-1]), dtype=np.int64)
    nchunks = ptr[1:] - ptr[:-1]

    # balanced bucket → device assignment (same policy as shard_store)
    order = np.argsort(-counts, kind="stable")
    load = np.zeros(n_dev, dtype=np.int64)
    bucket_device = np.zeros(n_buckets, dtype=np.int32)
    for b in order:
        dev = int(np.argmin(load))
        bucket_device[b] = dev
        load[dev] += counts[b]

    bucket_local = np.zeros(n_buckets, dtype=np.int32)
    mine_list, starts_local, src_chunks = [], [], []
    for dev in range(n_dev):
        mine = np.nonzero(bucket_device == dev)[0]
        bucket_local[mine] = np.arange(len(mine))
        mine_list.append(mine)
        st = np.concatenate([[0], np.cumsum(nchunks[mine])]).astype(np.int32)
        starts_local.append(st)
        src_chunks.append(
            np.concatenate(
                [chunk_of[ptr[b] : ptr[b + 1]] for b in mine]
                or [np.empty(0, np.int64)]
            )
        )
    c_max = max(max(len(s) for s in src_chunks), 1)

    d = store.chunk_data.shape[-1]
    src_data = store.chunk_data.reshape(-1, chunk, d)
    src_ids = store.chunk_ids
    src_scales = (
        store.chunk_scales.reshape(-1, chunk)
        if store.chunk_scales is not None
        else None
    )
    src_dev = list(src_data.devices())[0]

    @jax.jit
    def gather_chunks(sel, valid, cd, ci, cs):
        g = jnp.maximum(sel, 0)
        m = valid[:, None, None]
        return (
            jnp.where(m, cd[g], 0).astype(cd.dtype),
            jnp.where(m[..., 0], ci[g], 0),
            jnp.where(m[..., 0], cs[g], 0.0),
        )

    if src_scales is None:
        src_scales = jnp.ones((src_data.shape[0], chunk), jnp.float32)
    axis = mesh.axis_names
    devices = list(mesh.devices.flat)
    data_shards, id_shards, scale_shards = [], [], []
    for i, dev in enumerate(devices):
        sel = np.full(c_max, -1, np.int64)
        sel[: len(src_chunks[i])] = src_chunks[i]
        sel_dev = jax.device_put(sel, src_dev)
        cd_i, ci_i, cs_i = gather_chunks(
            sel_dev, jax.device_put(sel >= 0, src_dev),
            src_data, src_ids, src_scales,
        )
        data_shards.append(jax.device_put(cd_i.reshape(1, -1, d), dev))
        id_shards.append(jax.device_put(ci_i[None], dev))
        scale_shards.append(jax.device_put(cs_i.reshape(1, -1), dev))

    shard3 = NamedSharding(mesh, P(axis, None, None))
    shard2 = NamedSharding(mesh, P(axis, None))
    mk = jax.make_array_from_single_device_arrays
    # a mutated source's per-bucket fill (high-water mark) must travel:
    # re-deriving it as `sizes` would let later inserts overwrite live
    # rows sitting past delete holes
    fill_src = (
        store.bucket_fill
        if store.bucket_fill is not None
        else store.bucket_sizes
    )
    sub_stores = [
        BucketStore(
            chunk_ids=None,
            bucket_chunk_start=starts_local[dev],
            bucket_sizes=counts[mine_list[dev]].astype(np.int32),
            chunk=chunk,
            n_buckets=len(mine_list[dev]),
            bucket_chunk_ptr=starts_local[dev].astype(np.int64),
            bucket_chunk_list=np.arange(
                int(starts_local[dev][-1]), dtype=np.int32
            ),
            bucket_fill=np.asarray(fill_src, np.int32)[mine_list[dev]],
        )
        for dev in range(n_dev)
    ]
    return ShardedStore(
        chunk_data=mk((n_dev, c_max * chunk, d), shard3, data_shards),
        chunk_ids=mk((n_dev, c_max, chunk), shard3, id_shards),
        chunk_scales=mk((n_dev, c_max * chunk), shard2, scale_shards),
        sub_stores=sub_stores,
        bucket_device=bucket_device,
        bucket_local=bucket_local,
        mesh=mesh,
        chunk=chunk,
    )


def _local_topk_sort(cand_d, cand_i, cand_q, Q: int, k: int, cand_s=None):
    """Per-query top-k of a shard's flat candidate rows via one stable
    multi-key sort (same shape as ``bucket_store._merge_candidates``,
    inlined here so it runs inside ``shard_map``).

    ``cand_s``: optional per-candidate local slot indices carried
    through the sort (for the shard-local exact rerank); invalid
    entries come back as -1.
    """
    R = cand_q.shape[0]
    q_rep = jnp.repeat(
        jnp.where(cand_q < 0, Q, cand_q).astype(jnp.int32),
        k,
        total_repeat_length=R * k,
    )
    d_flat = cand_d.reshape(R * k)
    i_flat = cand_i.reshape(R * k)
    operands = (q_rep, d_flat, i_flat)
    if cand_s is not None:
        operands = operands + (cand_s.reshape(R * k),)
    sorted_ops = jax.lax.sort(operands, num_keys=2)
    q_s, d_s, i_s = sorted_ops[:3]
    starts = jnp.searchsorted(q_s, jnp.arange(Q, dtype=jnp.int32))
    idx = jnp.minimum(starts[:, None] + jnp.arange(k)[None, :], R * k - 1)
    out_d = jnp.where(
        q_s[idx] == jnp.arange(Q, dtype=jnp.int32)[:, None], d_s[idx], jnp.inf
    )
    out_i = jnp.where(jnp.isinf(out_d), 0, i_s[idx])
    if cand_s is None:
        return out_d, out_i
    out_s = jnp.where(jnp.isinf(out_d), -1, sorted_ops[3][idx])
    return out_d, out_i, out_s


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "k", "k_scan", "qtile", "chunk", "use_pallas", "precision",
        "interpret", "rerank", "n_visits",
    ),
)
def _run_sharded(
    queries,
    qidx,
    iq,
    ic,
    iv,
    ipair,
    wr,
    prow,
    pok,
    cdata,
    cids,
    cscales,
    *,
    mesh,
    k,
    k_scan,
    qtile,
    chunk,
    use_pallas,
    precision,
    interpret,
    rerank,
    n_visits,
):
    """One jitted dispatch for the whole sharded search (module-level so
    repeated searches at the same shapes hit the jit cache — a closure
    re-jitted per call would recompile every search)."""
    assert rerank or k_scan == k
    axis = mesh.axis_names
    Q = queries.shape[0]
    prec = (
        jax.lax.Precision.HIGHEST
        if precision == "highest"
        else jax.lax.Precision.DEFAULT
    )

    def local(queries, qidx, iq, ic, iv, ipair, wr, prow, pok, cdata,
              cids, cscales):
        # leading device axis of size 1 inside the shard
        qidx, iq, ic, iv = qidx[0], iq[0], ic[0], iv[0]
        ipair, wr, prow, pok = ipair[0], wr[0], prow[0], pok[0]
        cdata, cids, cscales = cdata[0], cids[0], cscales[0]
        wq = _gather_work_queries(queries, qidx)
        W = iq.shape[0]
        n_pairs = qidx.shape[0] // qtile

        if use_pallas:
            # same fused kernel as the single-chip TPU default, one
            # instance per shard over its local slabs
            from learnedmetricindex_tpu.ops.scan_kernel import (
                pallas_scan_pairs,
            )

            ids_flat = cids.reshape(-1)
            scales_kernel = jnp.where(
                ids_flat > 0, cscales.reshape(-1), 0.0
            )
            cand_d, cand_slot = pallas_scan_pairs(
                wq,
                ipair,
                ic,
                wr,
                cdata,
                scales_kernel,
                k=k_scan,
                qtile=qtile,
                chunk=chunk,
                n_pairs=n_pairs,
                compute="f32" if precision == "highest" else "bf16",
                interpret=interpret,
            )
            # merge and rerank on local SLOT indices; resolve object
            # ids only for the final (Q, k).  The merge is the dense
            # per-(query, visit) row gather + k-pass — each query has
            # at most V candidate rows on this shard (see
            # bucket_store._merge_pairs_dense); the 3-key sort merge
            # it replaces was the dominant non-kernel cost.
            R = (n_pairs + 1) * qtile
            out_d, out_s = _merge_pairs_dense(
                cand_d.reshape(R, k_scan),
                cand_slot.reshape(R, k_scan),
                prow,
                pok,
                k=k_scan,
                V=n_visits,
            )  # k_scan == k when rerank is off
            if rerank:
                # shard-local stage 2: every shortlisted vector lives in
                # THIS shard's slabs, so the exact f32 rerank needs no
                # cross-chip gather — the all-gather after this carries
                # already-exact candidates
                out_d, out_s = _rerank_exact_slots(
                    out_d, out_s, queries, cdata, cscales.reshape(-1),
                    k=k,
                )
            out_i = jnp.where(
                out_s >= 0, ids_flat[jnp.maximum(out_s, 0)], 0
            )
            return out_d[None], out_i[None]

        def body(_, inputs):
            q_start, chunk_idx, valid = inputs
            qv = jax.lax.dynamic_slice(wq, (q_start, 0), (qtile, wq.shape[1]))
            qi = jax.lax.dynamic_slice(qidx, (q_start,), (qtile,))
            slab = jax.lax.dynamic_slice(
                cdata, (chunk_idx * chunk, 0), (chunk, cdata.shape[1])
            ).astype(jnp.float32)  # int8 slabs dequantize per chunk
            ids = jax.lax.dynamic_slice_in_dim(cids, chunk_idx, 1, 0)[0]
            sc = jax.lax.dynamic_slice(cscales, (chunk_idx * chunk,), (chunk,))
            sims = jnp.dot(
                qv, slab.T,
                preferred_element_type=jnp.float32,
                precision=prec,
            ) * sc[None, :]
            dists = 1.0 - sims
            dists = jnp.where((ids == 0)[None, :], jnp.inf, dists)
            dists = jnp.where((qi < 0)[:, None], jnp.inf, dists)
            dists = jnp.where(valid, dists, jnp.inf)
            neg, pos = _item_topk(dists, k_scan, None)
            cid = jnp.take_along_axis(
                jnp.broadcast_to(ids[None, :], dists.shape), pos, axis=1
            )
            cid = jnp.where(jnp.isinf(neg), 0, cid)
            cslot = jnp.where(jnp.isinf(neg), -1, chunk_idx * chunk + pos)
            return None, (neg, cid, qi, cslot)

        _, (cd_o, ci_o, cq_o, cs_o) = jax.lax.scan(body, None, (iq, ic, iv))
        R = W * qtile
        if rerank:
            slots2d = cs_o.reshape(R, k_scan).astype(jnp.int32)
            out_d, _, out_s = _local_topk_sort(
                cd_o.reshape(R, k_scan), slots2d,
                cq_o.reshape(R), Q, k_scan, cand_s=slots2d,
            )
            out_d, out_s = _rerank_exact_slots(
                out_d, out_s, queries, cdata, cscales, k=k
            )
            out_i = jnp.where(
                out_s >= 0, cids.reshape(-1)[jnp.maximum(out_s, 0)], 0
            )
        else:
            out_d, out_i = _local_topk_sort(
                cd_o.reshape(R, k_scan), ci_o.reshape(R, k_scan),
                cq_o.reshape(R), Q, k,
            )
        return out_d[None], out_i[None]  # (1, Q, k) per shard

    specs_in = (
        P(),  # queries replicated
        P(axis, None),
        P(axis, None),
        P(axis, None),
        P(axis, None),
        P(axis, None),
        P(axis, None),
        P(axis, None),
        P(axis, None),
        P(axis, None, None),
        P(axis, None, None),
        P(axis, None),
    )
    out_d, out_i = _shard_map_fn(
        local, mesh,
        in_specs=specs_in,
        out_specs=(P(axis, None, None), P(axis, None, None)),
    )(queries, qidx, iq, ic, iv, ipair, wr, prow, pok, cdata, cids,
      cscales)
    # (D, Q, k) → global per-query top-k (XLA inserts the all-gather)
    all_d = jnp.transpose(out_d, (1, 0, 2)).reshape(Q, -1)
    all_i = jnp.transpose(out_i, (1, 0, 2)).reshape(Q, -1)
    neg, pos = jax.lax.top_k(-all_d, k)
    final_i = jnp.take_along_axis(all_i, pos, axis=1)
    final_d = -neg
    final_i = jnp.where(jnp.isinf(final_d), 0, final_i)
    # replicate the result so every process can read it directly
    repl = NamedSharding(mesh, P())
    final_d = jax.lax.with_sharding_constraint(final_d, repl)
    final_i = jax.lax.with_sharding_constraint(final_i, repl)
    return final_d, final_i


def sharded_search(
    sharded: ShardedStore,
    queries: np.ndarray,
    bucket_order: np.ndarray,
    k: int = 10,
    qtile: int = 16,
    precision: str = "highest",
    engine: str = "auto",
    rerank: bool = False,
    rerank_margin: int = 6,
) -> Tuple[np.ndarray, np.ndarray]:
    """Search the sharded store: per-device local scans + one
    ``all_gather``-merged top-k per query.

    ``bucket_order``: (Q, V) GLOBAL bucket ids (-1 padding).
    ``precision``: matmul precision of the local scans — "highest"
    matches the reference's all-f32 in-bucket scan; "default" runs one
    bf16 MXU pass (±2e-3 on unit dots).
    ``rerank=True`` is the two-stage fast path, same as single-chip:
    each shard scans at ``precision`` with a ``k + rerank_margin``
    shortlist and recomputes exact HIGHEST-precision distances for its
    own shortlist **before** the all-gather (every shortlisted vector
    lives in that shard's slabs, so stage 2 is local).  The merged
    ranking is exact over the union of the per-shard shortlists —
    per-chip cost now matches the single-chip fast path instead of the
    ~6× MXU passes of a full-precision bulk scan.
    ``engine``: "auto" picks the fused Pallas kernel
    (``ops/scan_kernel.py``) per shard on TPU when the store shape
    allows (``d % 128 == 0``, ``chunk % 1024 == 0``, ``qtile % 8 ==
    0``), else the XLA scan body; "pallas"/"xla" force one (Pallas runs
    in interpret mode off-TPU).
    """
    if precision not in ("highest", "default"):
        # notably "int8": the int8×int8 MXU bulk pass exists only in the
        # single-chip fused engine — running bf16 here while reporting
        # int8 would misstate the mode (bench labels, parity claims)
        raise ValueError(
            "sharded_search supports precision='highest' or 'default'; "
            f"got {precision!r}"
        )
    mesh = sharded.mesh
    n_dev = mesh.devices.size
    order = np.asarray(bucket_order)

    # --- per-device plans over local bucket ids ----------------------
    plans = []
    for dev in range(n_dev):
        local = np.where(
            (order >= 0) & (sharded.bucket_device[np.maximum(order, 0)] == dev),
            sharded.bucket_local[np.maximum(order, 0)],
            -1,
        )
        plans.append(build_scan_plan(sharded.sub_stores[dev], local, qtile=qtile))

    from learnedmetricindex_tpu.index.bucket_store import _sticky_quantize

    # Sticky-pad both data-dependent axes (cf. scan_buckets): raw
    # W_max/QP_max change with every navigation outcome, and unpadded
    # they would recompile the sharded program per query batch
    hint_key = (id(sharded.chunk_ids), qtile, order.shape[1])
    W_max = _sticky_quantize(
        hint_key, "W", max(max(len(p.item_chunk) for p in plans), 1), 8
    )
    QP_max = _sticky_quantize(
        hint_key, "QP", max(max(len(p.qidx) for p in plans), qtile), qtile
    )
    assert QP_max % qtile == 0
    n_pairs = QP_max // qtile
    from learnedmetricindex_tpu.ops.scan_kernel import pad_item_meta

    item_q_start = np.zeros((n_dev, W_max), np.int32)
    item_chunk = np.zeros((n_dev, W_max), np.int32)
    item_valid = np.zeros((n_dev, W_max), bool)
    # Pallas-engine item metadata: padding items carry the dummy-pair
    # word (no first/last flags — they must not reset an accumulator
    # slot or flush a real pair's output row)
    item_meta = np.full((n_dev, W_max), pad_item_meta(n_pairs), np.int32)
    w_real = np.zeros((n_dev, 1), np.int32)
    pair_written = np.zeros((n_dev, n_pairs + 1), bool)
    qidx = np.full((n_dev, QP_max), -1, np.int32)
    Q, V = order.shape
    # dense-merge map per device: (query, visit) → local candidate row
    # (invalid/non-local visits point at the never-written dummy tile)
    pair_rows = np.full((n_dev, Q * V), n_pairs * qtile, np.int32)
    pair_ok = np.zeros((n_dev, Q * V), bool)
    for dev, p in enumerate(plans):
        w = len(p.item_chunk)
        item_q_start[dev, :w] = p.item_q_start
        item_chunk[dev, :w] = p.item_chunk
        item_valid[dev, :w] = True
        item_meta[dev, :w] = p.item_meta
        w_real[dev, 0] = w
        if w:
            pair_written[dev, (p.item_q_start // qtile)] = True
        pair_written[dev, n_pairs] = False
        qidx[dev, : len(p.qidx)] = p.qidx
        ok = p.pair_slot >= 0
        rows = np.where(ok, p.pair_slot, n_pairs * qtile)
        pair_rows[dev] = rows
        pair_ok[dev] = ok & pair_written[
            dev, np.minimum(rows // qtile, n_pairs)
        ]

    d_dim = sharded.chunk_data.shape[-1]
    on_tpu = jax.default_backend() == "tpu"
    kernel_shapes_ok = (
        # chunk % 1024: the kernel's 1-D (chunk,) scales BlockSpec must
        # divide the f32 HBM tile T(1024)
        d_dim % 128 == 0 and sharded.chunk % 1024 == 0 and qtile % 8 == 0
    )
    if engine == "pallas" and on_tpu and not kernel_shapes_ok:
        # same friendly gate as scan_buckets — a raw Mosaic compile
        # error from the forced kernel is not actionable
        raise ValueError(
            "engine='pallas' forced but the sharded store shape is "
            "outside the kernel's coverage on TPU (needs d % 128 == 0, "
            f"chunk % 1024 == 0, qtile % 8 == 0; got d={d_dim}, "
            f"chunk={sharded.chunk}, qtile={qtile}) — use engine='auto' "
            "for fallback to the XLA scan body"
        )
    use_pallas = engine == "pallas" or (
        engine == "auto" and on_tpu and kernel_shapes_ok
    )

    # plan arrays are identical on every process (deterministic from the
    # replicated bucket metadata + bucket_order); put_global lets each
    # process contribute its local devices' rows — multi-host safe
    from learnedmetricindex_tpu.parallel import multiprocess as mp

    mesh_axes = mesh.axis_names
    dev2 = P(mesh_axes, None)
    if (
        isinstance(queries, jax.Array)
        and queries.is_fully_replicated
        and queries.sharding.device_set == set(mesh.devices.flat)
    ):
        # already replicated over this mesh (repeated-search case):
        # reuse in place — no host allgather / re-upload
        q_global = queries.astype(jnp.float32)
    else:
        q_global = mp.put_global(
            np.asarray(
                mp.to_host_replicated(queries)
                if isinstance(queries, jax.Array)
                else queries,
                dtype=np.float32,
            ),
            mesh,
            P(),
        )
    dists, ids = _run_sharded(
        q_global,
        mp.put_global(qidx, mesh, dev2),
        mp.put_global(item_q_start, mesh, dev2),
        mp.put_global(item_chunk, mesh, dev2),
        mp.put_global(item_valid, mesh, dev2),
        mp.put_global(item_meta, mesh, dev2),
        mp.put_global(w_real, mesh, dev2),
        mp.put_global(pair_rows, mesh, dev2),
        mp.put_global(pair_ok, mesh, dev2),
        sharded.chunk_data,
        sharded.chunk_ids,
        sharded.chunk_scales,
        mesh=mesh,
        k=k,
        k_scan=k + rerank_margin if rerank else k,
        qtile=qtile,
        chunk=sharded.chunk,
        use_pallas=use_pallas,
        precision=precision,
        interpret=use_pallas and not on_tpu,
        rerank=rerank,
        n_visits=V,
    )
    return np.asarray(dists), np.asarray(ids).astype(np.uint32)
