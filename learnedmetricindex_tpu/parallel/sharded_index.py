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
    build_scan_plan,
)


class ShardedStore(NamedTuple):
    """Per-device packed sub-stores, stacked on a leading device axis."""

    chunk_data: jnp.ndarray  # (D, n_slots, d) sharded on axis 0
    chunk_ids: jnp.ndarray  # (D, n_chunks, chunk) sharded on axis 0
    chunk_scales: jnp.ndarray  # (D, n_slots) sharded on axis 0 (ones if unscaled)
    sub_stores: List[BucketStore]  # host-side metadata per device
    bucket_device: np.ndarray  # (n_buckets,) owning device
    bucket_local: np.ndarray  # (n_buckets,) bucket index within its device
    mesh: Mesh
    chunk: int


def shard_store(
    data: np.ndarray,
    bucket_ids: np.ndarray,
    n_buckets: int,
    mesh: Mesh,
    chunk: int = 256,
    row_scales=None,
) -> ShardedStore:
    """Partition buckets over mesh devices (round-robin by size for
    balance) and build one packed sub-store per device."""
    data = np.asarray(data)
    bucket_ids = np.asarray(bucket_ids)
    n_dev = mesh.devices.size
    counts = np.bincount(bucket_ids, minlength=n_buckets)

    # balanced assignment: biggest buckets first, to the lightest device
    order = np.argsort(-counts, kind="stable")
    load = np.zeros(n_dev, dtype=np.int64)
    bucket_device = np.zeros(n_buckets, dtype=np.int32)
    for b in order:
        dev = int(np.argmin(load))
        bucket_device[b] = dev
        load[dev] += counts[b]

    bucket_local = np.zeros(n_buckets, dtype=np.int32)
    sub_stores: List[BucketStore] = []
    datas, idss, scaless = [], [], []
    max_slots = 0
    for dev in range(n_dev):
        mine = np.nonzero(bucket_device == dev)[0]
        bucket_local[mine] = np.arange(len(mine))
        rows = np.nonzero(np.isin(bucket_ids, mine))[0]
        local_bucket = np.searchsorted(mine, bucket_ids[rows])
        sub = BucketStore.build(
            data[rows],
            local_bucket,
            n_buckets=max(len(mine), 1),
            chunk=chunk,
            dtype=jnp.float32 if row_scales is None else jnp.int8,
            object_ids=(rows + 1).astype(np.int32),
        )
        if row_scales is not None:
            # rebuild scales aligned with the sub-store layout
            slot_ids = np.asarray(sub.chunk_ids).reshape(-1)
            sc = np.zeros(len(slot_ids), np.float32)
            valid = slot_ids > 0
            sc[valid] = np.asarray(row_scales)[slot_ids[valid] - 1]
            sub = sub._replace(chunk_scales=jnp.asarray(sc))
            # re-quantize the slab values to int8 grid for byte parity
        sub_stores.append(sub)
        max_slots = max(max_slots, sub.chunk_data.shape[0])

    # pad sub-stores to a common slot count and stack
    d = data.shape[1]
    for sub in sub_stores:
        ns = sub.chunk_data.shape[0]
        pad = max_slots - ns
        cd = np.asarray(sub.chunk_data, dtype=np.float32)
        ids = np.asarray(sub.chunk_ids).reshape(-1)
        sc = (
            np.asarray(sub.chunk_scales)
            if sub.chunk_scales is not None
            else np.ones(ns, np.float32)
        )
        datas.append(np.pad(cd, ((0, pad), (0, 0))))
        idss.append(np.pad(ids, (0, pad)))
        scaless.append(np.pad(sc, (0, pad)))

    axis = mesh.axis_names
    chunk_count = max_slots // chunk
    stacked = ShardedStore(
        chunk_data=jax.device_put(
            np.stack(datas), NamedSharding(mesh, P(axis, None, None))
        ),
        chunk_ids=jax.device_put(
            np.stack([i.reshape(chunk_count, chunk) for i in idss]),
            NamedSharding(mesh, P(axis, None, None)),
        ),
        chunk_scales=jax.device_put(
            np.stack(scaless), NamedSharding(mesh, P(axis, None))
        ),
        sub_stores=sub_stores,
        bucket_device=bucket_device,
        bucket_local=bucket_local,
        mesh=mesh,
        chunk=chunk,
    )
    return stacked


def sharded_search(
    sharded: ShardedStore,
    queries: np.ndarray,
    bucket_order: np.ndarray,
    k: int = 10,
    qtile: int = 16,
) -> Tuple[np.ndarray, np.ndarray]:
    """Search the sharded store: per-device local scans + one
    ``all_gather``-merged top-k per query.

    ``bucket_order``: (Q, V) GLOBAL bucket ids (-1 padding).
    """
    mesh = sharded.mesh
    n_dev = mesh.devices.size
    Q = queries.shape[0]
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

    W_max = max(max(len(p.item_chunk) for p in plans), 1)
    QP_max = max(max(len(p.qidx) for p in plans), qtile)
    item_q_start = np.zeros((n_dev, W_max), np.int32)
    item_chunk = np.zeros((n_dev, W_max), np.int32)
    item_valid = np.zeros((n_dev, W_max), bool)
    qidx = np.full((n_dev, QP_max), -1, np.int32)
    for dev, p in enumerate(plans):
        w = len(p.item_chunk)
        item_q_start[dev, :w] = p.item_q_start
        item_chunk[dev, :w] = p.item_chunk
        item_valid[dev, :w] = True
        qidx[dev, : len(p.qidx)] = p.qidx

    axis = mesh.axis_names
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    @functools.partial(
        jax.jit,
        static_argnames=("k", "qtile", "chunk"),
    )
    def run(queries, qidx, iq, ic, iv, cdata, cids, cscales, *, k, qtile, chunk):
        def local(queries, qidx, iq, ic, iv, cdata, cids, cscales):
            # leading device axis of size 1 inside the shard
            qidx, iq, ic, iv = qidx[0], iq[0], ic[0], iv[0]
            cdata, cids, cscales = cdata[0], cids[0], cscales[0]
            wq = _gather_work_queries(queries, qidx)
            W = iq.shape[0]

            def body(_, inputs):
                q_start, chunk_idx, valid = inputs
                qv = jax.lax.dynamic_slice(wq, (q_start, 0), (qtile, wq.shape[1]))
                qi = jax.lax.dynamic_slice(qidx, (q_start,), (qtile,))
                slab = jax.lax.dynamic_slice(
                    cdata, (chunk_idx * chunk, 0), (chunk, cdata.shape[1])
                )
                ids = jax.lax.dynamic_slice_in_dim(cids, chunk_idx, 1, 0)[0]
                sc = jax.lax.dynamic_slice(cscales, (chunk_idx * chunk,), (chunk,))
                sims = jnp.dot(
                    qv, slab.T, preferred_element_type=jnp.float32
                ) * sc[None, :]
                dists = 1.0 - sims
                dists = jnp.where((ids == 0)[None, :], jnp.inf, dists)
                dists = jnp.where((qi < 0)[:, None], jnp.inf, dists)
                dists = jnp.where(valid, dists, jnp.inf)
                neg, pos = _item_topk(dists, k, None)
                cid = jnp.take_along_axis(
                    jnp.broadcast_to(ids[None, :], dists.shape), pos, axis=1
                )
                cid = jnp.where(jnp.isinf(neg), 0, cid)
                return None, (neg, cid, qi)

            _, (cd_o, ci_o, cq_o) = jax.lax.scan(body, None, (iq, ic, iv))
            # local per-query top-k via the sort merge
            R = W * qtile
            q_rep = jnp.repeat(
                jnp.where(cq_o.reshape(R) < 0, Q, cq_o.reshape(R)).astype(
                    jnp.int32
                ),
                k,
                total_repeat_length=R * k,
            )
            d_flat = cd_o.reshape(R * k)
            i_flat = ci_o.reshape(R * k)
            q_s, d_s, i_s = jax.lax.sort((q_rep, d_flat, i_flat), num_keys=2)
            starts = jnp.searchsorted(q_s, jnp.arange(Q, dtype=jnp.int32))
            idx = jnp.minimum(
                starts[:, None] + jnp.arange(k)[None, :], R * k - 1
            )
            out_d = jnp.where(
                q_s[idx] == jnp.arange(Q, dtype=jnp.int32)[:, None],
                d_s[idx],
                jnp.inf,
            )
            out_i = jnp.where(jnp.isinf(out_d), 0, i_s[idx])
            return out_d[None], out_i[None]  # (1, Q, k) per shard

        specs_in = (
            P(),  # queries replicated
            P(axis, None),
            P(axis, None),
            P(axis, None),
            P(axis, None),
            P(axis, None, None),
            P(axis, None, None),
            P(axis, None),
        )
        out_d, out_i = shard_map(
            local, mesh=mesh,
            in_specs=specs_in,
            out_specs=(P(axis, None, None), P(axis, None, None)),
        )(queries, qidx, iq, ic, iv, cdata, cids, cscales)
        # (D, Q, k) → global per-query top-k (XLA inserts the all-gather)
        all_d = jnp.transpose(out_d, (1, 0, 2)).reshape(Q, -1)
        all_i = jnp.transpose(out_i, (1, 0, 2)).reshape(Q, -1)
        neg, pos = jax.lax.top_k(-all_d, k)
        final_i = jnp.take_along_axis(all_i, pos, axis=1)
        final_d = -neg
        final_i = jnp.where(jnp.isinf(final_d), 0, final_i)
        return final_d, final_i

    mesh_axes = mesh.axis_names
    dev2 = NamedSharding(mesh, P(mesh_axes, None))
    dists, ids = run(
        jnp.asarray(np.asarray(queries, np.float32)),
        jax.device_put(qidx, dev2),
        jax.device_put(item_q_start, dev2),
        jax.device_put(item_chunk, dev2),
        jax.device_put(item_valid, dev2),
        sharded.chunk_data,
        sharded.chunk_ids,
        sharded.chunk_scales,
        k=k,
        qtile=qtile,
        chunk=sharded.chunk,
    )
    return np.asarray(dists), np.asarray(ids).astype(np.uint32)
