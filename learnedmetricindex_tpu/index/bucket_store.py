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
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


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
    chunk_data: Optional[jnp.ndarray] = None  # (n_chunks, chunk, d) packed
    data_ref: Optional[jnp.ndarray] = None  # (n, d) virtual

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

        return cls(
            chunk_data=jnp.asarray(flat.reshape(total_chunks, chunk, d), dtype=dtype),
            chunk_ids=jnp.asarray(ids.reshape(total_chunks, chunk)),
            bucket_chunk_start=starts,
            bucket_sizes=counts.astype(np.int32),
            chunk=chunk,
            n_buckets=n_buckets,
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


def build_scan_plan(
    store: BucketStore, bucket_order: np.ndarray, qtile: int = 128
) -> ScanPlan:
    """Expand per-query visit lists into the flat uniform work list.

    ``bucket_order``: (Q, V) int bucket indices, -1 for unused slots.
    """
    Q, V = bucket_order.shape
    starts = store.bucket_chunk_start
    nchunks_all = (starts[1:] - starts[:-1]).astype(np.int64)

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

    # --- work items: for bucket b, for qtile t, for chunk c ----------
    ntiles = padded_counts // qtile  # per bucket
    nchunks = nchunks_all
    items_per_bucket = ntiles * nchunks
    W = int(items_per_bucket.sum())
    item_q_start = np.empty(W, dtype=np.int32)
    item_chunk = np.empty(W, dtype=np.int32)
    item_base = np.concatenate([[0], np.cumsum(items_per_bucket)[:-1]])

    active = np.nonzero(items_per_bucket)[0]
    # vectorized fill: item index within bucket = t * nchunks[b] + c
    rep_b = np.repeat(active, items_per_bucket[active])
    within = np.arange(W, dtype=np.int64) - item_base[rep_b]
    t_of_item = within // nchunks[rep_b]
    c_of_item = within % nchunks[rep_b]
    item_q_start[:] = (pad_starts[rep_b] + t_of_item * qtile).astype(np.int32)
    item_chunk[:] = (starts[rep_b] + c_of_item).astype(np.int32)

    return ScanPlan(
        qidx=qidx,
        item_q_start=item_q_start,
        item_chunk=item_chunk,
        n_queries=Q,
        qtile=qtile,
    )


def _item_topk(dists, k, approx_recall):
    """Per-row smallest-k of an item's distance block.

    ``lax.top_k`` lowers to a (slow) sort on TPU; ``lax.approx_max_k``
    is the hardware PartialReduce op (TPU-KNN, arXiv:2206.14286) and
    runs at memory speed.  ``approx_recall=None`` keeps the exact path.
    """
    if approx_recall is None:
        neg, pos = jax.lax.top_k(-dists, k)
    else:
        neg, pos = jax.lax.approx_max_k(
            -dists, k, recall_target=float(approx_recall)
        )
    return -neg, pos


@functools.partial(
    jax.jit,
    static_argnames=("k", "qtile", "items_per_step", "precision",
                     "approx_recall"),
)
def _scan_items(
    queries: jnp.ndarray,  # (Q, d)
    qidx: jnp.ndarray,  # (QP,)
    item_q_start: jnp.ndarray,  # (Wp,) padded to items_per_step multiple
    item_chunk: jnp.ndarray,  # (Wp,)
    item_valid: jnp.ndarray,  # (Wp,) bool
    chunk_data: jnp.ndarray,
    chunk_ids: jnp.ndarray,
    *,
    k: int,
    qtile: int,
    items_per_step: int,
    precision: str,
    approx_recall=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Phase 1 (packed): per-item distances + top-k candidates.

    Chunk slabs are read with per-item ``dynamic_slice`` (contiguous
    DMA); an index-array gather here lowers ~200× slower on TPU.
    """
    Wp = item_q_start.shape[0]
    S = items_per_step
    steps = Wp // S
    prec = (
        jax.lax.Precision.HIGHEST if precision == "highest" else jax.lax.Precision.DEFAULT
    )

    def body(_, inputs):
        q_start, chunk_idx, valid = inputs
        offs = q_start[:, None] + jnp.arange(qtile)[None, :]
        qi = qidx[offs]  # (S, qtile)
        qv = queries[jnp.maximum(qi, 0)]  # (S, qtile, d)
        cd = jnp.stack(
            [
                jax.lax.dynamic_slice_in_dim(chunk_data, chunk_idx[j], 1, 0)[0]
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
    queries: jnp.ndarray,  # (Q, d)
    qidx: jnp.ndarray,  # (QP,)
    item_q_start: jnp.ndarray,  # (Wp,)
    item_chunk: jnp.ndarray,  # (Wp,)
    item_valid: jnp.ndarray,  # (Wp,) bool
    data_ref: jnp.ndarray,  # (n, d) unmoved dataset
    chunk_ids: jnp.ndarray,  # (n_chunks, chunk)
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

    def body(_, inputs):
        q_start, chunk_idx, valid = inputs
        offs = q_start[:, None] + jnp.arange(qtile)[None, :]
        qi = qidx[offs]  # (S, qtile)
        qv = queries[jnp.maximum(qi, 0)]  # (S, qtile, d)
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


def scan_buckets(
    store: BucketStore,
    queries: np.ndarray,
    bucket_order: np.ndarray,
    k: int = 10,
    qtile: int = 128,
    items_per_step: int = 8,
    precision: str = "highest",
    approx_recall=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact kNN over each query's visit set.

    Returns ``(dists (Q, k) float32, ids (Q, k) uint32 1-based)``.
    Functional equivalent of the reference's phase B
    (``LearnedIndex.py:107-146``) in two jitted device passes.
    """
    if not isinstance(queries, jax.Array):
        queries = np.asarray(queries, dtype=np.float32)
    plan = build_scan_plan(store, np.asarray(bucket_order), qtile=qtile)

    def _quantize(size: int, multiple: int) -> int:
        """Round up to a 1/8-octave boundary (≤12.5% padding) so the
        number of distinct compiled shapes stays logarithmic — the
        sort-based merge in particular compiles slowly per shape."""
        size = max(size, multiple)
        step = max(1 << max(size.bit_length() - 4, 0), multiple)
        return -(-size // step) * step

    W = len(plan.item_chunk)
    Wp = _quantize(max(W, 1), items_per_step)
    item_q_start = np.zeros(Wp, dtype=np.int32)
    item_chunk = np.zeros(Wp, dtype=np.int32)
    item_valid = np.zeros(Wp, dtype=bool)
    item_q_start[:W] = plan.item_q_start
    item_chunk[:W] = plan.item_chunk
    item_valid[:W] = True

    qidx = plan.qidx
    QP = _quantize(max(len(qidx), 1), qtile)
    if QP != len(qidx):
        qidx = np.concatenate(
            [qidx, np.full(QP - len(qidx), -1, dtype=np.int32)]
        )

    common = dict(
        k=k, qtile=qtile, items_per_step=items_per_step, precision=precision,
        approx_recall=approx_recall,
    )
    if store.chunk_data is not None:
        cand_d, cand_i, cand_q = _scan_items(
            jnp.asarray(queries),
            jnp.asarray(qidx),
            jnp.asarray(item_q_start),
            jnp.asarray(item_chunk),
            jnp.asarray(item_valid),
            store.chunk_data,
            store.chunk_ids,
            **common,
        )
    else:
        cand_d, cand_i, cand_q = _scan_items_virtual(
            jnp.asarray(queries),
            jnp.asarray(qidx),
            jnp.asarray(item_q_start),
            jnp.asarray(item_chunk),
            jnp.asarray(item_valid),
            store.data_ref,
            store.chunk_ids,
            **common,
        )
    dists, ids = _merge_candidates(
        cand_d, cand_i, cand_q, k=k, n_queries=plan.n_queries
    )
    return np.asarray(dists), np.asarray(ids).astype(np.uint32)
