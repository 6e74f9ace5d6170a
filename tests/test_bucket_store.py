"""Chunked bucket store: layout invariants and scan vs oracle."""

import numpy as np

from learnedmetricindex_tpu.data import synthetic_blobs
from learnedmetricindex_tpu.index.bucket_store import (
    BucketStore,
    build_scan_plan,
    scan_buckets,
)
from learnedmetricindex_tpu.ops.knn import exact_knn, recall


def _make_store(n=600, d=16, n_buckets=7, chunk=64, seed=0):
    data, queries = synthetic_blobs(n, d, 50, seed=seed)
    rng = np.random.default_rng(seed)
    bucket_ids = rng.integers(0, n_buckets, size=n)
    store = BucketStore.build(data, bucket_ids, n_buckets, chunk=chunk)
    return data, queries, bucket_ids, store


def test_layout_invariants():
    data, _, bucket_ids, store = _make_store()
    counts = np.bincount(bucket_ids, minlength=7)
    np.testing.assert_array_equal(store.bucket_sizes, counts)
    # CSR chunk counts
    nchunks = store.bucket_chunk_start[1:] - store.bucket_chunk_start[:-1]
    np.testing.assert_array_equal(nchunks, -(-counts // 64))
    # every row appears exactly once with its original vector
    ids = np.asarray(store.chunk_ids).reshape(-1)
    flat = np.asarray(store.chunk_data).reshape(-1, 16)
    valid = ids > 0
    assert valid.sum() == len(data)
    np.testing.assert_allclose(flat[valid], data[ids[valid] - 1], rtol=1e-6)
    # rows in a bucket's chunk range have that bucket id
    for b in range(7):
        lo, hi = store.bucket_chunk_start[b], store.bucket_chunk_start[b + 1]
        chunk_ids = np.asarray(store.chunk_ids[lo:hi]).reshape(-1)
        members = chunk_ids[chunk_ids > 0] - 1
        np.testing.assert_array_equal(np.sort(members), np.nonzero(bucket_ids == b)[0])


def test_scan_full_visit_equals_exact_knn():
    # Visiting EVERY bucket must reproduce exact brute-force kNN.
    data, queries, _, store = _make_store()
    order = np.tile(np.arange(7, dtype=np.int64), (len(queries), 1))
    dists, ids = scan_buckets(store, queries, order, k=10)
    ref_d, ref_i = exact_knn(data, queries, k=10)
    np.testing.assert_allclose(dists, ref_d, rtol=1e-4, atol=1e-5)
    assert recall(ids, ref_i, 10) == 1.0


def test_scan_subset_of_buckets():
    data, queries, bucket_ids, store = _make_store()
    # Each query visits buckets {0, 3} only: results must equal exact kNN
    # restricted to members of those buckets.
    order = np.tile(np.array([0, 3], dtype=np.int64), (len(queries), 1))
    dists, ids = scan_buckets(store, queries, order, k=5)
    members = np.nonzero((bucket_ids == 0) | (bucket_ids == 3))[0]
    ref_d, ref_local = exact_knn(data[members], queries, k=5)
    ref_ids = members[ref_local.astype(np.int64) - 1] + 1
    np.testing.assert_allclose(dists, ref_d, rtol=1e-4, atol=1e-5)
    assert recall(ids, ref_ids, 5) == 1.0


def test_per_query_different_buckets():
    data, queries, bucket_ids, store = _make_store()
    rng = np.random.default_rng(42)
    # Each query gets its own random pair of distinct buckets.
    order = np.stack(
        [rng.choice(7, size=2, replace=False) for _ in range(len(queries))]
    ).astype(np.int64)
    dists, ids = scan_buckets(store, queries, order, k=3)
    for qi in range(0, len(queries), 7):
        members = np.nonzero(np.isin(bucket_ids, order[qi]))[0]
        ref_d, ref_local = exact_knn(data[members], queries[qi : qi + 1], k=3)
        ref_ids = members[ref_local.astype(np.int64)[0] - 1] + 1
        np.testing.assert_allclose(dists[qi], ref_d[0], rtol=1e-4, atol=1e-5)
        assert set(ids[qi]) == set(ref_ids)


def test_invalid_and_empty_visits():
    data, queries, bucket_ids, store = _make_store()
    # -1 slots are skipped; a query with no valid slot gets inf/0.
    order = np.full((len(queries), 3), -1, dtype=np.int64)
    order[0, 0] = 2
    dists, ids = scan_buckets(store, queries, order, k=4)
    assert np.isfinite(dists[0]).all()
    assert np.isinf(dists[1:]).all()
    assert (ids[1:] == 0).all()


def test_empty_bucket_zero_chunks():
    data, queries = synthetic_blobs(100, 8, 5, seed=1)
    bucket_ids = np.zeros(100, dtype=np.int64)  # everything in bucket 0 of 4
    store = BucketStore.build(data, bucket_ids, 4, chunk=32)
    assert store.bucket_chunk_start[-1] == store.bucket_chunk_start[1]
    order = np.tile(np.array([1, 0, 3], dtype=np.int64), (5, 1))
    dists, ids = scan_buckets(store, queries, order, k=3)
    ref_d, ref_i = exact_knn(data, queries, k=3)
    np.testing.assert_allclose(dists, ref_d, rtol=1e-4, atol=1e-5)


def test_virtual_store_matches_packed():
    import jax.numpy as jnp

    data, queries, bucket_ids, store = _make_store()
    vstore = BucketStore.build_virtual(jnp.asarray(data), bucket_ids, 7, chunk=64)
    assert vstore.chunk_data is None and vstore.data_ref is not None
    np.testing.assert_array_equal(
        np.asarray(vstore.chunk_ids), np.asarray(store.chunk_ids)
    )
    np.testing.assert_array_equal(
        vstore.bucket_chunk_start, store.bucket_chunk_start
    )
    rng = np.random.default_rng(3)
    order = np.stack(
        [rng.choice(7, size=3, replace=False) for _ in range(len(queries))]
    ).astype(np.int64)
    d_packed, i_packed = scan_buckets(store, queries, order, k=6)
    d_virtual, i_virtual = scan_buckets(vstore, queries, order, k=6)
    np.testing.assert_allclose(d_virtual, d_packed, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(i_virtual, i_packed)
    # virtual mode adds only the id grid
    assert vstore.nbytes() < store.nbytes() / 4


def test_non_power_of_2_chunk_and_items_per_step():
    # chunk=3000 at qtile=128 yields items_per_step=5 in scan_buckets'
    # auto-sizing; the work-list padding must stay divisible by 5
    # (regression: the octave rounding used a bare power-of-2 step).
    from learnedmetricindex_tpu.index.bucket_store import _quantize

    for size in (1, 5, 17, 130, 144, 1000):
        for mult in (1, 3, 5, 7, 12):
            qp = _quantize(size, mult)
            assert qp % mult == 0 and qp >= size

    data, queries, bucket_ids, store = _make_store(n=700, chunk=96)
    order = np.tile(np.arange(7, dtype=np.int64), (len(queries), 1))
    # force a non-power-of-2 items_per_step directly
    dists, ids = scan_buckets(store, queries, order, k=10, items_per_step=5)
    ref_d, ref_i = exact_knn(data, queries, k=10)
    np.testing.assert_allclose(dists, ref_d, rtol=1e-4, atol=1e-5)
    assert recall(ids, ref_i, 10) == 1.0


def test_precision_knob_with_rerank():
    # precision="highest" must be honored even when rerank is on
    data, queries, _, store = _make_store()
    order = np.tile(np.arange(7, dtype=np.int64), (len(queries), 1))
    d_hi, i_hi = scan_buckets(
        store, queries, order, k=5, precision="highest", rerank=True
    )
    ref_d, ref_i = exact_knn(data, queries, k=5)
    np.testing.assert_allclose(d_hi, ref_d, rtol=1e-5, atol=1e-6)
    assert recall(i_hi, ref_i, 5) == 1.0


def test_plan_items_cover_all_pairs():
    data, queries, bucket_ids, store = _make_store(n=200, chunk=32)
    order = np.tile(np.array([0, 1, 2], dtype=np.int64), (len(queries), 1))
    plan = build_scan_plan(store, order, qtile=16)
    assert plan.n_queries == len(queries)
    nchunks = store.bucket_chunk_start[1:] - store.bucket_chunk_start[:-1]
    # every (query, chunk) pair appears exactly once across the items
    seen = {}
    for q_start, c in zip(plan.item_q_start, plan.item_chunk):
        for slot in range(q_start, q_start + 16):
            q = plan.qidx[slot]
            if q >= 0:
                seen[(q, c)] = seen.get((q, c), 0) + 1
    chunk_of = np.repeat(np.arange(3), nchunks[:3])
    for q in range(len(queries)):
        for b in range(3):
            lo, hi = store.bucket_chunk_start[b], store.bucket_chunk_start[b + 1]
            for c in range(lo, hi):
                assert seen.pop((q, c)) == 1
    assert not seen


def test_plan_grouped_order_and_meta():
    """The work list's (bucket, tile-group, chunk, tile-in-group) order
    and the packed ``item_meta``: one slab residency serves a whole
    tile group (the kernel's HBM-amortization contract), each pair's
    chunks appear in ascending scan order, and first/last flags mark
    exactly the pair's first and last chunk."""
    from learnedmetricindex_tpu.ops.scan_kernel import (
        META_FIRST,
        META_LAST,
        META_PAIR_SHIFT,
        META_TILE_MASK,
        META_TILE_SHIFT,
        TILE_GROUP,
    )

    # bucket 0 gets visited by every query → many tiles (> TILE_GROUP
    # at qtile=8), exercising multiple groups incl. a partial one
    data, queries, bucket_ids, store = _make_store(n=900, n_buckets=5)
    Q = 100
    rng = np.random.default_rng(3)
    order = np.stack(
        [np.zeros(Q, np.int64), rng.integers(1, 5, size=Q)], axis=1
    )
    qtile = 8
    plan = build_scan_plan(store, order, qtile=qtile)

    pair = plan.item_meta >> META_PAIR_SHIFT
    t_in_g = (plan.item_meta >> META_TILE_SHIFT) & META_TILE_MASK
    first = (plan.item_meta & META_FIRST) != 0
    last = (plan.item_meta & META_LAST) != 0

    # pair id must agree with the tile's slot offset
    np.testing.assert_array_equal(pair, plan.item_q_start // qtile)
    assert (t_in_g < TILE_GROUP).all()

    nchunks = store.bucket_chunk_start[1:] - store.bucket_chunk_start[:-1]
    starts = store.bucket_chunk_start
    # recover each item's bucket from its chunk id (fresh build: chunks
    # are a contiguous CSR range per bucket)
    bucket_of_item = np.searchsorted(starts, plan.item_chunk, "right") - 1

    for p in np.unique(pair):
        sel = pair == p
        b = bucket_of_item[sel][0]
        assert (bucket_of_item[sel] == b).all()
        # the pair sees the bucket's chunks exactly once, in scan order
        np.testing.assert_array_equal(
            plan.item_chunk[sel], np.arange(starts[b], starts[b + 1])
        )
        # first/last mark exactly the first and last chunk
        np.testing.assert_array_equal(
            first[sel], plan.item_chunk[sel] == starts[b]
        )
        np.testing.assert_array_equal(
            last[sel], plan.item_chunk[sel] == starts[b + 1] - 1
        )
        # tile-in-group slot is constant for a pair
        assert len(np.unique(t_in_g[sel])) == 1

    # THE amortization property: the number of slab switches equals one
    # chunk-streaming pass per (bucket, tile-group) — not one per tile
    switches = 1 + int(np.sum(plan.item_chunk[1:] != plan.item_chunk[:-1]))
    ntiles = np.array([
        len(np.unique(pair[bucket_of_item == b]))
        for b in range(store.n_buckets)
    ])
    expected = int(
        sum(-(-t // TILE_GROUP) * c for t, c in zip(ntiles, nchunks) if t)
    )
    assert switches == expected, (switches, expected)
    # sanity: grouping actually amortizes here (bucket 0 has 13 tiles)
    assert expected < int((ntiles * nchunks).sum())


def test_pair_slot_map_and_dense_merge():
    """The plan's (query, visit) → slot map is exact, and the dense
    per-pair merge (``_merge_pairs_dense``, the Pallas engine's phase 2)
    agrees with the sort-based ``_merge_candidates`` on the same
    candidate set."""
    import jax.numpy as jnp

    from learnedmetricindex_tpu.index.bucket_store import (
        _merge_candidates,
        _merge_pairs_dense,
    )

    rng = np.random.default_rng(7)
    Q, V, k, qtile, nb = 37, 3, 5, 8, 6
    # visits include duplicates of none; bucket nb-1 is EMPTY
    order = np.full((Q, V), -1, np.int64)
    for q in range(Q):
        nv = int(rng.integers(1, V + 1))
        order[q, :nv] = rng.choice(nb, size=nv, replace=False)
    data = rng.normal(size=(300, 8)).astype(np.float32)
    bids = rng.integers(0, nb - 1, size=300)
    store = BucketStore.build(data, bids, nb, chunk=16)
    plan = build_scan_plan(store, order, qtile=qtile)

    # --- map invariants: each valid (q, v) slot carries that query ---
    ps = plan.pair_slot.reshape(Q, V)
    for q in range(Q):
        for v in range(V):
            if order[q, v] < 0:
                assert ps[q, v] == -1
            else:
                assert plan.qidx[ps[q, v]] == q
    # valid slots are all distinct
    valid = ps[ps >= 0]
    assert len(np.unique(valid)) == len(valid)

    # --- merge equivalence on random candidates --------------------
    QP = len(plan.qidx)
    n_pairs = QP // qtile
    R = (n_pairs + 1) * qtile
    cand_d = rng.random((R, k)).astype(np.float32)
    cand_s = rng.integers(0, 1000, size=(R, k)).astype(np.int32)
    item_pair = plan.item_q_start // qtile
    pair_written = np.zeros(n_pairs + 1, bool)
    pair_written[item_pair] = True
    pair_written[n_pairs] = False
    row_ok = np.repeat(pair_written, qtile)
    cand_q = np.where(
        row_ok, np.concatenate([plan.qidx, np.full(qtile, -1, np.int32)]),
        -1,
    )
    # unwritten rows carry +inf in the real kernel output
    cand_d = np.where(row_ok[:, None], cand_d, np.inf).astype(np.float32)
    ref_d, ref_s = _merge_candidates(
        jnp.asarray(cand_d), jnp.asarray(cand_s), jnp.asarray(cand_q),
        k=k, n_queries=Q,
    )
    ok = plan.pair_slot >= 0
    pair_rows = np.where(ok, plan.pair_slot, n_pairs * qtile)
    pair_ok = ok & pair_written[np.minimum(pair_rows // qtile, n_pairs)]
    got_d, got_s = _merge_pairs_dense(
        jnp.asarray(cand_d), jnp.asarray(cand_s),
        jnp.asarray(pair_rows.astype(np.int32)), jnp.asarray(pair_ok),
        k=k, V=V,
    )
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref_d))
    fin = np.isfinite(np.asarray(ref_d))
    np.testing.assert_array_equal(
        np.asarray(got_s)[fin], np.asarray(ref_s)[fin]
    )


def test_scan_randomized_configs_match_oracle():
    """Randomized shapes/chunks/k/visit patterns vs the exact oracle
    (seeded; both engines)."""
    import numpy as np
    from learnedmetricindex_tpu.data import synthetic_blobs
    from learnedmetricindex_tpu.index.bucket_store import (
        BucketStore,
        scan_buckets,
    )
    from learnedmetricindex_tpu.ops.knn import exact_knn, recall

    rng = np.random.default_rng(123)
    for trial in range(4):
        n = int(rng.integers(150, 900))
        d = int(rng.choice([8, 16, 24]))
        nb = int(rng.integers(2, 9))
        chunk = int(rng.choice([16, 48, 64]))
        k = int(rng.integers(1, 14))
        nq = int(rng.integers(5, 30))
        data, queries = synthetic_blobs(n, d, nq, seed=trial)
        bucket_ids = rng.integers(0, nb, size=n)
        store = BucketStore.build(data, bucket_ids, nb, chunk=chunk)
        order = np.tile(np.arange(nb, dtype=np.int64), (nq, 1))
        for engine in ("xla", "pallas"):
            dd, ii = scan_buckets(
                store, queries, order, k=k, engine=engine, qtile=8
            )
            ref_d, ref_i = exact_knn(data, queries, k=min(k, n))
            np.testing.assert_allclose(
                dd[:, : ref_d.shape[1]], ref_d, rtol=1e-4, atol=1e-5,
                err_msg=f"trial={trial} engine={engine}",
            )
            assert recall(ii[:, : ref_i.shape[1]], ref_i, ref_i.shape[1]) == 1.0


def test_int8_precision_downgrades_loudly_without_pallas(caplog):
    """precision='int8' exists only in the Pallas kernel.  With
    engine='auto' off-TPU the scan must WARN and run at bf16 (not
    silently misreport the mode); forcing the XLA engine must raise."""
    import logging

    import pytest

    from learnedmetricindex_tpu.index.bucket_store import (
        BucketStore,
        scan_buckets,
    )

    data, queries = synthetic_blobs(2000, 16, 8, n_clusters=4, seed=9)
    bids = np.random.default_rng(0).integers(0, 4, 2000).astype(np.int32)
    store = BucketStore.build_packed_int8(data, bids, n_buckets=4, chunk=256)
    order = np.tile(np.arange(4, dtype=np.int32), (8, 1))

    with caplog.at_level(
        logging.WARNING, logger="learnedmetricindex_tpu.index.bucket_store"
    ):
        d, i = scan_buckets(
            store, np.asarray(queries, np.float32), order, k=5,
            precision="int8", engine="auto",
        )
    assert any("DEFAULT (bf16)" in r.message for r in caplog.records)
    _, gt = exact_knn(data, queries, k=5)
    assert recall(i, gt, 5) > 0.9

    with pytest.raises(ValueError, match="requires the Pallas engine"):
        scan_buckets(
            store, np.asarray(queries, np.float32), order, k=5,
            precision="int8", engine="xla",
        )


def test_pallas_work_list_is_octave_quantized(monkeypatch):
    """The fused engine's static work-list length must be the
    ⅛-octave-padded W, not the raw data-dependent one — otherwise every
    new query batch (a new navigation outcome → new raw W) recompiles
    the whole fused program."""
    import numpy as np
    import learnedmetricindex_tpu.index.bucket_store as bs
    from learnedmetricindex_tpu.data import synthetic_blobs

    data, queries = synthetic_blobs(300, 8, 12, seed=0)
    rng = np.random.default_rng(0)
    bucket_ids = rng.integers(0, 5, size=300)
    store = bs.BucketStore.build(data, bucket_ids, 5, chunk=16)
    order = np.tile(np.arange(5, dtype=np.int64), (12, 1))

    seen = {}
    real = bs._scan_fused_pallas

    def spy(*args, **kw):
        seen["W"] = kw["W"]
        return real(*args, **kw)

    monkeypatch.setattr(bs, "_scan_fused_pallas", spy)
    bs.scan_buckets(store, queries, order, k=5, engine="pallas", qtile=8)
    assert seen["W"] % 8 == 0
    assert seen["W"] == bs._quantize(seen["W"], 8)


def test_fused_shapes_sticky_across_batches(monkeypatch):
    """A second batch whose raw work list is SMALLER must reuse the
    store's previously compiled (QP, W) — steady-state serving stays
    compile-free instead of re-jitting per navigation outcome."""
    import numpy as np
    import learnedmetricindex_tpu.index.bucket_store as bs
    from learnedmetricindex_tpu.data import synthetic_blobs

    data, queries = synthetic_blobs(600, 8, 16, seed=1)
    rng = np.random.default_rng(1)
    # uneven buckets so different visit sets give different raw W
    bucket_ids = np.clip(rng.integers(0, 8, size=600), 0, 5)
    store = bs.BucketStore.build(data, bucket_ids, 6, chunk=16)

    seen = []
    real = bs._scan_fused_pallas

    def spy(*args, **kw):
        seen.append((kw["n_pairs"], kw["W"]))
        return real(*args, **kw)

    monkeypatch.setattr(bs, "_scan_fused_pallas", spy)
    big = np.tile(np.arange(6, dtype=np.int64), (16, 1))[:, :3]
    small = np.tile(np.array([1, 2, 3], dtype=np.int64), (16, 1))
    d1, i1 = bs.scan_buckets(store, queries, big, k=5, engine="pallas",
                             qtile=8)
    d2, i2 = bs.scan_buckets(store, queries, small, k=5, engine="pallas",
                             qtile=8)
    assert seen[1] == seen[0], seen
    # padded shapes must not change results: compare vs the XLA engine
    d2x, i2x = bs.scan_buckets(store, queries, small, k=5, engine="xla",
                               qtile=8)
    np.testing.assert_allclose(d2, d2x, rtol=1e-4, atol=1e-5)
    fin = np.isfinite(d2x)
    np.testing.assert_array_equal(i2[fin], i2x[fin])


def test_sticky_hint_with_wrong_multiple_is_recomputed():
    """Hint keys are ``id()``-based; after a store is GC'd a new store
    can recycle the same id with a DIFFERENT chunk/qtile, so a stale
    entry may violate the new caller's divisibility contract.  The
    lookup must treat such an entry as absent (recompute) — not hand
    it back and crash the scan on the ``Wp % items_per_step`` assert."""
    import learnedmetricindex_tpu.index.bucket_store as bs

    key = ("unit-test-sticky", 8, 4)
    bs._SHAPE_HINTS.pop(key, None)
    try:
        # old store compiled Wp=200 under items_per_step=5
        assert bs._sticky_quantize(key, "Wp", 200, 5) % 5 == 0
        # recycled id(): same key, items_per_step now 32 — 200 would
        # trip the kernel's divisibility assert; expect a fresh value
        got = bs._sticky_quantize(key, "Wp", 40, 32)
        assert got % 32 == 0 and got >= 40
        # and the fresh value replaces the stale hint
        assert bs._SHAPE_HINTS[key]["Wp"] == got
    finally:
        bs._SHAPE_HINTS.pop(key, None)


def test_shape_hints_evict_lru_not_hot():
    """Eviction under pressure must drop least-recently-USED entries,
    not oldest-inserted: a long-lived serving store that keeps getting
    hit has the OLDEST insertion position, and insertion-order
    half-eviction would re-jit it while younger dead stores survive
    (advisor r3 / VERDICT weak #5).  The hot key must survive
    _SHAPE_HINTS_MAX younger stores as long as it keeps being used."""
    import learnedmetricindex_tpu.index.bucket_store as bs

    saved = dict(bs._SHAPE_HINTS)
    bs._SHAPE_HINTS.clear()
    try:
        hot = ("unit-test-hot", 8, 4)
        assert bs._sticky_quantize(hot, "Wp", 96, 8) >= 96
        for i in range(bs._SHAPE_HINTS_MAX + 64):
            bs._sticky_quantize(("unit-test-dead", i, 4), "Wp", 32, 8)
            # the serving store is hit between other stores' traffic
            if i % 7 == 0:
                bs._sticky_quantize(hot, "Wp", 64, 8)
        assert hot in bs._SHAPE_HINTS
        # and its sticky value survived (64-queries lookups reused the
        # 96 hint rather than re-inserting a smaller fresh one)
        assert bs._SHAPE_HINTS[hot]["Wp"] >= 96
    finally:
        bs._SHAPE_HINTS.clear()
        bs._SHAPE_HINTS.update(saved)


def test_xla_work_list_sticky_and_exact():
    """The XLA sort-merge engine's work-list padding (Wp) reuses the
    store's sticky hint too — its re-jit is the costliest of all — and
    the padded (masked) items must not change results."""
    import numpy as np
    import learnedmetricindex_tpu.index.bucket_store as bs
    from learnedmetricindex_tpu.data import synthetic_blobs

    data, queries = synthetic_blobs(600, 8, 16, seed=2)
    rng = np.random.default_rng(2)
    bucket_ids = np.clip(rng.integers(0, 8, size=600), 0, 5)
    store = bs.BucketStore.build(data, bucket_ids, 6, chunk=16)
    key = (id(store.chunk_ids), 8, 3)

    big = np.tile(np.arange(6, dtype=np.int64), (16, 1))[:, :3]
    small = np.tile(np.array([1, 2, 3], dtype=np.int64), (16, 1))

    bs._SHAPE_HINTS.pop(key, None)
    bs.scan_buckets(store, queries, big, k=5, engine="xla", qtile=8)
    hints_after_big = dict(bs._SHAPE_HINTS[key])
    d2, i2 = bs.scan_buckets(store, queries, small, k=5, engine="xla",
                             qtile=8)
    # the smaller batch must not have grown (or shrunk) any hint —
    # same compiled shapes, no re-jit
    assert bs._SHAPE_HINTS[key] == hints_after_big

    # clean-slate run (no sticky history → minimal padding): the
    # hint-padded results must be identical
    bs._SHAPE_HINTS.pop(key, None)
    d2f, i2f = bs.scan_buckets(store, queries, small, k=5, engine="xla",
                               qtile=8)
    np.testing.assert_allclose(d2, d2f, rtol=1e-5, atol=1e-6)
    fin = np.isfinite(d2f)
    np.testing.assert_array_equal(i2[fin], i2f[fin])
