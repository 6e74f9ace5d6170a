"""Dynamic mutation: insert / delete / compact on a live index.

The reference index is build-once; these tests cover the TPU
framework's serving-oriented mutation layer
(``index/mutation.py``): classification parity with the builder,
exactness of searches over mutated stores (vs a brute-force oracle on
the mutated corpus), chunk-overflow growth through the per-bucket
chunk list, and delete-in-place semantics on both f32 and int8 packed
stores.
"""

import numpy as np
import pytest

import learnedmetricindex_tpu as lmi
from learnedmetricindex_tpu.data import synthetic_blobs
from learnedmetricindex_tpu.index.bucket_store import BucketStore
from learnedmetricindex_tpu.index.mutation import (
    DynamicIndex,
    compact_store,
    delete_ids,
    ensure_mutable,
    insert_rows,
)
from learnedmetricindex_tpu.ops.knn import exact_knn, recall


@pytest.fixture(scope="module")
def built():
    data, queries = synthetic_blobs(
        3000, 24, 100, n_clusters=16, seed=2023
    )
    extra, _ = synthetic_blobs(400, 24, 1, n_clusters=16, seed=77)
    cfg = lmi.BuildConfiguration(
        "kmeans", 40, "MLP-2", 0.01, [3, 3], seed=2023, chunk_size=64
    )
    index, data_prediction, n_buckets, _, _ = lmi.LearnedIndexBuilder(
        data, cfg
    ).build()
    return data, queries, extra, index, data_prediction, n_buckets


def _oracle_ids(corpus, queries, k=10):
    _, gt = exact_knn(corpus, queries, k=k)
    return gt


def test_classify_matches_builder_partition(built):
    data, _, _, index, data_prediction, _ = built
    pred = index.classify(data)
    np.testing.assert_array_equal(pred, data_prediction)


def test_insert_then_full_visit_is_exact(built):
    data, queries, extra, index, data_prediction, n_buckets = built
    dyn = DynamicIndex.from_built(index, data, data_prediction)
    assert dyn.n_rows == len(data)

    ids = dyn.insert(extra)
    np.testing.assert_array_equal(
        ids, np.arange(len(data) + 1, len(data) + len(extra) + 1)
    )
    assert dyn.n_rows == len(data) + len(extra)

    corpus = np.concatenate([data, extra])
    gt = _oracle_ids(corpus, queries)
    dists, nns, _ = dyn.search(queries, n_buckets=index.n_buckets, k=10)
    assert recall(nns, gt, 10) == 1.0
    ref_d, _ = exact_knn(corpus, queries, k=10)
    np.testing.assert_allclose(dists, ref_d, rtol=1e-4, atol=1e-5)

    # inserted vectors are their own nearest neighbor
    d2, n2, _ = dyn.search(extra[:32], n_buckets=index.n_buckets, k=1)
    np.testing.assert_array_equal(n2[:, 0], ids[:32])
    np.testing.assert_allclose(d2[:, 0], 0.0, atol=1e-4)

    # partial visit still navigates sensibly
    _, n3, _ = dyn.search(queries, n_buckets=4, k=10)
    assert recall(n3, gt, 10) > 0.6


def test_overflow_allocates_chunks_and_grows(built):
    data, queries, extra, index, data_prediction, _ = built
    dyn = DynamicIndex.from_built(index, data, data_prediction, chunk=64)
    n_chunks_before = dyn.store.n_chunks
    # 400 rows over <=9 buckets at chunk=64 MUST overflow several
    # buckets' tail chunks (fresh stores have zero free chunks)
    dyn.insert(extra)
    st = dyn.store
    assert st.n_chunks > n_chunks_before  # device arrays grew
    ptr = st.bucket_chunk_ptr
    assert int(ptr[-1]) > n_chunks_before  # buckets own extra chunks
    # the chunk list is a permutation of assigned chunks, no dupes
    assert len(np.unique(st.bucket_chunk_list)) == len(st.bucket_chunk_list)
    # capacity invariant per bucket
    have = (ptr[1:] - ptr[:-1]) * st.chunk
    assert (st.bucket_fill <= have).all()

    corpus = np.concatenate([data, extra])
    gt = _oracle_ids(corpus, queries)
    _, nns, _ = dyn.search(queries, n_buckets=index.n_buckets, k=10)
    assert recall(nns, gt, 10) == 1.0


def test_delete_and_reinsert(built):
    data, queries, extra, index, data_prediction, _ = built
    dyn = DynamicIndex.from_built(index, data, data_prediction)
    ids = dyn.insert(extra)

    victims = np.concatenate([ids[:50], np.arange(1, 101)])  # new + old
    assert dyn.delete(victims) == 150
    assert dyn.n_rows == len(data) + len(extra) - 150
    # idempotent: re-deleting finds nothing
    assert dyn.delete(victims) == 0
    # out-of-range ids are skipped
    assert dyn.delete(np.array([0, 10**9])) == 0

    keep = np.ones(len(data) + len(extra), bool)
    keep[victims - 1] = False
    corpus = np.concatenate([data, extra])[keep]
    live_ids = np.nonzero(keep)[0] + 1
    gt_rows = _oracle_ids(corpus, queries)
    gt = live_ids[gt_rows - 1]
    _, nns, _ = dyn.search(queries, n_buckets=index.n_buckets, k=10)
    assert recall(nns, gt, 10) == 1.0
    assert not np.isin(nns, victims).any()

    # deleted ids may be re-inserted (slot map points back at them)
    dyn.insert(data[:10], object_ids=np.arange(1, 11))
    _, n2, _ = dyn.search(data[:5], n_buckets=index.n_buckets, k=1)
    np.testing.assert_array_equal(n2[:, 0], np.arange(1, 6))


def test_compact_preserves_results(built):
    data, queries, extra, index, data_prediction, _ = built
    dyn = DynamicIndex.from_built(index, data, data_prediction, chunk=64)
    ids = dyn.insert(extra)
    dyn.delete(ids[::2])
    _, before, _ = dyn.search(queries, n_buckets=index.n_buckets, k=10)
    frag_chunks = dyn.store.n_chunks
    dyn.compact()
    assert dyn.store.n_chunks <= frag_chunks
    _, after, _ = dyn.search(queries, n_buckets=index.n_buckets, k=10)
    np.testing.assert_array_equal(before, after)


def test_delete_all_then_compact_twice(built):
    """Compacting a fully-emptied store must leave the forced padding
    chunk UNASSIGNED (free pool), so a second compact doesn't crash and
    the next insert doesn't leak the chunk (advisor r3, medium)."""
    data, _, _, index, data_prediction, _ = built
    dyn = DynamicIndex.from_built(index, data, data_prediction, chunk=64)
    all_ids = np.arange(1, len(data) + 1)
    assert dyn.delete(all_ids) == len(data)
    assert dyn.n_rows == 0
    dyn.compact()
    st = dyn.store
    assert st.n_chunks == 1  # forced minimum for the engines
    assert len(st.bucket_chunk_list) == 0  # ...but owned by no bucket
    assert int(st.bucket_chunk_ptr[-1]) == 0
    dyn.compact()  # second compact on the empty store: no crash
    assert dyn.store.n_chunks == 1

    # the padding chunk is drawn from the free pool on the next insert
    # (the leak bug orphaned it: marked assigned but owned by nobody) —
    # every allocated chunk ends up in the list exactly once
    ids = dyn.insert(data[:8], object_ids=np.arange(1, 9))
    clist = np.sort(dyn.store.bucket_chunk_list)
    np.testing.assert_array_equal(
        clist, np.arange(dyn.store.n_chunks)
    )
    _, nns, _ = dyn.search(data[:8], n_buckets=index.n_buckets, k=1)
    np.testing.assert_array_equal(nns[:, 0], ids)


def test_compact_donate_frees_old_store(built):
    """donate=True produces identical results; the old store's buffers
    are deleted (so the caller must own the store exclusively)."""
    data, queries, extra, index, data_prediction, _ = built
    dyn = DynamicIndex.from_built(index, data, data_prediction, chunk=64)
    ids = dyn.insert(extra)
    dyn.delete(ids[::3])
    ref = DynamicIndex(index, compact_store(dyn.store))  # keeps input
    old = dyn.store
    dyn.compact(donate=True)
    _, a, _ = dyn.search(queries, n_buckets=index.n_buckets, k=10)
    _, b, _ = ref.search(queries, n_buckets=index.n_buckets, k=10)
    np.testing.assert_array_equal(a, b)
    # whether the buffers are actually freed early is backend- and
    # shape-dependent (XLA aliases only same-shaped in/out; compaction
    # usually shrinks), so only the semantics are asserted here — the
    # memory win comes from the fused gather+select either way
    del old


def test_int8_store_mutation(built):
    data, queries, extra, index, data_prediction, _ = built
    bucket_ids = index.bucket_ids_from_prediction(data_prediction)
    n_total = int(np.prod(index.config.n_categories))
    store = BucketStore.build_packed_int8(
        data, bucket_ids, n_buckets=n_total, chunk=64
    )
    dyn = DynamicIndex(index, store)
    ids = dyn.insert(extra)

    # inserted rows are exact self-hits after the int8 round-trip: the
    # rerank stage recomputes f32 distances from the dequantized store
    d2, n2, _ = dyn.search(extra[:16], n_buckets=index.n_buckets, k=1)
    np.testing.assert_array_equal(n2[:, 0], ids[:16])
    assert (np.abs(d2[:, 0]) < 5e-3).all()  # int8 round-trip noise

    # int8 quantization noise is ~4e-4 on unit dots: full-visit recall
    # against the exact oracle stays ~1 (allow a near-tie swap or two)
    corpus = np.concatenate([data, extra])
    gt = _oracle_ids(corpus, queries)
    _, nns, _ = dyn.search(queries, n_buckets=index.n_buckets, k=10)
    assert recall(nns, gt, 10) > 0.99

    assert dyn.delete(ids[:10]) == 10
    _, n3, _ = dyn.search(queries, n_buckets=index.n_buckets, k=10)
    assert not np.isin(n3, ids[:10]).any()

    dyn.compact()
    assert dyn.store.chunk_data.dtype == np.int8
    _, n4, _ = dyn.search(queries, n_buckets=index.n_buckets, k=10)
    assert recall(n4, gt, 10) > 0.99


def test_mutation_rejects_virtual_store(built):
    data, _, _, index, data_prediction, _ = built
    import jax.numpy as jnp

    store = index.get_bucket_store(jnp.asarray(data), data_prediction)
    assert store.chunk_data is None  # device data -> virtual store
    with pytest.raises(ValueError, match="packed"):
        ensure_mutable(store)
    with pytest.raises(ValueError, match="packed"):
        DynamicIndex(index, store)


def test_low_level_insert_validation(built):
    data, _, _, index, data_prediction, _ = built
    dyn = DynamicIndex.from_built(index, data, data_prediction)
    st = dyn.store
    v = data[:2]
    with pytest.raises(ValueError, match="1-based"):
        insert_rows(st, v, np.array([0, 1]), np.array([0, 5]))
    with pytest.raises(ValueError, match="mismatch"):
        insert_rows(st, v, np.array([0]), np.array([4001, 4002]))
    with pytest.raises(ValueError, match="out of range"):
        insert_rows(st, v, np.array([-1, 2]), np.array([4001, 4002]))
    # zero-row edits are no-ops
    assert insert_rows(st, data[:0], np.array([]), np.array([])) is st
    assert delete_ids(st, np.array([]))[0] is st
    # ids are stored int32 on device: an id past int32 range would
    # silently wrap negative (ghost row) — hard error instead
    with pytest.raises(ValueError, match="int32"):
        insert_rows(st, v, np.array([0, 1]), np.array([1, 2**31 + 5]))
    # the id→slot map is dense over the id space, so a giant sparse id
    # is an HBM allocation hazard (HTTP-reachable via serve.py) —
    # rejected at the configurable cap
    with pytest.raises(ValueError, match="LMI_MAX_OBJECT_ID"):
        insert_rows(st, v, np.array([0, 1]), np.array([1, 2_000_000_000]))
    # ...and the cap is a knob, not a wall
    import os

    os.environ["LMI_MAX_OBJECT_ID"] = str(2_000_000)
    try:
        st2 = insert_rows(st, v, np.array([0, 1]), np.array([1_999_999, 2_000_000]))
        assert st2.row_slot.shape[0] >= 2_000_000
    finally:
        del os.environ["LMI_MAX_OBJECT_ID"]


def test_insert_rejects_live_and_duplicate_ids(built):
    data, _, extra, index, data_prediction, _ = built
    dyn = DynamicIndex.from_built(index, data, data_prediction)
    # live collision: id 5 exists from the build
    with pytest.raises(ValueError, match="already live"):
        dyn.insert(extra[:1], object_ids=np.array([5]))
    # intra-batch duplicate
    with pytest.raises(ValueError, match="duplicate"):
        dyn.insert(extra[:2], object_ids=np.array([9001, 9001]))
    # the failed inserts changed nothing
    assert dyn.n_rows == len(data)

    # empty insert is a clean no-op returning an empty id array
    ids = dyn.insert(extra[:0])
    assert ids.shape == (0,)
    assert dyn.n_rows == len(data)


def test_delete_duplicates_count_once(built):
    data, _, extra, index, data_prediction, _ = built
    dyn = DynamicIndex.from_built(index, data, data_prediction)
    sizes_before = dyn.store.bucket_sizes.copy()
    assert dyn.delete(np.array([7, 7, 7, 7])) == 1
    assert dyn.n_rows == len(data) - 1
    assert (sizes_before - dyn.store.bucket_sizes).sum() == 1


def test_from_built_int8_quantizes(built):
    data, queries, _, index, data_prediction, _ = built
    import jax.numpy as jnp

    dyn = DynamicIndex.from_built(
        index, data, data_prediction, dtype=jnp.int8
    )
    assert dyn.store.chunk_data.dtype == np.int8
    assert dyn.store.chunk_scales is not None  # row-scaled, not a cast
    gt = _oracle_ids(data, queries)
    _, nns, _ = dyn.search(queries, n_buckets=index.n_buckets, k=10)
    assert recall(nns, gt, 10) > 0.99


def test_mutation_migrates_shape_hints(built):
    data, queries, extra, index, data_prediction, _ = built
    from learnedmetricindex_tpu.index import bucket_store as bs

    dyn = DynamicIndex.from_built(index, data, data_prediction)
    dyn.search(queries, n_buckets=index.n_buckets, k=10)
    old_id = id(dyn.store.chunk_ids)
    old_keys = {k for k in bs._SHAPE_HINTS if k[0] == old_id}
    assert old_keys  # the search registered hints for this store
    dyn.insert(extra[:5])
    new_id = id(dyn.store.chunk_ids)
    assert not any(k[0] == old_id for k in bs._SHAPE_HINTS)
    assert {k for k in bs._SHAPE_HINTS if k[0] == new_id}


def test_dynamic_checkpoint_roundtrip(tmp_path, built):
    """save/load of a mutated deployment: the corpus lives in the
    store (serve-time inserts exist nowhere else), so the checkpoint
    must reproduce searches bitwise and resume id allocation."""
    data, queries, extra, index, data_prediction, _ = built
    for dtype in (None, "int8", "bfloat16"):
        import jax.numpy as jnp

        dyn = DynamicIndex.from_built(
            index, data, data_prediction, chunk=64,
            dtype=jnp.dtype(dtype) if dtype else None,
        )
        ids = dyn.insert(extra)          # forces overflow chunks
        dyn.delete(ids[::3])             # and delete holes
        d1, n1, _ = dyn.search(queries, n_buckets=index.n_buckets, k=10)

        path = str(tmp_path / f"dyn_{dtype}.npz")
        dyn.save(path)
        back = DynamicIndex.load(path)
        assert back.next_id == dyn.next_id
        assert back.n_rows == dyn.n_rows
        assert back.store.chunk_data.dtype == dyn.store.chunk_data.dtype
        d2, n2, _ = back.search(queries, n_buckets=index.n_buckets, k=10)
        np.testing.assert_array_equal(n1, n2)
        np.testing.assert_array_equal(d1, d2)

        # resumed instance keeps mutating without id collisions
        more = back.insert(extra[:5])
        assert more.min() > ids.max()

    # plain checkpoints are rejected with a pointer to load_index
    from learnedmetricindex_tpu.index.serialization import (
        load_dynamic_index,
        save_index,
    )

    plain = str(tmp_path / "plain.npz")
    save_index(index, plain, data_prediction)
    with pytest.raises(ValueError, match="load_index"):
        load_dynamic_index(plain)


def test_checkpoint_paths_without_npz_suffix(tmp_path, built):
    """np.savez_compressed appends '.npz' to bare paths — save(path)
    and load(path) must agree on the EXACT name the caller used, for
    both plain and dynamic checkpoints (a serving operator's
    dyn.save('deploy.ckpt') must be loadable as 'deploy.ckpt')."""
    import os

    from learnedmetricindex_tpu.index.serialization import (
        load_index,
        save_index,
    )

    data, queries, _, index, data_prediction, _ = built

    plain = str(tmp_path / "plain.ckpt")
    save_index(index, plain, data_prediction)
    assert os.path.exists(plain) and not os.path.exists(plain + ".npz")
    back, pred = load_index(plain)
    np.testing.assert_array_equal(pred, data_prediction)

    dyn = DynamicIndex.from_built(index, data, data_prediction, chunk=64)
    d1, n1, _ = dyn.search(queries, n_buckets=index.n_buckets, k=10)
    ckpt = str(tmp_path / "deploy.ckpt")
    dyn.save(ckpt)
    assert os.path.exists(ckpt) and not os.path.exists(ckpt + ".npz")
    back = DynamicIndex.load(ckpt)
    d2, n2, _ = back.search(queries, n_buckets=index.n_buckets, k=10)
    np.testing.assert_array_equal(n1, n2)


def test_randomized_interleaving_matches_model(built):
    """Fuzz the mutation surface: a random interleaving of inserts,
    deletes, compacts, and searches must always agree with a plain
    Python dict model of (id -> vector) under full-visit search."""
    data, queries, _, index, data_prediction, _ = built
    rng = np.random.default_rng(17)
    dyn = DynamicIndex.from_built(index, data, data_prediction, chunk=64)
    model = {i + 1: data[i] for i in range(len(data))}

    def check():
        corpus = np.stack(list(model.values()))
        ids = np.fromiter(model.keys(), np.int64)
        gt_rows = _oracle_ids(corpus, queries[:20])
        gt = ids[gt_rows - 1]
        _, nns, _ = dyn.search(queries[:20], n_buckets=index.n_buckets,
                               k=10)
        assert recall(nns, gt, 10) == 1.0
        assert dyn.n_rows == len(model)

    for step in range(12):
        op = rng.choice(["insert", "delete", "compact"])
        if op == "insert":
            k = int(rng.integers(1, 80))
            vecs = rng.normal(size=(k, data.shape[1])).astype(np.float32)
            vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
            ids = dyn.insert(vecs)
            model.update(zip(ids.tolist(), vecs))
        elif op == "delete" and len(model) > 100:
            live = np.fromiter(model.keys(), np.int64)
            victims = rng.choice(live, size=int(rng.integers(1, 60)),
                                 replace=False)
            assert dyn.delete(victims) == len(victims)
            for v in victims:
                del model[int(v)]
        else:
            dyn.compact()
        if step % 3 == 2:
            check()
    check()
