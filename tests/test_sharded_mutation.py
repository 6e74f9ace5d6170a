"""Mutation over a mesh-sharded store: the multi-chip counterpart of
``tests/test_mutation.py``.

The single-chip ``DynamicIndex`` stops at one device's HBM (the
measured 17.5M×768 ceiling); ``ShardedDynamicIndex`` carries the same
insert / delete / compact semantics over the 8-virtual-device mesh so
corpora past that ceiling stay mutable.  All exactness checks compare
against a brute-force oracle (or a Python dict model) on the mutated
corpus, like the single-chip suite does.  The reference index is
build-once (``/root/reference/search/li/LearnedIndexBuilder.py`` has
no update path) — this layer is TPU-framework serving infrastructure.
"""

import numpy as np
import pytest

import jax

import learnedmetricindex_tpu as lmi
from learnedmetricindex_tpu.data import synthetic_blobs
from learnedmetricindex_tpu.ops.knn import exact_knn, recall
from learnedmetricindex_tpu.parallel.mesh import create_mesh
from learnedmetricindex_tpu.parallel.sharded_mutation import (
    ShardedDynamicIndex,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def built():
    data, queries = synthetic_blobs(3000, 24, 60, n_clusters=16, seed=2023)
    extra, _ = synthetic_blobs(400, 24, 1, n_clusters=16, seed=77)
    cfg = lmi.BuildConfiguration(
        "kmeans", 40, "MLP-2", 0.01, [12], seed=2023, chunk_size=64
    )
    index, data_prediction, n_buckets, _, _ = lmi.LearnedIndexBuilder(
        data, cfg
    ).build()
    return data, queries, extra, index, data_prediction, n_buckets


@pytest.fixture()
def mesh():
    return create_mesh(8)


def _oracle_ids(corpus, queries, k=10):
    _, gt = exact_knn(corpus, queries, k=k)
    return gt


def test_insert_then_full_visit_is_exact(built, mesh):
    data, queries, extra, index, data_prediction, n_buckets = built
    dyn = ShardedDynamicIndex.from_built(
        index, data, data_prediction, mesh=mesh, chunk=64
    )
    assert dyn.n_rows == len(data)

    ids = dyn.insert(extra)
    np.testing.assert_array_equal(
        ids, np.arange(len(data) + 1, len(data) + len(extra) + 1)
    )
    assert dyn.n_rows == len(data) + len(extra)

    corpus = np.concatenate([data, extra])
    gt = _oracle_ids(corpus, queries)
    dists, nns, _ = dyn.search(queries, n_buckets=index.n_buckets, k=10)
    assert recall(np.asarray(nns), gt, 10) == 1.0
    ref_d, _ = exact_knn(corpus, queries, k=10)
    np.testing.assert_allclose(dists, ref_d, rtol=1e-4, atol=1e-5)

    # inserted vectors are their own nearest neighbor
    d2, n2, _ = dyn.search(extra[:16], n_buckets=index.n_buckets, k=1)
    np.testing.assert_array_equal(np.asarray(n2)[:, 0], ids[:16])
    np.testing.assert_allclose(np.asarray(d2)[:, 0], 0.0, atol=1e-4)


def test_delete_then_compact_is_bit_identical(built, mesh):
    data, queries, extra, index, data_prediction, _ = built
    dyn = ShardedDynamicIndex.from_built(
        index, data, data_prediction, mesh=mesh, chunk=64
    )
    ids = dyn.insert(extra)

    # delete every third inserted row plus a slice of the original data
    victims = np.concatenate([ids[::3], np.arange(1, 301)])
    n_del = dyn.delete(victims)
    assert n_del == len(ids[::3]) + 300
    assert dyn.delete(victims) == 0  # idempotent

    keep = np.ones(len(data) + len(extra), bool)
    keep[victims - 1] = False
    corpus = np.concatenate([data, extra])[keep]
    live_ids = np.nonzero(keep)[0] + 1
    gt = live_ids[_oracle_ids(corpus, queries) - 1]

    d1, n1, _ = dyn.search(queries, n_buckets=index.n_buckets, k=10)
    assert recall(np.asarray(n1), gt, 10) == 1.0
    # deleted ids never appear in results
    assert not np.isin(np.asarray(n1), victims).any()

    stats = dyn.compact()
    assert stats["chunks_after"] < stats["chunks_before"]
    d2, n2, _ = dyn.search(queries, n_buckets=index.n_buckets, k=10)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))

    # the compacted store keeps accepting inserts (re-inserted rows tie
    # at distance 0 with surviving old copies; the stable merge prefers
    # the earlier id, so accept either copy)
    more = dyn.insert(extra[:10])
    assert more.min() > ids.max()
    d3, n3, _ = dyn.search(extra[:10], n_buckets=index.n_buckets, k=1)
    assert np.isin(np.asarray(n3)[:, 0], np.concatenate([ids[:10], more])).all()
    np.testing.assert_allclose(np.asarray(d3)[:, 0], 0.0, atol=1e-4)


def test_overflow_grows_stacked_arrays(built, mesh):
    """Inserting far past the initial capacity must grow the shared
    chunk axis (every device) and stay exact."""
    data, queries, _, index, data_prediction, _ = built
    dyn = ShardedDynamicIndex.from_built(
        index, data, data_prediction, mesh=mesh, chunk=64
    )
    c0 = dyn.sharded.chunk_ids.shape[1]
    rng = np.random.default_rng(5)
    big = data[rng.integers(0, len(data), 4000)] + rng.normal(
        0, 0.01, (4000, data.shape[1])
    ).astype(np.float32)
    ids = dyn.insert(big)
    assert dyn.sharded.chunk_ids.shape[1] > c0
    corpus = np.concatenate([data, big])
    gt = _oracle_ids(corpus, queries[:20])
    _, nns, _ = dyn.search(queries[:20], n_buckets=index.n_buckets, k=10)
    assert recall(np.asarray(nns), gt, 10) == 1.0
    assert ids.max() == len(corpus)


def test_insert_validation_surface(built, mesh):
    data, _, extra, index, data_prediction, _ = built
    dyn = ShardedDynamicIndex.from_built(
        index, data, data_prediction, mesh=mesh, chunk=64
    )
    with pytest.raises(ValueError, match="1-based"):
        dyn.insert(extra[:2], object_ids=[0, 1])
    with pytest.raises(ValueError, match="length mismatch"):
        dyn.insert(extra[:2], object_ids=[10**6])
    with pytest.raises(ValueError, match="duplicate"):
        dyn.insert(extra[:2], object_ids=[10**6, 10**6])
    with pytest.raises(ValueError, match="already live"):
        dyn.insert(extra[:1], object_ids=[1])
    with pytest.raises(ValueError, match="id-space cap"):
        dyn.insert(extra[:1], object_ids=[1 << 29])
    assert len(dyn.insert(extra[:0])) == 0


def test_randomized_interleaving_matches_model(built, mesh):
    """Fuzz insert/delete/compact interleavings against a dict model,
    exactly like the single-chip fuzz (``test_mutation.py``) but over
    the 8-device mesh."""
    data, queries, _, index, data_prediction, _ = built
    rng = np.random.default_rng(17)
    dyn = ShardedDynamicIndex.from_built(
        index, data, data_prediction, mesh=mesh, chunk=64
    )
    model = {i + 1: data[i] for i in range(len(data))}

    def check():
        corpus = np.stack(list(model.values()))
        ids = np.fromiter(model.keys(), np.int64)
        gt = ids[_oracle_ids(corpus, queries[:16]) - 1]
        _, nns, _ = dyn.search(queries[:16], n_buckets=index.n_buckets, k=10)
        assert recall(np.asarray(nns), gt, 10) == 1.0
        assert dyn.n_rows == len(model)

    for step in range(6):
        op = rng.choice(["insert", "delete", "compact"])
        if op == "insert":
            m = int(rng.integers(1, 200))
            rows = data[rng.integers(0, len(data), m)] + rng.normal(
                0, 0.02, (m, data.shape[1])
            ).astype(np.float32)
            ids = dyn.insert(rows)
            model.update({int(i): r for i, r in zip(ids, rows)})
        elif op == "delete" and len(model) > 400:
            keys = np.fromiter(model.keys(), np.int64)
            victims = rng.choice(keys, int(rng.integers(1, 150)),
                                 replace=False)
            assert dyn.delete(victims) == len(set(victims.tolist()))
            for v in victims:
                del model[int(v)]
        else:
            dyn.compact()
        check()


def test_shard_packed_store_promotion(built, mesh):
    """Promoting a packed single-chip store to the mesh
    (``shard_packed_store``) preserves search results exactly — holes
    and overflow chunks of a MUTATED source travel verbatim — and the
    promoted store keeps mutating through ShardedDynamicIndex."""
    from learnedmetricindex_tpu.index.mutation import DynamicIndex
    from learnedmetricindex_tpu.parallel.sharded_index import (
        shard_packed_store,
    )

    data, queries, extra, index, data_prediction, _ = built

    # single-chip dynamic store with overflow chunks AND delete holes
    dyn1 = DynamicIndex.from_built(index, data, data_prediction, chunk=64)
    ids = dyn1.insert(extra)
    dyn1.delete(ids[::3])
    dyn1.delete(np.arange(1, 200))
    d1, n1, _ = dyn1.search(queries, n_buckets=index.n_buckets, k=10)

    # next_id travels explicitly: the store itself only knows LIVE ids,
    # so omitting it would let the allocator reuse deleted ids
    sharded = shard_packed_store(dyn1.store, mesh)
    dyn2 = ShardedDynamicIndex(index, sharded, next_id=dyn1.next_id)
    assert dyn2.n_rows == dyn1.n_rows
    d2, n2, _ = dyn2.search(queries, n_buckets=index.n_buckets, k=10)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)

    # the promoted store keeps mutating: fill marks survive promotion,
    # so appends land past live rows, never on them.  (Fresh rows come
    # from a new seed: shifted copies of existing rows would create
    # near-ties whose f32 order can differ from the oracle's.)
    fresh, _ = synthetic_blobs(50, 24, 1, n_clusters=16, seed=123)
    new_ids = dyn2.insert(fresh)
    model_corpus = np.concatenate([data, extra, fresh])
    keep = np.ones(len(model_corpus), bool)
    keep[np.concatenate([ids[::3], np.arange(1, 200)]) - 1] = False
    live_ids = np.nonzero(keep)[0] + 1
    gt = live_ids[_oracle_ids(model_corpus[keep], queries[:20]) - 1]
    _, n3, _ = dyn2.search(queries[:20], n_buckets=index.n_buckets, k=10)
    assert recall(np.asarray(n3), gt, 10) == 1.0
    assert new_ids.min() > ids.max()


def test_multiprocess_mesh_rejected(built, mesh, monkeypatch):
    data, _, _, index, data_prediction, _ = built
    from learnedmetricindex_tpu.parallel import multiprocess as mp

    dyn = ShardedDynamicIndex.from_built(
        index, data, data_prediction, mesh=mesh, chunk=64
    )
    monkeypatch.setattr(mp, "is_multiprocess", lambda m: True)
    with pytest.raises(ValueError, match="single-controller"):
        ShardedDynamicIndex(index, dyn.sharded)
