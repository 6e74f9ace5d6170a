"""Pallas fused scan kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

from learnedmetricindex_tpu.data import synthetic_blobs
from learnedmetricindex_tpu.index.bucket_store import (
    BucketStore,
    scan_buckets,
)
from learnedmetricindex_tpu.ops.knn import exact_knn, recall


def _store(n=900, d=16, n_buckets=6, chunk=64, seed=3):
    data, queries = synthetic_blobs(n, d, 40, seed=seed)
    rng = np.random.default_rng(seed)
    bucket_ids = rng.integers(0, n_buckets, size=n)
    store = BucketStore.build(data, bucket_ids, n_buckets, chunk=chunk)
    return data, queries, bucket_ids, store


def _compare(store, queries, order, k, **kw):
    pd, pi = scan_buckets(store, queries, order, k=k, engine="pallas", **kw)
    xd, xi = scan_buckets(store, queries, order, k=k, engine="xla", **kw)
    np.testing.assert_allclose(pd, xd, rtol=1e-4, atol=1e-5)
    # id mismatches only possible on exact distance ties
    mism = pi != xi
    if mism.any():
        np.testing.assert_allclose(pd[mism], xd[mism], rtol=1e-6, atol=1e-7)
    return pd, pi


def test_pallas_full_visit_equals_oracle():
    # multi-chunk buckets exercise the cross-chunk accumulator
    data, queries, bucket_ids, store = _store(n=900, chunk=64)
    order = np.tile(np.arange(6, dtype=np.int64), (len(queries), 1))
    pd, pi = _compare(store, queries, order, k=10, qtile=16)
    ref_d, ref_i = exact_knn(data, queries, k=10)
    np.testing.assert_allclose(pd, ref_d, rtol=1e-4, atol=1e-5)
    assert recall(pi, ref_i, 10) == 1.0


def test_pallas_partial_and_per_query_visits():
    data, queries, bucket_ids, store = _store()
    rng = np.random.default_rng(1)
    order = np.stack(
        [rng.choice(6, size=2, replace=False) for _ in range(len(queries))]
    ).astype(np.int64)
    _compare(store, queries, order, k=5, qtile=16)


def test_pallas_invalid_slots_and_empty_buckets():
    data, queries = synthetic_blobs(200, 8, 12, seed=2)
    bucket_ids = np.zeros(200, dtype=np.int64)  # buckets 1..3 empty
    store = BucketStore.build(data, bucket_ids, 4, chunk=32)
    order = np.full((12, 3), -1, dtype=np.int64)
    order[0] = [2, 0, 1]  # visits an empty bucket + the full one
    order[1] = [3, 3, -1]  # only empty buckets
    pd, pi = _compare(store, queries, order, k=4, qtile=8)
    assert np.isfinite(pd[0]).all()
    assert np.isinf(pd[1:]).all()
    assert (pi[1:] == 0).all()


def test_pallas_int8_scales_and_rerank():
    from learnedmetricindex_tpu.ops.quantize import quantize_rows

    data, queries, bucket_ids, _ = _store(n=600)
    q_data, row_scales = quantize_rows(data)
    store = BucketStore.build(
        np.asarray(q_data, np.float32), bucket_ids, 6, chunk=64, dtype="int8"
    )
    sc = np.zeros(store.chunk_ids.size, np.float32)
    ids = np.asarray(store.chunk_ids).reshape(-1)
    sc[ids > 0] = np.asarray(row_scales)[ids[ids > 0] - 1]
    import jax.numpy as jnp

    store = store._replace(chunk_scales=jnp.asarray(sc))
    order = np.tile(np.arange(6, dtype=np.int64), (len(queries), 1))
    pd, pi = _compare(store, queries, order, k=6, qtile=16)
    deq = np.asarray(q_data, np.float32) * np.asarray(row_scales)[:, None]
    ref_d, ref_i = exact_knn(deq, queries, k=6)
    np.testing.assert_allclose(pd, ref_d, rtol=1e-4, atol=1e-5)
    # rerank path on top of the pallas bulk scan
    rd, ri = scan_buckets(
        store, queries, order, k=6, engine="pallas", qtile=16,
        rerank=True, rerank_margin=3,
    )
    assert recall(ri, ref_i, 6) == 1.0


def test_pallas_usability_gate():
    from learnedmetricindex_tpu.index.bucket_store import (
        _pallas_engine_usable,
    )

    data, queries, bucket_ids, store = _store(d=16, chunk=64)
    # d=16 is not lane-aligned: the TPU gate rejects it; interpret mode
    # (off-TPU) accepts any packed shape
    assert not _pallas_engine_usable(store, 128, for_tpu=True)
    assert _pallas_engine_usable(store, 128, for_tpu=False)
    import jax.numpy as jnp

    vstore = BucketStore.build_virtual(
        jnp.asarray(data), bucket_ids, 6, chunk=64
    )
    assert not _pallas_engine_usable(vstore, 128)


def test_engine_pallas_forced_raises_outside_coverage():
    # engine="pallas" must surface an error instead of silently running
    # the XLA engine (virtual stores are outside kernel coverage)
    import jax.numpy as jnp

    data, queries = synthetic_blobs(200, 8, 10, seed=4)
    vstore = BucketStore.build_virtual(
        jnp.asarray(data), np.zeros(200, dtype=np.int64), 1
    )
    order = np.zeros((10, 1), dtype=np.int64)
    with pytest.raises(ValueError, match="pallas"):
        scan_buckets(vstore, queries, order, k=3, engine="pallas")


def test_pallas_large_k_matches_oracle():
    # k=24 spans 3 sublane groups of accumulator rows (kpad=24) and
    # exceeds some bucket sizes, exercising inf/0 fill
    data, queries, bucket_ids, store = _store(n=500, d=16, chunk=64)
    order = np.tile(np.arange(6, dtype=np.int64), (len(queries), 1))
    pd, pi = _compare(store, queries, order, k=24, qtile=16)
    ref_d, ref_i = exact_knn(data, queries, k=24)
    np.testing.assert_allclose(pd, ref_d, rtol=1e-4, atol=1e-5)
    assert recall(pi, ref_i, 24) == 1.0


def test_int8_precision_matches_dequantized_oracle():
    """precision='int8' (int8 x int8 MXU bulk + exact rerank) returns
    the exact top-k over the dequantized corpus at full visit."""
    import numpy as np

    from learnedmetricindex_tpu.index.bucket_store import (
        BucketStore,
        scan_buckets,
    )
    from learnedmetricindex_tpu.ops.knn import exact_knn, recall

    rng = np.random.default_rng(5)
    n, d, nq, nb = 3000, 32, 40, 6
    data = rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    queries = data[:nq] + 0.05 * rng.normal(size=(nq, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    bucket_ids = rng.integers(0, nb, size=n)

    store = BucketStore.build_packed_int8(data, bucket_ids, nb, chunk=128)
    deq = np.asarray(store.chunk_data, np.float32) * np.asarray(
        store.chunk_scales
    )[:, None]
    ids_flat = np.asarray(store.chunk_ids).reshape(-1)
    valid = ids_flat > 0
    corpus = np.zeros((n, d), np.float32)
    corpus[ids_flat[valid] - 1] = deq[valid]
    _, gt = exact_knn(corpus, queries, k=10)

    order = np.tile(np.arange(nb, dtype=np.int64), (nq, 1))
    dists, ids = scan_buckets(
        store, queries, order, k=10, qtile=8, precision="int8",
        rerank=True, rerank_margin=6, engine="pallas",
    )
    assert recall(ids, gt, 10) == 1.0
    # reranked distances are exact f32 over the dequantized store
    ref_d, _ = exact_knn(corpus, queries, k=10)
    np.testing.assert_allclose(dists, ref_d, rtol=1e-5, atol=1e-6)


def test_int8_precision_requires_int8_store():
    import numpy as np
    import pytest

    from learnedmetricindex_tpu.index.bucket_store import (
        BucketStore,
        scan_buckets,
    )

    rng = np.random.default_rng(6)
    data = rng.normal(size=(300, 16)).astype(np.float32)
    store = BucketStore.build(data, rng.integers(0, 3, 300), 3, chunk=64)
    order = np.tile(np.arange(3, dtype=np.int64), (5, 1))
    with pytest.raises(ValueError, match="int8"):
        scan_buckets(store, data[:5], order, k=5, precision="int8")


def test_gate_fixed_and_count_bit_identical(monkeypatch):
    """The count-gated selection loop (default) and the legacy
    fixed-trip loop return bit-identical candidates (the gate only
    bounds how many extraction sweeps run, never which elements can
    insert)."""
    import numpy as np

    from learnedmetricindex_tpu.data import synthetic_blobs
    from learnedmetricindex_tpu.index.bucket_store import (
        BucketStore,
        scan_buckets,
    )

    rng = np.random.default_rng(17)
    data, queries = synthetic_blobs(3000, 16, 25, n_clusters=9, seed=3)
    bucket_ids = rng.integers(0, 7, size=3000)
    store = BucketStore.build(data, bucket_ids, 7, chunk=128)
    order = np.stack(
        [rng.choice(7, size=3, replace=False) for _ in range(25)]
    ).astype(np.int64)
    order[4:7] = -1  # queries visiting nothing

    outs = {}
    for gate in ("fixed", "count"):
        monkeypatch.setenv("LMI_SCAN_GATE", gate)
        outs[gate] = scan_buckets(
            store, queries, order, k=9, qtile=8, precision="highest",
            rerank=False, engine="pallas",
        )
    np.testing.assert_array_equal(outs["fixed"][1], outs["count"][1])
    np.testing.assert_array_equal(outs["fixed"][0], outs["count"][0])
