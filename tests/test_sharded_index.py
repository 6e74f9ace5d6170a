"""Bucket-sharded multi-chip search vs the single-device engine."""

import numpy as np
import pytest

import jax

from learnedmetricindex_tpu.data import synthetic_blobs
from learnedmetricindex_tpu.index.bucket_store import BucketStore, scan_buckets
from learnedmetricindex_tpu.ops.knn import exact_knn, recall
from learnedmetricindex_tpu.parallel.mesh import create_mesh
from learnedmetricindex_tpu.parallel.sharded_index import (
    shard_store,
    sharded_search,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def setup():
    data, queries = synthetic_blobs(1200, 16, 50, n_clusters=10, seed=7)
    rng = np.random.default_rng(1)
    bucket_ids = rng.integers(0, 13, size=1200)
    mesh = create_mesh(8)
    sharded = shard_store(data, bucket_ids, 13, mesh, chunk=32)
    return data, queries, bucket_ids, mesh, sharded


def test_shard_assignment_covers_all_buckets(setup):
    data, queries, bucket_ids, mesh, sharded = setup
    assert sharded.bucket_device.shape == (13,)
    assert set(sharded.bucket_device) <= set(range(8))
    # every row present exactly once across sub-stores
    total = sum(int(s.bucket_sizes.sum()) for s in sharded.sub_stores)
    assert total == 1200
    all_ids = np.asarray(sharded.chunk_ids).reshape(-1)
    all_ids = all_ids[all_ids > 0]
    np.testing.assert_array_equal(np.sort(all_ids), np.arange(1, 1201))
    # slabs hold the original vectors at their slot ids
    flat = np.asarray(sharded.chunk_data).reshape(-1, data.shape[1])
    ids = np.asarray(sharded.chunk_ids).reshape(-1)
    np.testing.assert_allclose(flat[ids > 0], data[ids[ids > 0] - 1], rtol=1e-6)


def test_sharded_full_visit_equals_exact(setup):
    data, queries, bucket_ids, mesh, sharded = setup
    order = np.tile(np.arange(13, dtype=np.int64), (50, 1))
    dists, ids = sharded_search(sharded, queries, order, k=10)
    ref_d, ref_i = exact_knn(data, queries, k=10)
    np.testing.assert_allclose(dists, ref_d, rtol=1e-4, atol=1e-5)
    assert recall(ids, ref_i, 10) == 1.0


def test_sharded_partial_visit_matches_single_device(setup):
    data, queries, bucket_ids, mesh, sharded = setup
    rng = np.random.default_rng(5)
    order = np.stack(
        [rng.choice(13, size=4, replace=False) for _ in range(50)]
    ).astype(np.int64)
    dists, ids = sharded_search(sharded, queries, order, k=6)

    single = BucketStore.build(data, bucket_ids, 13, chunk=32)
    ref_d, ref_i = scan_buckets(single, queries, order, k=6)
    np.testing.assert_allclose(dists, ref_d, rtol=1e-4, atol=1e-5)
    # id mismatches only possible on exact distance ties
    mism = ids != ref_i
    if mism.any():
        np.testing.assert_allclose(
            dists[mism], ref_d[mism], rtol=1e-6, atol=1e-7
        )


def test_sharded_search_with_invalid_slots(setup):
    data, queries, bucket_ids, mesh, sharded = setup
    order = np.full((50, 3), -1, dtype=np.int64)
    order[0, 0] = 2
    dists, ids = sharded_search(sharded, queries, order, k=5)
    assert np.isfinite(dists[0]).all()
    assert np.isinf(dists[1:]).all()
    assert (ids[1:] == 0).all()

def test_sharded_store_int8_stays_int8():
    # The deployment claim (corpus_bytes / n_devices per chip) requires
    # int8 slabs to stay int8 through the stack (ADVICE r1).
    data, queries = synthetic_blobs(2048, 16, 40, n_clusters=10, seed=9)
    n_buckets, chunk, d = 16, 32, 16
    bucket_ids = np.arange(2048) % n_buckets  # balanced: 128 rows each
    mesh = create_mesh(8)
    from learnedmetricindex_tpu.ops.quantize import quantize_rows

    q_data, row_scales = quantize_rows(data)
    sharded = shard_store(
        np.asarray(q_data), bucket_ids, n_buckets, mesh, chunk=chunk,
        row_scales=np.asarray(row_scales),
    )
    assert sharded.chunk_data.dtype == np.int8
    single = BucketStore.build(
        np.asarray(q_data, np.float32), bucket_ids, n_buckets, chunk=chunk,
        dtype="int8",
    )
    # stacked slab bytes ≈ single packed bytes (≤ one pad chunk/device)
    pad_bound = 8 * chunk * d
    assert sharded.chunk_data.nbytes <= single.chunk_data.nbytes + pad_bound
    # per-shard bytes = total / n_devices
    shard = list(sharded.chunk_data.addressable_shards)[0]
    assert shard.data.nbytes == sharded.chunk_data.nbytes // 8

    # int8 sharded search matches the exact oracle on dequantized data
    deq = np.asarray(q_data, np.float32) * np.asarray(row_scales)[:, None]
    order = np.tile(np.arange(n_buckets, dtype=np.int64), (len(queries), 1))
    dists, ids = sharded_search(sharded, queries, order, k=10)
    ref_d, ref_i = exact_knn(deq, queries, k=10)
    np.testing.assert_allclose(dists, ref_d, rtol=1e-4, atol=1e-5)
    assert recall(ids, ref_i, 10) >= 0.999


def test_sharded_pallas_engine_matches_xla(setup):
    # the fused Pallas kernel per shard (interpret mode off-TPU) must
    # return the same results as the XLA scan body
    data, queries, bucket_ids, mesh, sharded = setup
    rng = np.random.default_rng(11)
    order = np.stack(
        [rng.choice(13, size=3, replace=False) for _ in range(50)]
    ).astype(np.int64)
    order[5:9] = -1  # some queries visit nothing
    pd, pi = sharded_search(sharded, queries, order, k=7, engine="pallas")
    xd, xi = sharded_search(sharded, queries, order, k=7, engine="xla")
    np.testing.assert_allclose(pd, xd, rtol=1e-4, atol=1e-5)
    mism = pi != xi
    if mism.any():  # id mismatches only possible on exact ties
        np.testing.assert_allclose(pd[mism], xd[mism], rtol=1e-6, atol=1e-7)
    assert np.isinf(pd[5:9]).all() and (pi[5:9] == 0).all()


def test_sharded_store_from_device_corpus(setup):
    # A device-resident corpus builds without a host round-trip and
    # searches identically to the host-built store.
    data, queries, bucket_ids, mesh, sharded_host = setup
    import jax.numpy as jnp

    dev_data = jnp.asarray(data)
    sharded = shard_store(dev_data, bucket_ids, 13, mesh, chunk=32)
    np.testing.assert_array_equal(
        np.asarray(sharded.chunk_ids), np.asarray(sharded_host.chunk_ids)
    )
    np.testing.assert_allclose(
        np.asarray(sharded.chunk_data),
        np.asarray(sharded_host.chunk_data),
        rtol=1e-6,
    )
    order = np.tile(np.arange(13, dtype=np.int64), (50, 1))
    d1, i1 = sharded_search(sharded, queries, order, k=8)
    d2, i2 = sharded_search(sharded_host, queries, order, k=8)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)
    np.testing.assert_array_equal(i1, i2)


def test_sharded_rerank_default_precision_matches_oracle(setup):
    """The two-stage sharded fast path (bf16 bulk + per-shard exact
    rerank) matches the exact oracle at full visit — per-chip cost of
    the single-chip fast path, exact final ranking (VERDICT r2 #3)."""
    data, queries, bucket_ids, mesh, sharded = setup
    order = np.tile(np.arange(13, dtype=np.int64), (50, 1))
    dists, ids = sharded_search(
        sharded, queries, order, k=10, precision="default", rerank=True,
        rerank_margin=6,
    )
    ref_d, ref_i = exact_knn(data, queries, k=10)
    assert recall(ids, ref_i, 10) == 1.0
    # reranked distances are exact f32, not bf16-noisy
    np.testing.assert_allclose(dists, ref_d, rtol=1e-5, atol=1e-6)

    # same through the public index.search knobs on both engines
    pd, pi = sharded_search(
        sharded, queries, order, k=10, precision="default", rerank=True,
        engine="pallas",
    )
    assert recall(pi, ref_i, 10) == 1.0
    np.testing.assert_allclose(pd, ref_d, rtol=1e-5, atol=1e-6)


def test_sharded_rerank_int8_matches_dequantized_oracle():
    data, queries = synthetic_blobs(2048, 16, 30, n_clusters=10, seed=9)
    n_buckets, chunk = 16, 32
    bucket_ids = np.arange(2048) % n_buckets
    mesh = create_mesh(8)
    from learnedmetricindex_tpu.ops.quantize import quantize_rows

    q_data, row_scales = quantize_rows(data)
    sharded = shard_store(
        np.asarray(q_data), bucket_ids, n_buckets, mesh, chunk=chunk,
        row_scales=np.asarray(row_scales),
    )
    deq = np.asarray(q_data, np.float32) * np.asarray(row_scales)[:, None]
    order = np.tile(np.arange(n_buckets, dtype=np.int64), (30, 1))
    dists, ids = sharded_search(
        sharded, queries, order, k=10, precision="default", rerank=True,
    )
    ref_d, ref_i = exact_knn(deq, queries, k=10)
    assert recall(ids, ref_i, 10) >= 0.999
    np.testing.assert_allclose(dists, ref_d, rtol=1e-5, atol=1e-6)


def test_sharded_search_rejects_int8_precision(setup):
    """The int8 MXU bulk pass exists only in the single-chip fused
    engine; the sharded path must refuse rather than silently run bf16
    while the caller believes the mode is int8."""
    data, queries, bucket_ids, mesh, sharded = setup
    order = np.tile(np.arange(4, dtype=np.int64), (50, 1))
    with pytest.raises(ValueError, match="precision"):
        sharded_search(sharded, queries, order, k=5, precision="int8")
