"""End-to-end: build → search → recall vs brute-force oracle."""

import numpy as np
import pytest

import learnedmetricindex_tpu as lmi
from learnedmetricindex_tpu.data import synthetic_blobs
from learnedmetricindex_tpu.ops.knn import exact_knn, recall


@pytest.fixture(scope="module")
def blobs():
    data, queries = synthetic_blobs(
        4000, 24, 200, n_clusters=20, seed=2023
    )
    _, gt = exact_knn(data, queries, k=10)
    return data, queries, gt


def test_single_level_build_and_search(blobs):
    data, queries, gt = blobs
    cfg = lmi.BuildConfiguration("kmeans", 40, "MLP-2", 0.01, [12], seed=2023,
                                 chunk_size=256)
    builder = lmi.LearnedIndexBuilder(data, cfg)
    index, data_prediction, n_buckets, build_t, cluster_t = builder.build()

    assert data_prediction.shape == (4000, 1)
    assert (data_prediction[:, 0] >= 0).all()
    assert n_buckets == 12  # coverage criterion: all 12 classes used
    assert len(index.bucket_paths) == 12
    assert build_t > 0 and cluster_t >= 0

    # visiting all buckets == exact search
    dists, anns, t = index.search(
        data, queries, data, queries, data_prediction, cfg.n_categories,
        n_buckets=12, k=10,
    )
    assert recall(anns, gt, 10) == 1.0
    ref_d, _ = exact_knn(data, queries, k=10)
    np.testing.assert_allclose(dists, ref_d, rtol=1e-4, atol=1e-5)

    # visiting a few buckets: high recall at a fraction of the work
    dists, anns, t = index.search(
        data, queries, data, queries, data_prediction, cfg.n_categories,
        n_buckets=4, k=10,
    )
    r = recall(anns, gt, 10)
    assert r > 0.85, f"recall@10 with 4/12 buckets = {r}"
    assert set(t) >= {"inference", "search", "search_within_buckets",
                      "seq_search", "sort"}
    assert anns.dtype == np.uint32


def test_two_level_build_and_search(blobs):
    data, queries, gt = blobs
    cfg = lmi.BuildConfiguration(
        "kmeans", 40, "MLP-2", 0.01, [4, 4], seed=2023, chunk_size=256
    )
    builder = lmi.LearnedIndexBuilder(data, cfg)
    index, data_prediction, n_buckets, _, _ = builder.build()

    assert data_prediction.shape == (4000, 2)
    assert (data_prediction >= 0).all()
    assert n_buckets == 16

    # all buckets => exact
    _, anns, _ = index.search(
        data, queries, data, queries, data_prediction, cfg.n_categories,
        n_buckets=16, k=10,
    )
    assert recall(anns, gt, 10) == 1.0

    # partial visit, both navigation policies
    for policy in ("best_first", "joint"):
        _, anns, _ = index.search(
            data, queries, data, queries, data_prediction, cfg.n_categories,
            n_buckets=6, k=10, policy=policy,
        )
        r = recall(anns, gt, 10)
        assert r > 0.8, f"{policy}: recall@10 with 6/16 buckets = {r}"


def test_dual_embedding_search(blobs):
    """Navigate in a low-d projection, scan in the original space
    (cf. search/search.py:192-215)."""
    data, queries, gt = blobs
    rng = np.random.default_rng(0)
    proj = rng.normal(size=(24, 8)).astype(np.float32)
    data_nav = (data @ proj).astype(np.float32)
    queries_nav = (queries @ proj).astype(np.float32)

    cfg = lmi.BuildConfiguration("kmeans", 40, "MLP-2", 0.01, [10], seed=1,
                                 chunk_size=256)
    index, pred, n_buckets, _, _ = lmi.LearnedIndexBuilder(data_nav, cfg).build()
    _, anns, _ = index.search(
        data_nav, queries_nav, data, queries, pred, cfg.n_categories,
        n_buckets=n_buckets, k=10,
    )
    # full visit in the search space == exact even though navigation was
    # built on the projected space
    assert recall(anns, gt, 10) == 1.0


def test_reproducible_build(blobs):
    data, queries, gt = blobs
    cfg = lmi.BuildConfiguration("kmeans", 30, "MLP-8", 0.01, [6], seed=7,
                                 chunk_size=256)
    _, p1, _, _, _ = lmi.LearnedIndexBuilder(data, cfg).build()
    _, p2, _, _, _ = lmi.LearnedIndexBuilder(data, cfg).build()
    np.testing.assert_array_equal(p1, p2)


def test_n_buckets_exceeding_total_clamped(blobs):
    data, queries, gt = blobs
    cfg = lmi.BuildConfiguration("kmeans", 30, "MLP-8", 0.01, [5], seed=3,
                                 chunk_size=256)
    index, pred, n_buckets, _, _ = lmi.LearnedIndexBuilder(data, cfg).build()
    _, anns, _ = index.search(
        data, queries, data, queries, pred, cfg.n_categories,
        n_buckets=50, k=10,
    )
    assert recall(anns, gt, 10) == 1.0


def test_two_level_device_resident_build(blobs):
    """2-level build with a device-resident corpus: per-node clustering
    gathers subsets on device, grouped training is virtual."""
    import jax.numpy as jnp

    data, queries, gt = blobs
    data_dev = jnp.asarray(data, dtype=jnp.bfloat16)
    cfg = lmi.BuildConfiguration(
        "kmeans", 40, "MLP-2", 0.01, [4, 4], seed=2023, chunk_size=256,
        dtype="bfloat16",
    )
    index, pred, n_buckets, _, _ = lmi.LearnedIndexBuilder(data_dev, cfg).build()
    assert n_buckets == 16
    # virtual store over the device corpus; full visit ~= exact (bf16
    # corpus values differ slightly from the f32 gt corpus)
    _, anns, _ = index.search(
        data_dev, queries, data_dev, queries, pred, cfg.n_categories,
        n_buckets=16, k=10,
    )
    assert recall(anns, gt, 10) > 0.98


def test_three_level_build_and_search(blobs):
    """3-level tree ([4,3,3] = 36 buckets): deep best-first navigation
    + per-node training at two internal levels, full-visit == oracle."""
    data, queries, gt = blobs
    cfg = lmi.BuildConfiguration(
        ["kmeans"] * 3, [30] * 3, ["MLP"] * 3, [0.01] * 3, [4, 3, 3],
        seed=2023, chunk_size=256,
    )
    index, pred, n_buckets, _, _ = lmi.LearnedIndexBuilder(data, cfg).build()
    assert pred.shape[1] == 3 and (pred >= 0).all()
    _, anns, _ = index.search(
        data, queries, data, queries, pred, cfg.n_categories,
        n_buckets=n_buckets, k=10,
    )
    assert recall(anns, gt, 10) == 1.0
    # partial visit through both policies agrees reasonably
    _, a_bf, _ = index.search(
        data, queries, data, queries, pred, cfg.n_categories,
        n_buckets=6, k=10, policy="best_first",
    )
    _, a_j, _ = index.search(
        data, queries, data, queries, pred, cfg.n_categories,
        n_buckets=6, k=10, policy="joint",
    )
    assert recall(a_bf, gt, 10) > 0.5 and recall(a_j, gt, 10) > 0.5
