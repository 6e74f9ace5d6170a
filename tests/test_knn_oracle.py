"""Exact-kNN oracle vs a plain numpy reference implementation."""

import numpy as np
import pytest

from learnedmetricindex_tpu.data import normalize, synthetic_blobs
from learnedmetricindex_tpu.ops.knn import exact_knn, recall


def numpy_knn(data, queries, k, metric="inner_product"):
    if metric in ("inner_product", "cosine"):
        d = 1.0 - queries @ data.T
    else:
        d = (
            np.sum(queries**2, axis=1, keepdims=True)
            - 2.0 * queries @ data.T
            + np.sum(data**2, axis=1)[None, :]
        )
    ids = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, ids, axis=1), (ids + 1).astype(np.uint32)


@pytest.mark.parametrize("metric", ["inner_product", "l2"])
@pytest.mark.parametrize("n,tile", [(500, 128), (1000, 1000), (257, 64)])
def test_exact_knn_matches_numpy(metric, n, tile):
    data, queries = synthetic_blobs(n, 24, 37, seed=7)
    dists, nns = exact_knn(data, queries, k=10, metric=metric, tile_rows=tile)
    ref_d, ref_i = numpy_knn(data, queries, 10, metric)
    np.testing.assert_allclose(dists, ref_d, rtol=1e-4, atol=1e-5)
    # Ids may differ only where distances tie.
    mismatched = nns != ref_i
    if mismatched.any():
        np.testing.assert_allclose(
            dists[mismatched], ref_d[mismatched], rtol=1e-5, atol=1e-6
        )


def test_one_based_ids_and_self_recall():
    data, _ = synthetic_blobs(300, 16, 1, seed=3)
    dists, nns = exact_knn(data, data, k=1)
    # Every point's nearest neighbor is itself; ids are 1-based
    # (search/search.py:190-191).
    assert nns.min() >= 1 and nns.max() <= 300
    assert (nns[:, 0] == np.arange(1, 301)).mean() > 0.99


def test_k_larger_than_tile():
    data, queries = synthetic_blobs(100, 8, 5, seed=1)
    dists, nns = exact_knn(data, queries, k=20, tile_rows=16)
    ref_d, _ = numpy_knn(data, queries, 20)
    np.testing.assert_allclose(dists, ref_d, rtol=1e-4, atol=1e-5)


def test_recall_metric():
    gt = np.array([[1, 2, 3], [4, 5, 6]])
    assert recall(np.array([[1, 2, 9], [4, 5, 6]]), gt, k=3) == pytest.approx(5 / 6)
    assert recall(gt, gt, k=3) == 1.0


def test_normalize():
    x = np.array([[3.0, 4.0], [0.0, 0.0]], dtype=np.float32)
    out = normalize(x)
    np.testing.assert_allclose(out[0], [0.6, 0.8], rtol=1e-6)
    np.testing.assert_allclose(out[1], [0.0, 0.0])


def test_recall_vectorized_matches_loop_reference():
    # vs the obvious per-row np.intersect1d definition, incl. duplicates
    rng = np.random.default_rng(7)
    for trial in range(5):
        k = int(rng.integers(1, 12))
        q = int(rng.integers(1, 40))
        nns = rng.integers(1, 30, size=(q, k))
        gt = rng.integers(1, 30, size=(q, k))
        expect = sum(
            len(np.intersect1d(r, g)) for r, g in zip(nns, gt)
        ) / (q * k)
        assert abs(recall(nns, gt, k) - expect) < 1e-12
    assert recall(np.empty((0, 3)), np.empty((0, 3)), 3) == 0.0
