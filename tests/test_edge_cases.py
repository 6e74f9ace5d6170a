"""Degenerate-input probes: tiny corpora, k > n, single-point nodes
(the reference's guards at ``LearnedIndexBuilder.py:290-296`` and the
``dist=inf, id=0`` no-candidate convention, ``LearnedIndex.py:340-341``).
"""

import numpy as np

import learnedmetricindex_tpu as lmi
from learnedmetricindex_tpu.ops import exact_knn, recall


def _build(n, d=8, cats=(3,), seed=0, epochs=15):
    rng = np.random.default_rng(seed)
    data = rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    cfg = lmi.BuildConfiguration("kmeans", epochs, "MLP-8", 0.05,
                                 list(cats), seed=3)
    index, pred, nb, _, _ = lmi.LearnedIndexBuilder(data, cfg).build()
    return data, index, pred, nb


def test_k_exceeds_corpus_size():
    data, index, pred, nb = _build(6)
    queries = data[:2]
    dists, ids, _ = index.search(
        data, queries, data, queries, pred, None, n_buckets=nb, k=10,
        precision="highest", rerank=False,
    )
    assert dists.shape == (2, 10) and ids.shape == (2, 10)
    # exactly n real candidates per query; the rest pad as (inf, 0)
    assert ((ids > 0).sum(axis=1) == 6).all()
    pad = ids == 0
    assert np.isinf(dists[pad]).all()
    # the real prefix matches the oracle
    _, gt = exact_knn(data, queries, k=6)
    np.testing.assert_array_equal(ids[:, :6], gt)


def test_k_exceeds_corpus_with_rerank_fast_path():
    data, index, pred, nb = _build(6)
    queries = data[:2]
    dists, ids, _ = index.search(
        data, queries, data, queries, pred, None, n_buckets=nb, k=10,
    )
    assert ((ids > 0).sum(axis=1) == 6).all()
    assert np.isinf(dists[ids == 0]).all()


def test_two_point_corpus_builds_and_searches():
    # n=2 at the k-means guard boundary (<2 points → single label
    # applies per NODE; the root sees both points)
    data, index, pred, nb = _build(2, cats=(2,), epochs=30)
    assert nb >= 1
    dists, ids, _ = index.search(
        data, data, data, data, pred, None, n_buckets=nb, k=2,
        precision="highest", rerank=False,
    )
    _, gt = exact_knn(data, data, k=2)
    assert recall(ids, gt, 2) == 1.0


def test_tiny_two_level_tree():
    # deeper levels hit the n_rows < n_clusters guard (n//5 floor 2)
    data, index, pred, nb = _build(40, cats=(3, 3), epochs=30)
    dists, ids, _ = index.search(
        data, data[:5], data, data[:5], pred, None, n_buckets=nb, k=5,
        precision="highest", rerank=False,
    )
    _, gt = exact_knn(data, data[:5], k=5)
    assert recall(ids, gt, 5) == 1.0


def test_zero_query_batch():
    """An empty query batch is a valid no-op: (0, k) results, no
    navigation/scan dispatch (the gathers assume >= 1 query)."""
    data, index, pred, nb = _build(16)
    q = np.zeros((0, data.shape[1]), np.float32)
    dists, ids, times = index.search(
        data, q, data, q, pred, None, n_buckets=nb, k=5
    )
    assert dists.shape == (0, 5) and ids.shape == (0, 5)
    assert ids.dtype == np.uint32
    assert set(times) == {
        "inference", "search", "search_within_buckets", "seq_search",
        "sort",
    }


def test_unknown_model_type_rejected_at_config():
    """Unknown model names fail at BuildConfiguration time with the
    supported list, not mid-build (the reference defers to a torch
    KeyError in ``Model.__init__``, ``model.py:89-99``)."""
    import pytest

    with pytest.raises(AssertionError, match="Unknown model type"):
        lmi.BuildConfiguration("kmeans", 5, "MLP-99", 0.01, [4])
    with pytest.raises(AssertionError, match="Unknown model type"):
        lmi.BuildConfiguration(
            ["kmeans"], [5], ["MLP", "nope"], [0.01], [2, 2]
        )


def test_variable_query_batch_sizes_sticky():
    """Serving batches of varying size: the first batch fixes the
    compiled query shape; smaller later batches pad up to it (repeating
    row 0, results sliced) so they reuse the compiled programs, and
    results match the fixed-size call exactly."""
    data, index, pred, nb = _build(300, cats=(4,))
    rng = np.random.default_rng(3)
    qs = rng.normal(size=(64, data.shape[1])).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)

    d_full, i_full, _ = index.search(
        data, qs, data, qs, pred, None, n_buckets=nb, k=5
    )
    for q_n in (64, 17, 1, 63):
        sub = qs[:q_n]
        d, i, _ = index.search(
            data, sub, data, sub, pred, None, n_buckets=nb, k=5
        )
        assert d.shape == (q_n, 5) and i.shape == (q_n, 5)
        np.testing.assert_array_equal(i, i_full[:q_n])
        np.testing.assert_allclose(d, d_full[:q_n], rtol=1e-5, atol=1e-6)
