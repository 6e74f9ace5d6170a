"""int8 row quantization and the quantized index pipeline."""

import numpy as np
import pytest

import jax.numpy as jnp

import learnedmetricindex_tpu as lmi
from learnedmetricindex_tpu.data import synthetic_blobs
from learnedmetricindex_tpu.ops.knn import exact_knn, recall
from learnedmetricindex_tpu.ops.quantize import dequantize_rows, quantize_rows


def test_quantize_roundtrip_accuracy():
    data, _ = synthetic_blobs(500, 64, 1, seed=0)
    q, scales = quantize_rows(jnp.asarray(data))
    assert np.asarray(q).dtype == np.int8
    back = np.asarray(dequantize_rows(q, scales))
    # per-element error bounded by scale/2
    err = np.abs(back - data)
    assert (err <= np.asarray(scales)[:, None] / 2 + 1e-7).all()
    # dot products accurate to a few 1e-3 on unit vectors
    dots = (back * data).sum(1)
    np.testing.assert_allclose(dots, (data * data).sum(1), atol=6e-3)


def test_exact_knn_with_scales_matches_dequantized():
    data, queries = synthetic_blobs(800, 32, 30, seed=2)
    q, scales = quantize_rows(jnp.asarray(data))
    qn, sn = np.asarray(q), np.asarray(scales)
    deq = qn.astype(np.float32) * sn[:, None]
    d1, i1 = exact_knn(qn, queries, k=10, row_scales=sn)
    d2, i2 = exact_knn(deq, queries, k=10)
    np.testing.assert_allclose(d1, d2, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(i1, i2)


def test_quantized_build_and_search_end_to_end():
    data, queries = synthetic_blobs(3000, 24, 100, n_clusters=16, seed=5)
    q, scales = quantize_rows(jnp.asarray(data))
    qn, sn = np.asarray(q), np.asarray(scales)
    deq = qn.astype(np.float32) * sn[:, None]
    _, gt = exact_knn(deq, queries, k=10)

    cfg = lmi.BuildConfiguration("kmeans", 30, "MLP-2", 0.01, [8], seed=5,
                                 chunk_size=256)
    index, pred, n_buckets, _, _ = lmi.LearnedIndexBuilder(
        (jnp.asarray(qn), jnp.asarray(sn)), cfg
    ).build()
    assert n_buckets == 8

    # full visit == exact over the dequantized corpus (virtual int8 store)
    _, anns, _ = index.search(
        None, queries, (jnp.asarray(qn), jnp.asarray(sn)), queries, pred,
        cfg.n_categories, n_buckets=8, k=10,
    )
    assert recall(anns, gt, 10) == 1.0

    # packed device store gives identical results
    store = index.prepare_packed_store((jnp.asarray(qn), jnp.asarray(sn)), pred)
    assert store.chunk_data is not None and store.chunk_scales is not None
    _, anns2, _ = index.search(
        None, queries, None, queries, pred, cfg.n_categories,
        n_buckets=8, k=10, store=store,
    )
    np.testing.assert_array_equal(anns, anns2)

    # partial visit still healthy
    _, anns3, _ = index.search(
        None, queries, None, queries, pred, cfg.n_categories,
        n_buckets=3, k=10, store=store,
    )
    assert recall(anns3, gt, 10) > 0.8

def test_host_quantize_matches_jitted():
    """The host (numpy) quantizer is the single shared definition used
    by the packed store and the bench corpus upload; it must agree
    bit-for-bit with the jitted ``quantize_rows``."""
    from learnedmetricindex_tpu.ops.quantize import quantize_rows_np

    rng = np.random.default_rng(7)
    data = rng.standard_normal((64, 32)).astype(np.float32)
    data[0] = 0.0  # eps path
    q_dev, s_dev = quantize_rows(jnp.asarray(data))
    q_host, s_host = quantize_rows_np(data)
    # device float division can differ from the host by 1 ulp, which
    # may flip a round() at an exact .5 boundary — allow |Δq| ≤ 1 on a
    # vanishing fraction, nothing more
    dq = np.abs(np.asarray(q_dev, np.int32) - q_host.astype(np.int32))
    assert dq.max() <= 1 and (dq > 0).mean() < 0.01
    np.testing.assert_allclose(np.asarray(s_dev), s_host, rtol=1e-6)
