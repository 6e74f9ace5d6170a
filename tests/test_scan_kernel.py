"""Pallas fused scan kernel vs the XLA phase-1 path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from learnedmetricindex_tpu.data import synthetic_blobs
from learnedmetricindex_tpu.index.bucket_store import (
    BucketStore,
    _gather_work_queries,
    _scan_items,
    build_scan_plan,
)
from learnedmetricindex_tpu.ops.scan_kernel import pallas_scan_items


def test_pallas_kernel_matches_xla_phase1():
    chunk, qtile, k = 64, 16, 5
    data, queries = synthetic_blobs(600, 16, 40, seed=3)
    rng = np.random.default_rng(0)
    bucket_ids = rng.integers(0, 6, size=600)
    store = BucketStore.build(data, bucket_ids, 6, chunk=chunk)
    order = np.stack(
        [rng.choice(6, size=3, replace=False) for _ in range(40)]
    ).astype(np.int64)
    plan = build_scan_plan(store, order, qtile=qtile)

    W = len(plan.item_chunk)
    QP = len(plan.qidx)
    assert QP % qtile == 0
    qx = jnp.asarray(plan.qidx)
    wq = _gather_work_queries(jnp.asarray(queries), qx)
    ic = jnp.asarray(plan.item_chunk)
    iq_t = jnp.asarray((plan.item_q_start // qtile).astype(np.int32))
    iv = jnp.asarray(np.ones(W, np.int32))
    qidx2d = qx.reshape(QP // qtile, qtile)
    ids2d = store.chunk_ids.reshape(-1, 1)
    scales2d = jnp.ones((store.n_chunks * chunk, 1), jnp.float32)

    pd, pi, pq = pallas_scan_items(
        wq, qidx2d, ic, iq_t, iv, store.chunk_data, ids2d, scales2d,
        k=k, qtile=qtile, chunk=chunk, interpret=True,
    )

    xd, xi, xq = _scan_items(
        wq, qx, iq_t * qtile, ic, jnp.asarray(np.ones(W, bool)),
        store.chunk_data, store.chunk_ids, None,
        k=k, qtile=qtile, items_per_step=1, precision="highest",
        approx_recall=None,
    )

    pd_n, xd_n = np.asarray(pd), np.asarray(xd)
    both_inf = np.isinf(pd_n) & np.isinf(xd_n)
    close = np.isclose(pd_n, xd_n, rtol=1e-3, atol=1e-4) | both_inf
    assert close.mean() > 0.999
    # ids compared on finite candidates only (on inf padding the kernel
    # writes 0 while XLA's top_k leaves arbitrary ids; the merge filters
    # inf either way)
    finite = ~both_inf
    assert (np.asarray(pi)[finite] == np.asarray(xi)[finite]).mean() > 0.99
    np.testing.assert_array_equal(np.asarray(pq), np.asarray(xq))


def test_pallas_kernel_invalid_items_and_padding():
    chunk, qtile, k = 32, 8, 3
    data, queries = synthetic_blobs(100, 8, 10, seed=1)
    bucket_ids = np.zeros(100, dtype=np.int64)
    store = BucketStore.build(data, bucket_ids, 1, chunk=chunk)
    plan = build_scan_plan(
        store, np.zeros((10, 1), dtype=np.int64), qtile=qtile
    )
    W = len(plan.item_chunk)
    qx = jnp.asarray(plan.qidx)
    wq = _gather_work_queries(jnp.asarray(queries), qx)
    iv = np.ones(W, np.int32)
    iv[-1] = 0  # kill the last item
    pd, pi, pq = pallas_scan_items(
        wq,
        qx.reshape(-1, qtile),
        jnp.asarray(plan.item_chunk),
        jnp.asarray((plan.item_q_start // qtile).astype(np.int32)),
        jnp.asarray(iv),
        store.chunk_data,
        store.chunk_ids.reshape(-1, 1),
        jnp.ones((store.n_chunks * chunk, 1), jnp.float32),
        k=k, qtile=qtile, chunk=chunk, interpret=True,
    )
    pd_n = np.asarray(pd).reshape(W, qtile, k)
    assert np.isinf(pd_n[-1]).all()  # invalid item emits no candidates
    assert (np.asarray(pi).reshape(W, qtile, k)[-1] == 0).all()