"""Zero-sync search: the device-built scan plan must be observationally
identical to the host plan (``build_scan_plan`` + blob path) — same
neighbors, same distances — across fresh stores, mutated stores
(chunk-list indirection, delete holes, overflow chunks), empty
buckets, and the envelope-overflow fallback."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import learnedmetricindex_tpu as lmi
from learnedmetricindex_tpu.data import synthetic_blobs
from learnedmetricindex_tpu.index import bucket_store as bs
from learnedmetricindex_tpu.index.bucket_store import (
    scan_buckets,
    scan_buckets_device,
)
from learnedmetricindex_tpu.ops.knn import exact_knn, recall


@pytest.fixture(scope="module")
def built():
    data, queries = synthetic_blobs(2600, 24, 80, n_clusters=16, seed=11)
    cfg = lmi.BuildConfiguration(
        "kmeans", 40, "MLP-2", 0.01, [10], seed=11, chunk_size=64
    )
    index, pred, n_buckets, _, _ = lmi.LearnedIndexBuilder(data, cfg).build()
    store = index.get_bucket_store(data, pred)
    return data, queries, index, pred, store


def _orders(store, queries, v, seed=0):
    rng = np.random.default_rng(seed)
    order = np.stack(
        [rng.choice(store.n_buckets, v, replace=False)
         for _ in range(len(queries))]
    ).astype(np.int64)
    # sprinkle -1 padding (unused visit slots)
    if v > 1:
        order[rng.random(len(queries)) < 0.3, -1] = -1
    return order


@pytest.mark.parametrize("v", [1, 3])
@pytest.mark.parametrize("rerank", [True, False])
def test_device_plan_matches_host_plan(built, v, rerank):
    """Bitwise equality at f32 (precision="highest").  engine="pallas"
    on the host side: on CPU, "auto" routes to the XLA engine.  bf16
    equality across DIFFERENT compiled programs is not a valid
    expectation off-TPU — XLA:CPU's excess-precision elides bf16 casts
    program-dependently (measured ~2e-4 drift), while the plan arrays
    themselves are identical (asserted in the overflow test below)."""
    data, queries, index, pred, store = built
    order = _orders(store, queries, v)
    d_host, i_host = scan_buckets(
        store, queries, order, k=10, rerank=rerank, rerank_margin=4,
        engine="pallas", precision="highest",
    )
    res = scan_buckets_device(
        store, queries, jnp.asarray(order.astype(np.int32)), k=10,
        rerank=rerank, rerank_margin=4, precision="highest",
    )
    assert res is not None
    d_dev, i_dev = res
    np.testing.assert_array_equal(i_host, i_dev)
    np.testing.assert_allclose(d_host, d_dev, rtol=1e-6, atol=1e-6)


def test_device_plan_default_precision_tolerance(built):
    """At default (bf16) precision the two programs may round
    differently off-TPU; distances agree to bf16 tolerance and the
    reranked neighbor sets match."""
    data, queries, index, pred, store = built
    order = _orders(store, queries, 3)
    d_host, i_host = scan_buckets(
        store, queries, order, k=10, rerank=True, rerank_margin=6,
        engine="pallas",
    )
    res = scan_buckets_device(
        store, queries, jnp.asarray(order.astype(np.int32)), k=10,
        rerank=True, rerank_margin=6,
    )
    d_dev, i_dev = res
    np.testing.assert_allclose(d_host, d_dev, atol=3e-3)
    same = (np.sort(i_host, axis=1) == np.sort(i_dev, axis=1)).mean()
    assert same > 0.99


def test_device_plan_arrays_equal_host_plan(built):
    """The device builder emits the SAME work list as the host builder
    (qidx, item metadata, chunk ids, merge maps) — the envelopes only
    append padding."""
    from learnedmetricindex_tpu.index.bucket_store import (
        _build_plan_device,
        build_scan_plan,
    )
    from learnedmetricindex_tpu.ops.scan_kernel import pallas_host_args

    data, queries, index, pred, store = built
    for v, seed in [(1, 0), (3, 4), (5, 9)]:
        order = _orders(store, queries, v, seed=seed)
        qtile = 128
        plan = build_scan_plan(store, order, qtile=qtile)
        n_pairs = len(plan.qidx) // qtile
        im, ic, wr, _, pw = pallas_host_args(store, plan, qtile, n_pairs)
        QP_env = (
            -(-(len(queries) * v) // qtile) * qtile
            + store.n_buckets * qtile
        )
        qd, imd, icd, wrd, prd, pod, wa = _build_plan_device(
            jnp.asarray(order.astype(np.int32)),
            jnp.asarray(store.bucket_chunk_start.astype(np.int32)),
            jnp.asarray(np.arange(
                int(store.bucket_chunk_start[-1]), dtype=np.int32
            )),
            qtile=qtile, G=8, QP_env=QP_env, W_env=len(im) + 64,
        )
        assert int(wa) == len(plan.item_chunk)
        np.testing.assert_array_equal(plan.qidx, np.asarray(qd)[: len(plan.qidx)])
        assert (np.asarray(qd)[len(plan.qidx):] == -1).all()
        np.testing.assert_array_equal(im, np.asarray(imd)[: len(im)])
        np.testing.assert_array_equal(ic, np.asarray(icd)[: len(ic)])
        ok = plan.pair_slot >= 0
        pr_h = np.where(ok, plan.pair_slot, n_pairs * qtile)
        po_h = ok & pw[np.minimum(pr_h // qtile, n_pairs)]
        np.testing.assert_array_equal(pr_h[ok], np.asarray(prd)[ok])
        np.testing.assert_array_equal(po_h, np.asarray(pod))


def test_search_uses_device_plan_and_is_exact(built):
    data, queries, index, pred, store = built
    _, gt = exact_knn(data, queries, k=10)
    d, nns, t = index.search(
        None, queries, None, queries, pred,
        n_buckets=index.n_buckets, k=10, store=store,
    )
    assert bs.LAST_ENGINE == "pallas-fused-devplan"
    assert recall(np.asarray(nns), gt, 10) == 1.0


def test_envelope_overflow_falls_back_and_grows(built):
    data, queries, index, pred, store = built
    order = _orders(store, queries, 3, seed=5)
    # force a tiny W envelope: first call overflows -> None + grown hint
    key = (id(store.chunk_ids), "devplan", 128, 3)
    bs._SHAPE_HINTS.pop(key, None)
    hints = bs._SHAPE_HINTS.setdefault(key, {})
    hints["W_env"] = 8
    res = scan_buckets_device(
        store, queries, jnp.asarray(order.astype(np.int32)), k=10,
        rerank=True, rerank_margin=4,
    )
    assert res is None
    assert hints["W_env"] > 8  # grown for the next call
    res2 = scan_buckets_device(
        store, queries, jnp.asarray(order.astype(np.int32)), k=10,
        rerank=True, rerank_margin=4,
    )
    assert res2 is not None
    d_host, i_host = scan_buckets(
        store, queries, order, k=10, rerank=True, rerank_margin=4
    )
    np.testing.assert_array_equal(i_host, res2[1])

    # the public search must return correct results THROUGH the
    # overflow fallback too
    bs._SHAPE_HINTS.pop(key, None)
    key_full = (id(store.chunk_ids), "devplan", 128, index.n_buckets)
    bs._SHAPE_HINTS.pop(key_full, None)
    bs._SHAPE_HINTS.setdefault(key_full, {})["W_env"] = 8
    _, gt = exact_knn(data, queries, k=10)
    _, nns, _ = index.search(
        None, queries, None, queries, pred,
        n_buckets=index.n_buckets, k=10, store=store,
    )
    assert recall(np.asarray(nns), gt, 10) == 1.0
    bs._SHAPE_HINTS.pop(key_full, None)


def test_device_plan_on_mutated_store(built):
    """Chunk-list indirection (delete holes + overflow chunks) goes
    through the device plan's chunk_of gather."""
    data, queries, index, pred, _ = built
    extra, _ = synthetic_blobs(300, 24, 1, n_clusters=16, seed=33)
    dyn = lmi.DynamicIndex.from_built(index, data, pred, chunk=64)
    ids = dyn.insert(extra)
    dyn.delete(ids[::3])
    dyn.delete(np.arange(5, 200, 7))

    d1, n1, _ = dyn.search(queries, n_buckets=index.n_buckets, k=10)
    assert bs.LAST_ENGINE == "pallas-fused-devplan"
    corpus = np.concatenate([data, extra])
    keep = np.ones(len(corpus), bool)
    keep[np.asarray(ids[::3]) - 1] = False
    keep[np.arange(5, 200, 7) - 1] = False
    live = np.nonzero(keep)[0] + 1
    gt = live[exact_knn(corpus[keep], queries, k=10)[1] - 1]
    assert recall(np.asarray(n1), gt, 10) == 1.0


def test_device_plan_killswitch(built, monkeypatch):
    data, queries, index, pred, store = built
    monkeypatch.setenv("LMI_DEVICE_PLAN", "0")
    _, gt = exact_knn(data, queries, k=10)
    _, nns, _ = index.search(
        None, queries, None, queries, pred,
        n_buckets=index.n_buckets, k=10, store=store,
    )
    assert bs.LAST_ENGINE != "pallas-fused-devplan"
    assert recall(np.asarray(nns), gt, 10) == 1.0
