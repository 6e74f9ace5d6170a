"""Serving layer: micro-batching executor + HTTP front end.

The reference has no serving component (its ``search`` is a one-shot
experiment batch, ``search/search.py:247-283``); this is a TPU-native
addition — coalescing concurrent requests into one device dispatch and
riding the sticky-shape padding so steady-state serving never re-jits.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

import learnedmetricindex_tpu as lmi
from learnedmetricindex_tpu.data import synthetic_blobs
from learnedmetricindex_tpu.ops.knn import exact_knn, recall
from learnedmetricindex_tpu.serve import SearchServer, make_http_server


@pytest.fixture(scope="module")
def served():
    data, queries = synthetic_blobs(3000, 24, 64, n_clusters=16, seed=7)
    cfg = lmi.BuildConfiguration(
        "kmeans", 30, "MLP-2", 0.01, [8], seed=7, chunk_size=256
    )
    index, data_prediction, *_ = lmi.LearnedIndexBuilder(data, cfg).build()
    store = index.get_bucket_store(data, data_prediction)
    server = SearchServer(
        index, store, k=10, n_buckets=8, max_batch=256, max_wait_ms=5.0
    )
    yield server, data, queries
    server.close()


def test_single_request_matches_direct_search(served):
    server, data, queries = served
    q = queries[:16]
    dists, ids = server.search(q)
    assert dists.shape == (16, 10) and ids.shape == (16, 10)
    assert ids.dtype == np.uint32

    # all 8 buckets visited == exact: oracle agreement
    _, gt = exact_knn(data, q, k=10)
    assert recall(ids, gt, 10) == 1.0


def test_per_request_k_is_sliced(served):
    server, _, queries = served
    dists, ids = server.search(queries[:4], k=3)
    assert dists.shape == (4, 3) and ids.shape == (4, 3)
    full_d, full_i = server.search(queries[:4])
    np.testing.assert_array_equal(ids, full_i[:, :3])

    with pytest.raises(ValueError):
        server.search(queries[:4], k=99)  # k > server k
    with pytest.raises(ValueError):
        server.search(queries[:1, :5])  # wrong dim
    with pytest.raises(ValueError):
        server.search(np.zeros((300, 24), np.float32))  # > max_batch


def test_concurrent_requests_coalesce(served):
    server, data, queries = served
    before = server.stats()["batches"]
    results = {}
    barrier = threading.Barrier(8)

    def worker(i):
        barrier.wait()
        q = queries[i * 8 : (i + 1) * 8]
        results[i] = server.search(q)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    _, gt = exact_knn(data, queries[:64], k=10)
    ids_all = np.concatenate([results[i][1] for i in range(8)])
    assert recall(ids_all, gt, 10) == 1.0

    st = server.stats()
    # 64 queries landed in fewer dispatches than requests: micro-batching
    n_batches = st["batches"] - before
    assert n_batches < 8, f"no coalescing: {n_batches} batches for 8 requests"
    assert st["requests"] >= 8
    assert st["batch_queries"]["max"] >= 16


def test_http_endpoints(served):
    server, data, queries = served
    httpd = make_http_server(server, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=10) as r:
            assert json.loads(r.read()) == {"status": "ok"}

        body = json.dumps(
            {"queries": queries[:5].tolist(), "k": 10}
        ).encode()
        req = urllib.request.Request(
            f"{base}/search", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        ids = np.asarray(out["ids"], np.uint32)
        dists = np.asarray(out["dists"], np.float32)
        assert ids.shape == (5, 10) and dists.shape == (5, 10)
        _, gt = exact_knn(data, queries[:5], k=10)
        assert recall(ids, gt, 10) == 1.0

        with urllib.request.urlopen(f"{base}/stats", timeout=10) as r:
            st = json.loads(r.read())
        assert st["requests"] >= 1 and st["config"]["k"] == 10

        # malformed request → 400, not a crash
        bad = urllib.request.Request(
            f"{base}/search", data=b'{"queries": "nope"}',
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=10)
        assert ei.value.code == 400
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_close_rejects_new_requests(served):
    _, data, _ = served
    # a dedicated short-lived server: closing the module fixture would
    # break later tests
    cfg = lmi.BuildConfiguration(
        "kmeans", 10, "MLP-2", 0.01, [4], seed=11, chunk_size=256
    )
    index, pred, *_ = lmi.LearnedIndexBuilder(data, cfg).build()
    store = index.get_bucket_store(data, pred)
    server = SearchServer(index, store, k=5, n_buckets=4, max_batch=64,
                          max_wait_ms=0.0, warmup=False)
    d, i = server.search(data[:3])
    assert d.shape == (3, 5)
    server.close()
    with pytest.raises(RuntimeError):
        server.submit(data[:3])


def test_dynamic_server_insert_delete(served):
    """A server over a DynamicIndex serves mutations: in-process API
    plus the HTTP POST /insert and /delete endpoints; searches after a
    mutation see the mutated corpus."""
    _, data, queries = served
    cfg = lmi.BuildConfiguration(
        "kmeans", 30, "MLP-2", 0.01, [8], seed=7, chunk_size=256
    )
    index, pred, *_ = lmi.LearnedIndexBuilder(data, cfg).build()
    dyn = lmi.DynamicIndex.from_built(index, data, pred)
    server = SearchServer(dyn, k=10, n_buckets=8, max_batch=256,
                          max_wait_ms=0.0, warmup=False)
    try:
        # immutable servers reject mutation
        store = index.get_bucket_store(data, pred)
        plain = SearchServer(index, store, k=5, n_buckets=4,
                             max_batch=64, max_wait_ms=0.0, warmup=False)
        with pytest.raises(ValueError, match="immutable"):
            plain.insert(data[:1])
        plain.close()

        extra, _ = synthetic_blobs(50, 24, 1, n_clusters=16, seed=99)
        ids = server.insert(extra)
        assert len(ids) == 50
        d, i = server.search(extra[:8], k=1)
        np.testing.assert_array_equal(i[:, 0], ids[:8])

        assert server.delete(ids[:10]) == 10
        _, i2 = server.search(queries[:32])
        assert not np.isin(i2, ids[:10]).any()
        st = server.stats()
        assert st["mutable"] and st["inserts"] == 50 and st["deletes"] == 10
        assert st["rows"] == len(data) + 40

        # HTTP front end
        httpd = make_http_server(server, "127.0.0.1", 0)
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{port}"
        try:
            req = urllib.request.Request(
                f"{base}/insert",
                data=json.dumps({"vectors": extra[:3].tolist()}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                new_ids = json.loads(r.read())["ids"]
            assert len(new_ids) == 3

            req = urllib.request.Request(
                f"{base}/delete",
                data=json.dumps({"ids": new_ids}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                assert json.loads(r.read()) == {"deleted": 3}

            # online compact: bit-identical results, holes dropped.
            # delete half the corpus first so at least one chunk MUST
            # be freed (every bucket bigger than one chunk halves), or
            # a <=-assertion would hold trivially for a no-op compact
            victims = list(range(2, len(data) + 1, 2))
            req = urllib.request.Request(
                f"{base}/delete",
                data=json.dumps({"ids": victims}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                assert json.loads(r.read())["deleted"] == len(victims)
            _, before = server.search(queries[:16])
            req = urllib.request.Request(
                f"{base}/compact", data=b"{}",
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                rep = json.loads(r.read())
            assert rep["chunks_after"] < rep["chunks_before"]
            _, after = server.search(queries[:16])
            np.testing.assert_array_equal(before, after)
            assert not np.isin(after, victims).any()
        finally:
            httpd.shutdown()
            httpd.server_close()
    finally:
        server.close()


def test_http_mutation_rejected_on_immutable_server(served):
    server, _, _ = served  # module fixture: immutable
    httpd = make_http_server(server, "127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/insert",
            data=json.dumps({"vectors": [[0.0] * 24]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=10)
        assert ei.value.code == 400
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_server_over_sharded_store():
    """Multi-chip serving: the same SearchServer dispatcher over a
    bucket-sharded store (index.search routes it to sharded_search).
    Needs the 8-virtual-device mesh."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from learnedmetricindex_tpu.parallel.mesh import create_mesh

    data, queries = synthetic_blobs(3000, 24, 32, n_clusters=12, seed=13)
    mesh = create_mesh(8)
    cfg = lmi.BuildConfiguration("kmeans", 30, "MLP-2", 0.01, [8], seed=13,
                                 chunk_size=256)
    index, pred, *_ = lmi.LearnedIndexBuilder(data, cfg, mesh=mesh).build()
    store = index.get_sharded_store(data, pred, mesh)
    server = SearchServer(index, store, k=10, n_buckets=8, max_batch=64,
                          max_wait_ms=0.0, warmup=False)
    try:
        assert server.d == 24  # (D, n_slots, d) layout: last axis
        d, i = server.search(queries)
        _, gt = exact_knn(data, queries, k=10)
        assert recall(i, gt, 10) == 1.0
    finally:
        server.close()


def test_dynamic_server_over_sharded_store():
    """Mutable multi-chip serving: SearchServer(ShardedDynamicIndex)
    serves insert/delete/compact over the 8-virtual-device mesh — the
    single-chip HBM ceiling is no longer the mutability ceiling."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from learnedmetricindex_tpu.parallel.mesh import create_mesh
    from learnedmetricindex_tpu.parallel.sharded_mutation import (
        ShardedDynamicIndex,
    )

    data, queries = synthetic_blobs(3000, 24, 32, n_clusters=12, seed=13)
    mesh = create_mesh(8)
    cfg = lmi.BuildConfiguration("kmeans", 30, "MLP-2", 0.01, [8], seed=13,
                                 chunk_size=64)
    index, pred, *_ = lmi.LearnedIndexBuilder(data, cfg).build()
    dyn = ShardedDynamicIndex.from_built(index, data, pred, mesh=mesh,
                                         chunk=64)
    server = SearchServer(dyn, k=10, n_buckets=8, max_batch=64,
                          max_wait_ms=0.0, warmup=False)
    try:
        extra, _ = synthetic_blobs(50, 24, 1, n_clusters=12, seed=99)
        ids = server.insert(extra)
        assert len(ids) == 50
        d, i = server.search(extra[:8], k=1)
        np.testing.assert_array_equal(i[:, 0], ids[:8])

        assert server.delete(ids[:10]) == 10
        _, i2 = server.search(queries[:32])
        assert not np.isin(i2, ids[:10]).any()
        st = server.stats()
        assert st["mutable"] and st["inserts"] == 50 and st["deletes"] == 10
        assert st["rows"] == len(data) + 40

        # online compact over HTTP: enough deletes to free chunks, then
        # bit-identical searches and a strictly smaller chunk axis
        victims = list(range(2, len(data) + 1, 2))
        assert server.delete(victims) == len(victims)
        _, before = server.search(queries[:16])
        httpd = make_http_server(server, "127.0.0.1", 0)
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/compact", data=b"{}",
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                rep = json.loads(r.read())
            assert rep["chunks_after"] < rep["chunks_before"]
            _, after = server.search(queries[:16])
            np.testing.assert_array_equal(before, after)
            assert not np.isin(after, victims).any()
        finally:
            httpd.shutdown()
            httpd.server_close()
    finally:
        server.close()


def test_compilation_cache_noop_on_cpu():
    """REGRESSION (round-4 full-suite segfault): in-process CLI runs
    call ``enable_compilation_cache()``; on a non-TPU backend it must
    be a NO-OP.  When it wasn't, the config leaked process-globally:
    every later compile persisted XLA:CPU AOT executables to /tmp, and
    re-reading a stale cross-machine entry SIGSEGV'd *inside
    deserialization* — observed as the suite deterministically crashing
    in a SearchServer dispatcher thread at test 162/188."""
    import jax

    before = jax.config.jax_compilation_cache_dir
    assert lmi.enable_compilation_cache() is False
    assert jax.config.jax_compilation_cache_dir == before


def test_mutation_warms_new_envelope_on_mutating_thread(served):
    """Shape-changing mutations compile the new scan envelope on the
    CALLER thread (``_warm_after_mutation``), keeping lazy first-
    compiles off the serving dispatcher thread and batch p95 flat
    through store growth."""
    _, data, _ = served
    cfg = lmi.BuildConfiguration(
        "kmeans", 30, "MLP-2", 0.01, [8], seed=7, chunk_size=256
    )
    index, pred, *_ = lmi.LearnedIndexBuilder(data, cfg).build()
    dyn = lmi.DynamicIndex.from_built(index, data, pred)
    server = SearchServer(dyn, k=10, n_buckets=8, max_batch=64,
                          max_wait_ms=0.0)
    try:
        calls = []
        orig = server._dispatch
        server._dispatch = lambda q: (
            calls.append(threading.current_thread().name), orig(q)
        )[1]
        old_shape = server.store.chunk_data.shape
        extra, _ = synthetic_blobs(2000, 24, 1, n_clusters=16, seed=5)
        server.insert(extra)
        server._dispatch = orig
        assert server.store.chunk_data.shape != old_shape, (
            "test premise: 2000 rows into chunk=256 must grow the store"
        )
        assert calls, "growth must trigger a warm dispatch"
        assert all(n != "lmi-serve-dispatch" for n in calls)
        d, i = server.search(extra[:4], k=1)
        assert i.shape == (4, 1)
    finally:
        server.close()
