"""Serving an LMI index: micro-batched search over HTTP.

The reference stops at a one-shot experiment batch
(``search/search.py:247-283``); deploying an index behind an endpoint
is left to the user.  Here it is one module —
``learnedmetricindex_tpu.serve`` — designed around the two TPU serving
facts: per-dispatch fixed cost dwarfs per-query marginal cost (so
concurrent requests must coalesce into one device batch), and new batch
shapes re-jit (so batches ride the library's sticky-shape padding).

Run without arguments to see it end-to-end on synthetic data:

    python examples/04_serving.py

which builds a small index, starts the HTTP server on an ephemeral
port, fires 16 concurrent clients at it, and prints the server's own
/stats — note ``batches`` ≪ ``requests``: that is the micro-batching.

Production entry point (same code path):

    python -m learnedmetricindex_tpu.serve --index index.npz --data corpus.npy
"""

import json
import os
import sys
import threading
import urllib.request

import numpy as np

# import the package from a source checkout (sys.path[0] is examples/)
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    import learnedmetricindex_tpu as lmi
    from learnedmetricindex_tpu.data import synthetic_blobs
    from learnedmetricindex_tpu.ops import exact_knn, recall
    from learnedmetricindex_tpu.serve import SearchServer, make_http_server

    lmi.enable_compilation_cache()

    # ---- build (the normal public flow) ----
    data, queries = synthetic_blobs(20_000, 96, 512, n_clusters=24, seed=5)
    cfg = lmi.BuildConfiguration("kmeans", 40, "MLP", 0.01, [12], seed=5,
                                 chunk_size=1024)
    index, pred, n_buckets, build_t, _ = lmi.LearnedIndexBuilder(
        data, cfg
    ).build()
    store = index.get_bucket_store(data, pred)
    print(f"built {n_buckets} buckets in {build_t:.1f}s")

    # ---- serve ----
    server = SearchServer(index, store, k=10, n_buckets=4,
                          max_batch=1024, max_wait_ms=3.0)
    httpd = make_http_server(server, "127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    print(f"serving on http://127.0.0.1:{port}")

    # ---- 16 concurrent clients, 32 queries each ----
    _, gt = exact_knn(data, queries, k=10)
    results = {}
    barrier = threading.Barrier(16)

    def client(i: int) -> None:
        q = queries[i * 32 : (i + 1) * 32]
        body = json.dumps({"queries": q.tolist(), "k": 10}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/search", data=body,
            headers={"Content-Type": "application/json"},
        )
        barrier.wait()
        with urllib.request.urlopen(req, timeout=120) as r:
            results[i] = np.asarray(json.loads(r.read())["ids"], np.uint32)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    ids = np.concatenate([results[i] for i in range(16)])
    r = recall(ids, gt[: len(ids)], 10)
    print(f"recall@10 over HTTP ({len(ids)} queries, 4/{n_buckets} "
          f"buckets): {r:.4f}")

    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/stats", timeout=30
    ) as resp:
        stats = json.loads(resp.read())
    print("server stats:", json.dumps(stats, indent=2))
    print(f"micro-batching: {stats['requests']} requests ran as "
          f"{stats['batches']} device batches")

    httpd.shutdown()
    httpd.server_close()
    server.close()


if __name__ == "__main__":
    main()
