"""Production serving: a micro-batching search server over a built index.

The reference has no serving story — its ``search`` is a one-shot batch
call inside an experiment driver (``search/search.py:247-283``), and its
published throughput (45 QPS on one core) comes from a single 10k-query
batch.  Serving on TPU has a specific shape that a naive
request-per-dispatch server gets badly wrong:

* **Per-dispatch cost is dominated by fixed overheads** (host→device
  upload, program dispatch — milliseconds each on the remote-relay
  runtime), while the marginal cost of extra queries inside a dispatch
  is tiny: the flagship scan runs 10k queries in ~0.2 s but a single
  query still pays ~0.05 s of fixed cost.  Coalescing concurrent
  requests into one device batch is therefore a ~100× throughput lever.
* **A new batch shape re-jits the programs.**  ``LearnedIndex.search``
  already sticky-pads host batches (repeating row 0, whose pad queries
  join row 0's scan tiles) so steady-state serving never recompiles —
  the server rides that and additionally caps batches at ``max_batch``
  so the compiled envelope is bounded.

Two pieces, both stdlib-only (no third-party server deps):

* :class:`SearchServer` — engine-agnostic micro-batching executor over
  a built :class:`~learnedmetricindex_tpu.index.index.LearnedIndex` +
  bucket store.  Client threads ``submit()`` query arrays; a single
  dispatcher thread drains the queue into one ``index.search`` call per
  tick (TPU work is serialized through one jitted dispatch anyway — a
  thread pool of device calls would only contend).
* :func:`make_http_server` / :func:`main` — a JSON-over-HTTP front end
  (``POST /search``, ``GET /healthz``, ``GET /stats``; plus
  ``POST /insert`` / ``POST /delete`` / ``POST /compact`` when the
  server wraps a
  :class:`~learnedmetricindex_tpu.index.mutation.DynamicIndex`) on
  ``ThreadingHTTPServer``: each connection blocks on its request's
  future while the dispatcher batches across connections.

``bench.py --serving N`` is the offline latency probe for the same
path; ``tests/test_serve.py`` exercises the server end-to-end over
real sockets.
"""

from __future__ import annotations

import json
import threading
import time
from collections import deque
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from learnedmetricindex_tpu.utils.logging import Logger

__all__ = ["SearchServer", "make_http_server", "main"]


class _Request:
    """One submitted query batch: filled in by the dispatcher thread."""

    __slots__ = ("queries", "k", "event", "dists", "ids", "error",
                 "t_submit")

    def __init__(self, queries: np.ndarray, k: int):
        self.queries = queries
        self.k = k
        self.event = threading.Event()
        self.dists: Optional[np.ndarray] = None
        self.ids: Optional[np.ndarray] = None
        self.error: Optional[BaseException] = None
        self.t_submit = time.perf_counter()

    def wait(self, timeout: Optional[float] = None) -> Tuple[np.ndarray, np.ndarray]:
        if not self.event.wait(timeout):
            raise TimeoutError("search request timed out")
        if self.error is not None:
            raise self.error
        return self.dists, self.ids


class SearchServer(Logger):
    """Micro-batching executor: coalesce concurrent search requests
    into one device dispatch.

    Parameters mirror :meth:`LearnedIndex.search`'s serving-relevant
    knobs and are FIXED per server (they select compiled programs);
    per-request ``k`` may be anything ≤ the server's ``k`` — the server
    computes at its own ``k`` and slices the response.

    ``max_batch`` bounds the compiled query envelope (requests beyond
    it wait for the next tick); ``max_wait_ms`` is the batching window —
    how long the dispatcher waits after the first request of a tick for
    more requests to coalesce.  At 0 the server still batches whatever
    arrived during the previous dispatch (natural batching under load).
    """

    def __init__(
        self,
        index,
        store=None,
        *,
        k: int = 10,
        n_buckets: int = 4,
        policy: str = "best_first",
        nav_temp=None,
        precision: str = "default",
        rerank: bool = True,
        rerank_margin: int = 6,
        max_batch: int = 4096,
        max_wait_ms: float = 2.0,
        warmup: bool = True,
    ):
        from learnedmetricindex_tpu.index.mutation import DynamicIndex
        from learnedmetricindex_tpu.parallel.sharded_mutation import (
            ShardedDynamicIndex,
        )

        # a DynamicIndex makes the server MUTABLE: insert/delete swap
        # the store snapshot between dispatches (each dispatch reads one
        # consistent functional store; a request submitted after a
        # mutation returns is guaranteed to search the mutated store).
        # A ShardedDynamicIndex serves the same surface over a
        # mesh-sharded store (corpora past the single-chip ceiling).
        if isinstance(index, (DynamicIndex, ShardedDynamicIndex)):
            self.dynamic = index
            if store is not None:
                raise ValueError(
                    "pass either a DynamicIndex or (index, store)"
                )
            index, store = index.index, self.dynamic.store
        else:
            self.dynamic = None
            if store is None:
                raise ValueError("store is required for a plain index")
        self._mutate_lock = threading.Lock()
        self._n_inserts = 0
        self._n_deletes = 0
        self.index = index
        self.store = store
        self.k = int(k)
        self.n_buckets = int(n_buckets)
        self.policy = policy
        self.nav_temp = nav_temp
        self.precision = precision
        self.rerank = rerank
        self.rerank_margin = int(rerank_margin)
        self.max_batch = int(max_batch)
        self.max_wait_ms = float(max_wait_ms)
        # last axis covers all store layouts: packed (n_slots, d),
        # virtual data_ref (n, d), and sharded (D, n_slots, d) — the
        # multi-chip ShardedStore serves through the same dispatcher
        # (index.search routes it to sharded_search)
        self.d = int(store.chunk_data.shape[-1]) if store.chunk_data is not None \
            else int(store.data_ref.shape[-1])

        self._lock = threading.Condition()
        self._pending: deque = deque()
        self._closed = False
        self._t_start = time.perf_counter()
        # stats under the same lock: totals + bounded latency/batch logs
        self._n_requests = 0
        self._n_queries = 0
        self._n_batches = 0
        self._n_errors = 0
        self._latencies: deque = deque(maxlen=4096)  # seconds, per request
        self._batch_sizes: deque = deque(maxlen=4096)

        self._warmup = bool(warmup)
        if warmup:
            # compile the serving envelope up front: one max_batch-sized
            # dispatch (sticky padding then reuses it for every smaller
            # batch) — otherwise the first client pays the multi-second
            # first-compile
            q = np.zeros((self.max_batch, self.d), np.float32)
            q[:, 0] = 1.0
            self._dispatch(q)

        self._thread = threading.Thread(
            target=self._loop, name="lmi-serve-dispatch", daemon=True
        )
        self._thread.start()

    # ---- client API ----

    def submit(self, queries: np.ndarray, k: Optional[int] = None) -> _Request:
        """Enqueue a (Q, d) float32 query batch; returns a request whose
        ``wait()`` yields ``(dists (Q, k), ids (Q, k) uint32 1-based)``."""
        queries = np.ascontiguousarray(queries, dtype=np.float32)
        if queries.ndim != 2 or queries.shape[1] != self.d:
            raise ValueError(
                f"queries must be (Q, {self.d}) float32, got {queries.shape}"
            )
        if len(queries) > self.max_batch:
            raise ValueError(
                f"batch of {len(queries)} exceeds max_batch={self.max_batch}"
                " — split the request"
            )
        k = self.k if k is None else int(k)
        if not 1 <= k <= self.k:
            raise ValueError(f"k must be in [1, {self.k}], got {k}")
        req = _Request(queries, k)
        with self._lock:
            if self._closed:
                raise RuntimeError("server is closed")
            self._pending.append(req)
            self._lock.notify_all()
        return req

    def search(
        self, queries: np.ndarray, k: Optional[int] = None,
        timeout: Optional[float] = 60.0,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Blocking convenience wrapper around :meth:`submit`."""
        return self.submit(queries, k).wait(timeout)

    # ---- mutation API (DynamicIndex-backed servers only) ----

    def _require_dynamic(self):
        if self.dynamic is None:
            # ValueError: a client-side misuse (HTTP 400), unlike
            # RuntimeError which device failures (JaxRuntimeError)
            # subclass and which must stay a 500 at the HTTP boundary
            raise ValueError(
                "this server wraps an immutable (index, store) pair — "
                "construct SearchServer(DynamicIndex(...)) to serve "
                "inserts and deletes"
            )

    def insert(self, vectors: np.ndarray, object_ids=None) -> np.ndarray:
        """Insert rows into the live corpus; returns their 1-based ids.
        Searches submitted after this returns see the new rows; requests
        already in flight finish on the previous store snapshot.  An
        insert that grows the store's device arrays recompiles the next
        scan once (growth is geometric, so recompiles are bounded)."""
        self._require_dynamic()
        vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        if vectors.ndim != 2 or vectors.shape[1] != self.d:
            raise ValueError(
                f"vectors must be (N, {self.d}) float32, got {vectors.shape}"
            )
        with self._mutate_lock:
            old = self.store
            ids = self.dynamic.insert(vectors, object_ids)
            self.store = self.dynamic.store
            with self._lock:
                self._n_inserts += len(ids)
            self._warm_after_mutation(old)
        return ids

    def delete(self, object_ids) -> int:
        """Delete rows by 1-based id; returns how many existed."""
        self._require_dynamic()
        with self._mutate_lock:
            old = self.store
            n = self.dynamic.delete(np.asarray(object_ids, np.int64))
            self.store = self.dynamic.store
            with self._lock:
                self._n_deletes += n
            self._warm_after_mutation(old)
        return n

    def compact(self) -> Dict:
        """Repack the live store (drop delete holes / overflow chunks).
        Device-side permutation — search results are bit-identical
        before/after (see ``mutation.compact_store``), so this is safe
        to run online; in-flight dispatches finish on the previous
        snapshot.  Returns ``{"chunks_before": ..., "chunks_after": ...}``."""
        self._require_dynamic()
        with self._mutate_lock:
            old = self.store
            before = self.dynamic.store.n_chunks
            self.dynamic.compact()
            self.store = self.dynamic.store
            self._warm_after_mutation(old)
        return {"chunks_before": before,
                "chunks_after": self.store.n_chunks}

    def _warm_after_mutation(self, old_store) -> None:
        """Compile + execute the new store's scan envelope on the
        MUTATING thread when a mutation changed device-array shapes
        (growth / compaction).  Two reasons, both production-facing:
        the dispatcher thread never pays (or lazily triggers) a
        multi-second first-compile mid-serving, so batch p95 stays
        flat through growth; and all first-compiles happen on caller
        threads, the same discipline as the constructor warmup.
        Runs under ``_mutate_lock``; sticky shape hints make
        same-shape mutations a no-op here."""
        if not self._warmup:  # warmup=False opts out entirely
            return
        new = self.store
        old_cd, new_cd = old_store.chunk_data, new.chunk_data
        if (old_cd is None) == (new_cd is None) and (
            old_cd is None or old_cd.shape == new_cd.shape
        ):
            return
        q = np.zeros((self.max_batch, self.d), np.float32)
        q[:, 0] = 1.0
        self._dispatch(q)

    def stats(self) -> Dict:
        with self._lock:
            lat = sorted(self._latencies)
            sizes = sorted(self._batch_sizes)
            n = len(lat)

            def pct(xs, p):
                return float(xs[min(len(xs) - 1, int(p * len(xs)))]) if xs else 0.0

            from learnedmetricindex_tpu.index import bucket_store

            return {
                "uptime_s": round(time.perf_counter() - self._t_start, 3),
                "requests": self._n_requests,
                "queries": self._n_queries,
                "batches": self._n_batches,
                "errors": self._n_errors,
                "pending": len(self._pending),
                "latency_ms": {
                    "p50": round(pct(lat, 0.50) * 1e3, 3),
                    "p95": round(pct(lat, 0.95) * 1e3, 3),
                    "max": round(lat[-1] * 1e3, 3) if n else 0.0,
                },
                "batch_queries": {
                    "p50": pct(sizes, 0.50),
                    "max": float(sizes[-1]) if sizes else 0.0,
                },
                "engine": getattr(bucket_store, "LAST_ENGINE", None),
                "mutable": self.dynamic is not None,
                "inserts": self._n_inserts,
                "deletes": self._n_deletes,
                "rows": (
                    self.dynamic.n_rows if self.dynamic is not None else None
                ),
                "config": {
                    "k": self.k,
                    "n_buckets": self.n_buckets,
                    "policy": self.policy,
                    "nav_temp": self.nav_temp,
                    "precision": self.precision,
                    "rerank": self.rerank,
                    "max_batch": self.max_batch,
                    "max_wait_ms": self.max_wait_ms,
                    "d": self.d,
                },
            }

    def close(self, timeout: float = 10.0) -> None:
        with self._lock:
            self._closed = True
            self._lock.notify_all()
        self._thread.join(timeout)
        # fail any requests that never made it into a batch
        with self._lock:
            while self._pending:
                req = self._pending.popleft()
                req.error = RuntimeError("server closed")
                req.event.set()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ---- dispatcher ----

    def _dispatch(self, queries: np.ndarray):
        return self.index.search(
            None,
            queries,
            None,
            queries,
            None,
            n_buckets=self.n_buckets,
            k=self.k,
            policy=self.policy,
            nav_temp=self.nav_temp,
            precision=self.precision,
            rerank=self.rerank,
            rerank_margin=self.rerank_margin,
            store=self.store,
        )

    def _take_batch(self) -> List[_Request]:
        """Wait for work, apply the batching window, drain ≤ max_batch
        queries worth of requests.  Runs on the dispatcher thread."""
        with self._lock:
            while not self._pending and not self._closed:
                self._lock.wait(0.1)
            if self._closed:
                return []
            if self.max_wait_ms > 0:
                deadline = time.perf_counter() + self.max_wait_ms / 1e3
                while time.perf_counter() < deadline:
                    n_q = sum(len(r.queries) for r in self._pending)
                    if n_q >= self.max_batch:
                        break
                    self._lock.wait(max(deadline - time.perf_counter(), 0))
            batch: List[_Request] = []
            n_q = 0
            while self._pending:
                if n_q + len(self._pending[0].queries) > self.max_batch:
                    break
                req = self._pending.popleft()
                batch.append(req)
                n_q += len(req.queries)
            return batch

    def _loop(self) -> None:
        while True:
            batch = self._take_batch()
            if not batch:
                with self._lock:
                    if self._closed:
                        return
                continue
            queries = (
                batch[0].queries if len(batch) == 1
                else np.concatenate([r.queries for r in batch])
            )
            try:
                dists, ids, _ = self._dispatch(queries)
                err = None
            except Exception as e:  # noqa: BLE001 — propagate to callers
                self.logger.exception("serving dispatch failed")
                dists = ids = None
                err = e
            t_done = time.perf_counter()
            row = 0
            with self._lock:
                self._n_batches += 1
                self._batch_sizes.append(len(queries))
                self._n_requests += len(batch)
                self._n_queries += len(queries)
                if err is not None:
                    self._n_errors += len(batch)
                for req in batch:
                    self._latencies.append(t_done - req.t_submit)
            for req in batch:
                n = len(req.queries)
                if err is not None:
                    req.error = err
                else:
                    req.dists = dists[row : row + n, : req.k]
                    req.ids = ids[row : row + n, : req.k]
                row += n
                req.event.set()


# ---- HTTP front end (stdlib only) ----


def make_http_server(server: SearchServer, host: str = "127.0.0.1",
                     port: int = 0):
    """A ``ThreadingHTTPServer`` speaking JSON:

    * ``POST /search`` — body ``{"queries": [[...], ...], "k": 10?}`` →
      ``{"ids": [[...]], "dists": [[...]]}`` (ids 1-based, reference
      convention ``LearnedIndex.py:363-368``).
    * ``GET /healthz`` → ``{"status": "ok"}``.
    * ``GET /stats`` → :meth:`SearchServer.stats`.

    Returns the HTTP server (not yet serving); call ``serve_forever()``
    or run it on a thread.  Port 0 binds an ephemeral port
    (``http_server.server_address[1]``).
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _reply(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 — http.server API
            if self.path == "/healthz":
                self._reply(200, {"status": "ok"})
            elif self.path == "/stats":
                self._reply(200, server.stats())
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):  # noqa: N802
            try:
                length = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(length) or b"{}")
                if self.path == "/search":
                    queries = np.asarray(payload["queries"], dtype=np.float32)
                    if queries.ndim == 1:
                        queries = queries[None, :]
                    dists, ids = server.search(
                        queries, k=payload.get("k"),
                        timeout=float(payload.get("timeout_s", 60.0)),
                    )
                    self._reply(200, {
                        "ids": ids.tolist(),
                        "dists": [[float(x) for x in row] for row in dists],
                    })
                elif self.path == "/insert":
                    vectors = np.asarray(payload["vectors"], dtype=np.float32)
                    if vectors.ndim == 1:
                        vectors = vectors[None, :]
                    ids = server.insert(vectors, payload.get("ids"))
                    self._reply(200, {"ids": [int(i) for i in ids]})
                elif self.path == "/delete":
                    n = server.delete(
                        np.asarray(payload["ids"], dtype=np.int64)
                    )
                    self._reply(200, {"deleted": n})
                elif self.path == "/compact":
                    self._reply(200, server.compact())
                else:
                    self._reply(404, {"error": f"unknown path {self.path}"})
            except (KeyError, ValueError, TypeError) as e:
                self._reply(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — serving boundary
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet by default
            server.logger.debug("%s " + fmt, self.client_address[0], *args)

    return ThreadingHTTPServer((host, port), Handler)


def _build_demo_index(n: int, d: int, n_buckets: int, seed: int = 2023):
    """Small synthetic index for ``--synthetic`` demo serving."""
    import learnedmetricindex_tpu as lmi
    from learnedmetricindex_tpu.data import synthetic_blobs

    data, _ = synthetic_blobs(n, d, 1, n_clusters=min(64, n_buckets * 2),
                              seed=seed)
    cfg = lmi.BuildConfiguration(
        "kmeans", 8, "MLP", 0.01, [n_buckets], seed=seed,
        chunk_size=1024,
    )
    index, data_prediction, *_ = lmi.LearnedIndexBuilder(data, cfg).build()
    return index, data_prediction, data


def main(argv: Optional[Sequence[str]] = None) -> int:
    """``python -m learnedmetricindex_tpu.serve`` — serve a saved index
    (``--index index.npz --data corpus.npy``) or a synthetic demo
    (``--synthetic N``)."""
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--index", help="saved index .npz (see save_index)")
    p.add_argument("--data", help="corpus rows: .npy or .h5 (dataset 'emb')")
    p.add_argument("--synthetic", type=int, default=0,
                   help="serve a synthetic demo index of N rows instead")
    p.add_argument("--d", type=int, default=128, help="synthetic dim")
    p.add_argument("--buckets", type=int, default=16,
                   help="synthetic leaf buckets")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8088)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--n-buckets", type=int, default=4,
                   help="buckets visited per query")
    p.add_argument("--policy", default="best_first",
                   choices=["best_first", "joint"])
    p.add_argument("--nav-temp", default=None,
                   help="navigation softmax temperature: scalar or "
                        "per-level comma list (e.g. '1,4')")
    p.add_argument("--precision", default="default",
                   choices=["default", "highest", "int8"])
    p.add_argument("--no-rerank", action="store_true")
    p.add_argument("--max-batch", type=int, default=4096)
    p.add_argument("--max-wait-ms", type=float, default=2.0)
    p.add_argument("--dynamic", action="store_true",
                   help="enable POST /insert, /delete and /compact (wraps the "
                        "packed store in a DynamicIndex)")
    p.add_argument("--shard-devices", type=int, default=0,
                   help="shard the store over the first N mesh devices "
                        "(corpora past one chip's HBM; composes with "
                        "--dynamic via ShardedDynamicIndex)")
    args = p.parse_args(argv)

    import learnedmetricindex_tpu as lmi

    lmi.enable_compilation_cache()

    dyn = None
    if args.synthetic:
        index, data_prediction, data = _build_demo_index(
            args.synthetic, args.d, args.buckets
        )
    elif args.index and not args.data:
        # a mutable-deployment checkpoint carries its own corpus
        # (serve-time inserts exist nowhere else) — no --data needed
        from learnedmetricindex_tpu.index.serialization import (
            load_dynamic_index,
        )

        try:
            dyn = load_dynamic_index(args.index)
        except ValueError as e:
            p.error(str(e) + " (plain checkpoints also need --data)")
        args.dynamic = True
    else:
        if not args.index or not args.data:
            p.error("--index and --data are required (or use --synthetic N)")
        from learnedmetricindex_tpu.index.serialization import load_index

        index, data_prediction = load_index(args.index)
        if data_prediction is None:
            p.error(f"{args.index} was saved without data_prediction — "
                    "re-save with save_index(index, path, data_prediction)")
        if args.data.endswith((".h5", ".hdf5")):
            import h5py

            with h5py.File(args.data, "r") as f:
                data = np.asarray(f["emb"], dtype=np.float32)
        else:
            data = np.load(args.data).astype(np.float32)

    knobs = dict(
        k=args.k, n_buckets=args.n_buckets, policy=args.policy,
        nav_temp=(None if args.nav_temp is None else
                  (lambda ts: ts[0] if len(ts) == 1 else ts)(
                      [float(t) for t in str(args.nav_temp).split(",")])),
        precision=args.precision, rerank=not args.no_rerank,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
    )
    if dyn is not None:
        server = SearchServer(dyn, **knobs)
    elif args.shard_devices:
        from learnedmetricindex_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(args.shard_devices)
        if args.dynamic:
            from learnedmetricindex_tpu.parallel.sharded_mutation import (
                ShardedDynamicIndex,
            )

            server = SearchServer(
                ShardedDynamicIndex.from_built(
                    index, data, data_prediction, mesh=mesh
                ),
                **knobs,
            )
        else:
            store = index.get_sharded_store(data, data_prediction, mesh)
            server = SearchServer(index, store, **knobs)
    elif args.dynamic:
        from learnedmetricindex_tpu.index.mutation import DynamicIndex

        server = SearchServer(
            DynamicIndex.from_built(index, data, data_prediction), **knobs
        )
    else:
        store = index.get_bucket_store(data, data_prediction)
        server = SearchServer(index, store, **knobs)
    httpd = make_http_server(server, args.host, args.port)
    host, port = httpd.server_address[:2]
    endpoints = "POST /search, GET /healthz, GET /stats" + (
        ", POST /insert, POST /delete, POST /compact"
        if args.dynamic else ""
    )
    print(f"lmi-serve listening on http://{host}:{port} ({endpoints})",
          flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
        server.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
