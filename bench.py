#!/usr/bin/env python
"""Benchmark: LMI build + 10k-query search vs the reference baseline.

Reference headline (BASELINE.md): LAION 10M, 120 leaf buckets, MLP-4
(1×512), visit 4 buckets → recall@10 = 0.914, search = 220 s / 10k
queries, build = 20,828 s on one CPU core.

This benchmark reproduces that *configuration* on one TPU chip with
seeded synthetic clustered embeddings (unit-norm Gaussian mixture —
LAION itself needs a network download; the workload shape, a 10M×768
device-resident corpus, is the same).  The ENTIRE corpus lives on the
device; host↔device traffic is limited to small index structures (this
environment's transfer path runs at tens of MB/s, so the virtual
bucket-store / virtual-grouping design is also what makes the benchmark
feasible at all).

Prints exactly ONE JSON line:

    {"metric": ..., "value": <search seconds / 10k queries>,
     "unit": "s", "vs_baseline": <220 / value>, ...}
"""

import argparse
import functools
import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def gen_blobs_on_device(n, d, n_clusters, seed, n_queries, dtype, block=500_000):
    """Generate a unit-norm clustered corpus directly INTO a persistent
    device buffer (donated updates; nothing crosses the host).

    ``dtype="int8"`` quantizes per row (ops/quantize.py) and returns
    ``((values int8, scales f32), queries)``."""
    import jax
    import jax.numpy as jnp

    from learnedmetricindex_tpu.ops.quantize import quantize_rows

    key = jax.random.PRNGKey(seed)
    ckey, key = jax.random.split(key)
    centers = jax.random.normal(ckey, (n_clusters, d), jnp.float32)
    centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)
    # total deviation norm ~0.45 of the unit center norm: clustered but
    # overlapping, CLIP-like (a raw per-dim std would be isotropic mush)
    noise = 0.45 / float(np.sqrt(d))

    @functools.partial(jax.jit, static_argnames=("rows", "out_dtype"))
    def make_block(bkey, rows, out_dtype=jnp.float32):
        akey, nkey = jax.random.split(bkey)
        assign = jax.random.randint(akey, (rows,), 0, n_clusters)
        x = centers[assign] + noise * jax.random.normal(nkey, (rows, d), jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return x.astype(out_dtype)

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("start",))
    def write_block(buf, blk, *, start):
        return jax.lax.dynamic_update_slice(
            buf, blk.astype(buf.dtype), (start, 0)
        )

    @functools.partial(jax.jit, donate_argnums=(0, 1), static_argnames=("start",))
    def write_block_q(buf, sbuf, blk, *, start):
        q, sc = quantize_rows(blk)
        return (
            jax.lax.dynamic_update_slice(buf, q, (start, 0)),
            jax.lax.dynamic_update_slice(sbuf, sc, (start,)),
        )

    int8 = jnp.dtype(dtype) == jnp.int8
    gen_dtype = jnp.float32 if int8 else dtype
    buf = jnp.zeros((n, d), dtype=jnp.int8 if int8 else dtype)
    sbuf = jnp.zeros((n,), jnp.float32) if int8 else None
    made = 0
    while made < n:
        rows = min(block, n - made)
        key, bkey = jax.random.split(key)
        blk = make_block(bkey, rows, gen_dtype)
        if int8:
            buf, sbuf = write_block_q(buf, sbuf, blk, start=made)
        else:
            buf = write_block(buf, blk, start=made)
        made += rows
    buf.block_until_ready()
    key, qkey = jax.random.split(key)
    queries = make_block(qkey, n_queries).astype(jnp.float32)
    if int8:
        return (buf, sbuf), queries
    return buf, queries


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=9_000_000)
    p.add_argument("--d", type=int, default=768)
    p.add_argument("--buckets", type=int, default=120)
    p.add_argument("--visit", type=int, default=4)
    p.add_argument("--queries", type=int, default=10_000)
    p.add_argument("--gt-queries", type=int, default=1_000)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--model", default="MLP-4")
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--dtype", default="int8",
                   choices=["float32", "bfloat16", "int8"])
    p.add_argument("--store", default="packed", choices=["virtual", "packed"])
    p.add_argument("--chunk", type=int, default=2048)
    p.add_argument("--latent-clusters", type=int, default=256)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--approx-recall", type=float, default=0.95,
                   help="per-item approx top-k recall target; 0 = exact. "
                        "0.95 + the exact rerank measures ~0.18s faster "
                        "than the exact k-pass at 9M with recall 0.9998")
    p.add_argument("--rerank-margin", type=int, default=2)
    p.add_argument("--quick", action="store_true",
                   help="small smoke config (200K x 96)")
    args = p.parse_args()

    if args.quick:
        args.n, args.d, args.latent_clusters = 200_000, 96, 64
        args.queries, args.gt_queries = 2_000, 500
    result_extra = {"dtype": args.dtype, "store": args.store}

    import jax
    import jax.numpy as jnp

    # persistent compilation cache: build/search wall-clock is otherwise
    # dominated by fresh-process XLA compiles (the sort-merge alone
    # compiles for ~2 minutes)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/lmi-jax-cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as e:  # pragma: no cover
        log(f"compilation cache unavailable: {e}")

    log(f"devices: {jax.devices()}")
    import learnedmetricindex_tpu as lmi
    from learnedmetricindex_tpu.ops.knn import exact_knn, recall

    log(f"generating {args.n/1e6:g}M x {args.d} corpus on device ({args.dtype}) ...")
    t0 = time.perf_counter()
    data, queries = gen_blobs_on_device(
        args.n, args.d, args.latent_clusters, 2023, args.queries,
        args.dtype,
    )
    if isinstance(data, tuple):
        values, scales = data
    else:
        values, scales = data, None
    log(f"  corpus ready in {time.perf_counter() - t0:.1f}s "
        f"({values.nbytes/1e9:.1f} GB on device)")

    log(f"ground truth for {args.gt_queries} queries (device-resident) ...")
    t0 = time.perf_counter()
    _, gt = exact_knn(values, queries[: args.gt_queries], k=10,
                      tile_rows=131_072, row_scales=scales)
    log(f"  gt in {time.perf_counter() - t0:.1f}s")

    cfg = lmi.BuildConfiguration(
        "kmeans",
        args.epochs,
        args.model,
        args.lr,
        [args.buckets],
        seed=2023,
        batch_size=args.batch_size,
        chunk_size=args.chunk,
        dtype="bfloat16" if args.dtype == "int8" else args.dtype,
    )
    log(f"building index ({args.buckets} buckets, {args.model}, "
        f"{args.epochs} epochs, batch {args.batch_size}) ...")
    index, pred, n_buckets, build_t, cluster_t = lmi.LearnedIndexBuilder(
        data, cfg
    ).build()
    log(f"  build {build_t:.1f}s (cluster {cluster_t:.1f}s), {n_buckets} buckets")

    store = None
    if args.store == "packed":
        log("packing device store ...")
        t0 = time.perf_counter()
        store = index.prepare_packed_store(data, pred)
        # the packed store is self-contained: free the corpus
        index._store_cache = {}
        del data, values, scales
        data = values = scales = None
        import gc as _gc

        _gc.collect()
        log(f"  packed {store.nbytes()/1e9:.1f} GB in {time.perf_counter()-t0:.1f}s"
            " (corpus dropped)")

    log("bucket store + warmup search ...")
    t0 = time.perf_counter()
    approx = args.approx_recall if args.approx_recall > 0 else None
    _, warm_anns, warm_t = index.search(
        data, queries, data, queries, pred, cfg.n_categories,
        n_buckets=args.visit, k=10, approx_recall=approx, store=store,
        rerank_margin=args.rerank_margin,
    )
    log(f"  warmup (incl. store build + compile): {time.perf_counter() - t0:.1f}s "
        f"[{ {k: round(v, 3) for k, v in warm_t.items()} }]")

    times = []
    for rep in range(args.reps):
        _, anns, t = index.search(
            data, queries, data, queries, pred, cfg.n_categories,
            n_buckets=args.visit, k=10, approx_recall=approx, store=store,
            rerank_margin=args.rerank_margin,
        )
        times.append(t["search"])
        log(f"  rep {rep}: search={t['search']:.3f}s "
            f"(inference={t['inference']:.3f}s scan={t['seq_search']:.3f}s)")
    search_s = float(np.median(times))
    value = search_s * (10_000 / args.queries)

    r = recall(anns[: args.gt_queries], gt, 10)
    log(f"recall@10 ({args.visit}/{n_buckets} buckets): {r:.4f}")

    baseline_s = 220.0
    result = {
        "metric": (
            f"search_s_per_10k_queries[{args.n/1e6:g}Mx{args.d}, "
            f"{args.visit}/{args.buckets} buckets, {args.model}]"
        ),
        "value": round(value, 4),
        "unit": "s",
        "vs_baseline": round(baseline_s / value, 2),
        "recall_at_10": round(r, 4),
        "build_s": round(build_t, 2),
        "build_vs_baseline": round(20828.0 / build_t, 2),
        "queries": args.queries,
        "qps": round(args.queries / search_s, 1),
        **result_extra,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
