"""Decompose the fused Pallas dispatch: kernel vs merge vs rerank vs
query gather/quantize, on the 8M flagship-statistics store.  Also A/B
chunk=4096 (fewer, wider work items: per-item fixed costs halve)."""
import functools
import os
import sys
import time

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
CHUNKS = [int(c) for c in (sys.argv[2].split(",") if len(sys.argv) > 2
                           else ["2048", "4096"])]
Q, V, K = 10_000, 4, 10
NB, D = 120, 768
NOISE = 0.45

import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from learnedmetricindex_tpu import native
from learnedmetricindex_tpu.index.bucket_store import (
    BucketStore,
    _gather_work_queries,
    _merge_pairs_dense,
    _rerank_exact_slots,
    build_scan_plan,
    scan_buckets,
)
from learnedmetricindex_tpu.ops.quantize import quantize_rows
from learnedmetricindex_tpu.ops.scan_kernel import (
    pallas_host_args,
    pallas_scan_pairs,
)

rng = np.random.default_rng(0)
centers = rng.normal(size=(NB, D)).astype(np.float32)
centers /= np.linalg.norm(centers, axis=1, keepdims=True)
centers_dev = jnp.asarray(centers)

w = rng.lognormal(0.0, 0.4, NB)
counts = np.floor(w / w.sum() * N).astype(np.int64)
counts[0] += N - counts.sum()

qc = rng.integers(0, NB, Q)
queries = centers[qc] + rng.normal(size=(Q, D)).astype(np.float32) * NOISE
queries /= np.linalg.norm(queries, axis=1, keepdims=True)
sims_q = queries @ centers.T
order = np.argsort(-sims_q, axis=1)[:, :V].astype(np.int64)
queries_dev = jnp.asarray(queries)


def build_store(chunk):
    nchunks = -(-counts // chunk)
    starts = np.concatenate([[0], np.cumsum(nchunks)]).astype(np.int32)
    total_chunks = int(starts[-1])
    bucket_ids = np.repeat(np.arange(NB), counts)
    ids_host = native.fill_slots_1based(
        bucket_ids, starts.astype(np.int64) * chunk, total_chunks * chunk
    )
    slot_bucket = np.repeat(
        np.repeat(np.arange(NB), nchunks), chunk
    ).astype(np.int32)
    BLKROWS = 262144

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def fill_block(buf, sbuf, key, start, sb, valid):
        noise = jax.random.normal(key, (BLKROWS, D), jnp.float32) * NOISE
        x = centers_dev[sb] + noise
        x /= jnp.linalg.norm(x, axis=1, keepdims=True)
        qq, sc = quantize_rows(x)
        qq = jnp.where(valid[:, None], qq, 0)
        sc = jnp.where(valid, sc, 0.0)
        return (
            jax.lax.dynamic_update_slice(buf, qq, (start, 0)),
            jax.lax.dynamic_update_slice(sbuf, sc, (start,)),
        )

    t0 = time.perf_counter()
    n_slots = total_chunks * chunk
    padded = -(-n_slots // BLKROWS) * BLKROWS
    sb_pad = np.zeros(padded, np.int32)
    sb_pad[:n_slots] = slot_bucket
    valid_pad = np.zeros(padded, bool)
    valid_pad[: len(ids_host)] = ids_host > 0
    buf = jnp.zeros((padded, D), jnp.int8)
    sbuf = jnp.zeros((padded,), jnp.float32)
    key = jax.random.PRNGKey(0)
    for s0 in range(0, padded, BLKROWS):
        key, sub = jax.random.split(key)
        buf, sbuf = fill_block(
            buf, sbuf, sub, jnp.int32(s0),
            jnp.asarray(sb_pad[s0 : s0 + BLKROWS]),
            jnp.asarray(valid_pad[s0 : s0 + BLKROWS]),
        )
    buf.block_until_ready()
    store = BucketStore(
        chunk_ids=jnp.asarray(ids_host.reshape(total_chunks, chunk)),
        bucket_chunk_start=starts,
        bucket_sizes=counts.astype(np.int32),
        chunk=chunk,
        n_buckets=NB,
        chunk_data=buf[:n_slots],
        chunk_scales=sbuf[:n_slots],
    )
    print(f"chunk={chunk}: store {total_chunks} chunks "
          f"({n_slots*D/2**30:.1f} GiB) filled in "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    return store


def med(fn, reps=5):
    """Median wall time with a FORCED VALUE READBACK per rep —
    block_until_ready alone is a free async enqueue on the axon relay
    (PERFORMANCE.md round-5 retraction), so each timed region ends by
    reducing the first output leaf to a host float."""
    fn()  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        leaf = jax.tree.leaves(r)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


for chunk in CHUNKS:
    store = build_store(chunk)
    qtile = 128
    plan = build_scan_plan(store, order, qtile=qtile)
    QP = len(plan.qidx)
    n_pairs = QP // qtile
    item_meta, item_chunk, w_real, scales_flat, pair_written = (
        pallas_host_args(store, plan, qtile, n_pairs)
    )
    qidx_dev = jnp.asarray(plan.qidx)
    meta_dev, chunk_dev, wr_dev = (
        jnp.asarray(item_meta), jnp.asarray(item_chunk), jnp.asarray(w_real)
    )
    W = len(item_meta)
    k_scan = K + 2

    # (f) query gather + quantize
    def gq():
        wq = _gather_work_queries(queries_dev, qidx_dev)
        return quantize_rows(wq)

    t_gq = med(gq)
    wq_q, wq_sc = gq()
    qsc2 = wq_sc.reshape(n_pairs, qtile)
    jax.block_until_ready([wq_q, qsc2])

    # (a) kernel only
    def kern():
        return pallas_scan_pairs(
            wq_q, meta_dev, chunk_dev,
            wr_dev, store.chunk_data, store.chunk_scales, qsc2,
            k=k_scan, qtile=qtile, chunk=chunk, n_pairs=n_pairs,
            compute="int8", gate="count",
        )

    t_kern = med(kern)
    cand_d, cand_slot = kern()
    jax.block_until_ready([cand_d, cand_slot])

    # (d) merge only
    QV = Q * V
    pair_rows_np = np.where(
        plan.pair_slot >= 0, plan.pair_slot // qtile, n_pairs
    ).astype(np.int32)
    lane_np = np.where(plan.pair_slot >= 0, plan.pair_slot % qtile, 0)
    pr_dev = jnp.asarray(pair_rows_np * qtile + lane_np)
    ok_dev = jnp.asarray(
        (plan.pair_slot >= 0) & pair_written[
            np.minimum(pair_rows_np, n_pairs)]
    )
    R = (n_pairs + 1) * qtile

    def merge():
        return _merge_pairs_dense(
            cand_d.reshape(R, k_scan), cand_slot.reshape(R, k_scan),
            pr_dev, ok_dev, k=k_scan, V=V,
        )

    t_merge = med(merge)
    md, ms = merge()
    jax.block_until_ready([md, ms])

    # (e) rerank only
    def rr():
        return _rerank_exact_slots(
            md, ms, queries_dev, store.chunk_data, store.chunk_scales,
            k=K,
        )

    t_rr = med(rr)

    # (b) full fused through scan_buckets (one dispatch)
    os.environ["LMI_SCAN_DEBUG"] = "0"

    def full():
        return scan_buckets(store, queries_dev, order, k=K,
                            engine="pallas", precision="int8",
                            rerank=True, rerank_margin=2)

    t_full = med(full, reps=4)

    def full_norr():
        return scan_buckets(store, queries_dev, order, k=K,
                            engine="pallas", precision="int8",
                            rerank=False, rerank_margin=2)

    t_norr = med(full_norr, reps=4)

    print(
        f"chunk={chunk}: W={W} | query-gather+quant {t_gq*1e3:.1f}ms | "
        f"kernel {t_kern*1e3:.1f}ms | merge {t_merge*1e3:.1f}ms | "
        f"rerank {t_rr*1e3:.1f}ms | FULL scan_buckets {t_full*1e3:.1f}ms "
        f"(no-rerank {t_norr*1e3:.1f}ms)",
        flush=True,
    )
    del store
    import gc

    gc.collect()

print("PROBE2 OK", flush=True)
