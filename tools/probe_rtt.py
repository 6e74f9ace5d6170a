"""Separate relay round-trip cost from device compute.

(a) no-op dispatch RTT; (b) the fused scan repeated 8x inside ONE
jitted call -> true per-scan device time; (c) pipelined dispatches
(no intermediate readback) -> amortized serving cost."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

# ---- (a) dispatch RTT ----
tiny = jnp.zeros((8, 128), jnp.float32)


@jax.jit
def noop(x):
    return x + 1.0


noop(tiny).block_until_ready()
ts = []
for _ in range(10):
    t0 = time.perf_counter()
    noop(tiny).block_until_ready()
    ts.append(time.perf_counter() - t0)
print(f"no-op dispatch+block RTT: median {np.median(ts)*1e3:.1f}ms "
      f"min {min(ts)*1e3:.1f}ms", flush=True)
ts = []
for _ in range(10):
    t0 = time.perf_counter()
    _ = float(jnp.sum(noop(tiny)))
    ts.append(time.perf_counter() - t0)
print(f"no-op dispatch+readback RTT: median {np.median(ts)*1e3:.1f}ms",
      flush=True)

# ---- build the flagship-statistics store (8M) ----
import os
import sys

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
Q, V, K = 10_000, 4, 10
NB, CHUNK, D = 120, 2048, 768
NOISE = 0.45

from learnedmetricindex_tpu import native
from learnedmetricindex_tpu.index.bucket_store import (
    BucketStore,
    _pack_plan_blob,
    _scan_fused_pallas,
    _sticky_quantize,
    build_scan_plan,
    scan_buckets,
)
from learnedmetricindex_tpu.ops.quantize import quantize_rows
from learnedmetricindex_tpu.ops.scan_kernel import pallas_host_args

rng = np.random.default_rng(0)
centers = rng.normal(size=(NB, D)).astype(np.float32)
centers /= np.linalg.norm(centers, axis=1, keepdims=True)
centers_dev = jnp.asarray(centers)
w = rng.lognormal(0.0, 0.4, NB)
counts = np.floor(w / w.sum() * N).astype(np.int64)
counts[0] += N - counts.sum()
nchunks = -(-counts // CHUNK)
starts = np.concatenate([[0], np.cumsum(nchunks)]).astype(np.int32)
total_chunks = int(starts[-1])
bucket_ids = np.repeat(np.arange(NB), counts)
ids_host = native.fill_slots_1based(
    bucket_ids, starts.astype(np.int64) * CHUNK, total_chunks * CHUNK
)
slot_bucket = np.repeat(np.repeat(np.arange(NB), nchunks), CHUNK).astype(
    np.int32
)
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


n_slots = total_chunks * CHUNK
padded = -(-n_slots // BLKROWS) * BLKROWS
sb_pad = np.zeros(padded, np.int32)
sb_pad[:n_slots] = slot_bucket
valid_pad = np.zeros(padded, bool)
valid_pad[: len(ids_host)] = ids_host > 0
buf = jnp.zeros((padded, D), jnp.int8)
sbuf = jnp.zeros((padded,), jnp.float32)
key = jax.random.PRNGKey(0)
t0 = time.perf_counter()
for s0 in range(0, padded, BLKROWS):
    key, sub = jax.random.split(key)
    buf, sbuf = fill_block(
        buf, sbuf, sub, jnp.int32(s0),
        jnp.asarray(sb_pad[s0 : s0 + BLKROWS]),
        jnp.asarray(valid_pad[s0 : s0 + BLKROWS]),
    )
buf.block_until_ready()
print(f"store filled in {time.perf_counter()-t0:.1f}s", flush=True)
store = BucketStore(
    chunk_ids=jnp.asarray(ids_host.reshape(total_chunks, CHUNK)),
    bucket_chunk_start=starts,
    bucket_sizes=counts.astype(np.int32),
    chunk=CHUNK,
    n_buckets=NB,
    chunk_data=buf[:n_slots],
    chunk_scales=sbuf[:n_slots],
)
qc = rng.integers(0, NB, Q)
queries = centers[qc] + rng.normal(size=(Q, D)).astype(np.float32) * NOISE
queries /= np.linalg.norm(queries, axis=1, keepdims=True)
order = np.argsort(-(queries @ centers.T), axis=1)[:, :V].astype(np.int64)
queries_dev = jnp.asarray(queries)

# host-side plan (as scan_buckets builds it)
qtile = 128
plan = build_scan_plan(store, order, qtile=qtile)
QP = len(plan.qidx)
n_pairs = QP // qtile
item_meta, item_chunk, w_real, scales_flat, pair_written = pallas_host_args(
    store, plan, qtile, n_pairs
)
pair_rows_np = np.where(
    plan.pair_slot >= 0, plan.pair_slot, n_pairs * qtile
).astype(np.int32)
ok_np = (plan.pair_slot >= 0) & pair_written[
    np.minimum(pair_rows_np // qtile, n_pairs)
]
blob = _pack_plan_blob(plan.qidx, item_meta, item_chunk, w_real,
                       pair_rows_np, ok_np)
blob_dev = jnp.asarray(blob)
ids_flat_dev = store.chunk_ids.reshape(-1)
W = len(item_meta)
kw = dict(W=W, k_scan=K + 2, k=K, qtile=qtile, chunk=CHUNK,
          n_pairs=n_pairs, compute="int8", interpret=False, rerank=True,
          n_visits=V)

# one fused dispatch, wall
jax.block_until_ready(_scan_fused_pallas(
    blob_dev, store.chunk_data, store.chunk_scales, ids_flat_dev,
    queries_dev, **kw))
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    jax.block_until_ready(_scan_fused_pallas(
        blob_dev, store.chunk_data, store.chunk_scales, ids_flat_dev,
        queries_dev, **kw))
    ts.append(time.perf_counter() - t0)
t_one = float(np.median(ts))
print(f"fused dispatch wall: {t_one*1e3:.1f}ms", flush=True)

# (c) pipelined: dispatch 8 without blocking, block at the end
t0 = time.perf_counter()
outs = [
    _scan_fused_pallas(blob_dev, store.chunk_data, store.chunk_scales,
                       ids_flat_dev, queries_dev, **kw)
    for _ in range(8)
]
jax.block_until_ready(outs)
t_pipe = (time.perf_counter() - t0) / 8
print(f"pipelined x8: {t_pipe*1e3:.1f}ms per dispatch (device-bound)",
      flush=True)

# zero-sync device-plan path (order device-resident as navigation
# leaves it)
from learnedmetricindex_tpu.index.bucket_store import scan_buckets_device

order_dev = jnp.asarray(order.astype(np.int32))
jax.block_until_ready(order_dev)
r = scan_buckets_device(store, queries_dev, order_dev, k=K,
                        precision="int8", rerank=True, rerank_margin=2)
assert r is not None
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    r = scan_buckets_device(store, queries_dev, order_dev, k=K,
                            precision="int8", rerank=True, rerank_margin=2)
    ts.append(time.perf_counter() - t0)
print(f"scan_buckets_device wall: {np.median(ts)*1e3:.1f}ms", flush=True)
d_dev_o, i_dev_o = r

# full scan_buckets wall for reference
os.environ.pop("LMI_SCAN_DEBUG", None)
d_, i_ = scan_buckets(store, queries_dev, order, k=K, engine="pallas",
                      precision="int8", rerank=True, rerank_margin=2)
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    d_, i_ = scan_buckets(store, queries_dev, order, k=K, engine="pallas",
                          precision="int8", rerank=True, rerank_margin=2)
    ts.append(time.perf_counter() - t0)
print(f"scan_buckets wall: {np.median(ts)*1e3:.1f}ms", flush=True)
print("RTT PROBE OK", flush=True)
