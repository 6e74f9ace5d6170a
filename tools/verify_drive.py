"""Verify drive: public library surface end-to-end on the real TPU.

Maintained drive script for the /verify skill (run from /root/repo,
no PYTHONPATH, real chip).  Covers the library's flagship flow plus
the surfaces most recently touched; extend the tail sections as new
features land rather than creating root-level scratch files.
"""
import os
import sys

# repo root on sys.path (PYTHONPATH must stay unset: any value breaks
# axon PJRT plugin discovery — skill notes)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

print("devices:", jax.devices(), flush=True)

import learnedmetricindex_tpu as lmi
from learnedmetricindex_tpu.data import synthetic_blobs
from learnedmetricindex_tpu.ops import exact_knn, recall

# persistent compile cache (TPU-gated): repeat verify runs skip the
# ~8 min of remote first-compiles
lmi.enable_compilation_cache()

data, queries = synthetic_blobs(60000, 768, 500, n_clusters=32, seed=2023)
cfg = lmi.BuildConfiguration("kmeans", 30, "MLP", 0.01, [10], seed=2023,
                             chunk_size=2048)
index, pred, n_buckets, build_t, cluster_t = lmi.LearnedIndexBuilder(
    data, cfg
).build()
print(f"build {build_t:.1f}s ({n_buckets} buckets)", flush=True)

store = index.get_bucket_store(data, pred)
_, gt = exact_knn(data, queries, k=10)

# default engine (zero-sync device plan on TPU), full visit == exact
from learnedmetricindex_tpu.index import bucket_store as bs

d_all, n_all, _ = index.search(None, queries, None, queries, pred,
                               n_buckets=n_buckets, k=10, store=store)
print("engine:", bs.LAST_ENGINE, flush=True)
assert bs.LAST_ENGINE == "pallas-fused-devplan", bs.LAST_ENGINE
r_full = recall(np.asarray(n_all), gt, 10)
print("devplan full-visit recall:", r_full, flush=True)
assert r_full == 1.0, r_full

# partial visit: device-plan engine vs host-plan pallas vs XLA engine
from learnedmetricindex_tpu.index.bucket_store import scan_buckets

d_p, n_p, _ = index.search(None, queries, None, queries, pred,
                           n_buckets=3, k=10, store=store)
assert bs.LAST_ENGINE == "pallas-fused-devplan"
order, _ = index.compute_bucket_order(queries, 3)
d_h, n_h = scan_buckets(store, queries, order, k=10, engine="pallas",
                        rerank=True, rerank_margin=6)
np.testing.assert_array_equal(np.asarray(n_p), n_h)
np.testing.assert_array_equal(np.asarray(d_p), d_h)
print("devplan == host-plan pallas at visit=3 (bitwise): OK", flush=True)
d_x, n_x = scan_buckets(store, queries, order, k=10, engine="xla",
                        rerank=True, rerank_margin=6)
np.testing.assert_array_equal(n_h, n_x)
np.testing.assert_allclose(d_h, d_x, rtol=1e-5, atol=1e-5)
print("pallas == xla engine at visit=3: OK", flush=True)

# ---- Pallas row-gather kernel on the real chip (both strategies) ----
import jax.numpy as jnp

from learnedmetricindex_tpu.ops import gather_kernel as gk

rng = np.random.default_rng(3)
small = rng.normal(size=(20000, 768)).astype(np.float32)  # VMEM-resident
idx = rng.integers(0, 20000, 12345).astype(np.int32)
out = gk.gather_rows(jnp.asarray(small), jnp.asarray(idx))
np.testing.assert_array_equal(np.asarray(out), small[idx])
print("gather_rows VMEM strategy on TPU: OK", flush=True)

# HBM aligned-block DMA strategy (f32: int32-view width must be a
# lane multiple — int8 d=768 downgrades to XLA by design)
big_f = rng.normal(size=(120000, 768)).astype(np.float32)
outf = gk.gather_rows(jnp.asarray(big_f), jnp.asarray(idx),
                      strategy="hbm")
np.testing.assert_array_equal(np.asarray(outf), big_f[idx])
print("gather_rows HBM-DMA strategy on TPU: OK", flush=True)
# int8 via the int32 bit-view (VMEM-resident table)
big_i8 = rng.integers(-100, 100, (40000, 768)).astype(np.int8)
out8 = gk.gather_rows(jnp.asarray(big_i8), jnp.asarray(idx % 40000))
np.testing.assert_array_equal(
    np.asarray(out8), big_i8[idx % 40000]
)
print("gather_rows VMEM int8 (i32 view) on TPU: OK", flush=True)

# ---- sharded mutation on a REAL 1-device TPU mesh (functional
# default: donation OFF, memoized jits — ADVICE r4 fixes) ----
from learnedmetricindex_tpu.parallel.mesh import create_mesh
from learnedmetricindex_tpu.parallel.sharded_index import shard_packed_store
from learnedmetricindex_tpu.parallel.sharded_mutation import (
    ShardedDynamicIndex,
)

mesh = create_mesh(1)
dyn = ShardedDynamicIndex.from_built(index, data, pred, mesh=mesh,
                                     chunk=2048)
assert dyn.donate is False
extra, _ = synthetic_blobs(3000, 768, 1, n_clusters=32, seed=99)
ids = dyn.insert(extra)
assert len(ids) == 3000 and ids.min() == len(data) + 1
corpus = np.concatenate([data, extra])
_, gt2 = exact_knn(corpus, queries, k=10)
_, nns2, _ = dyn.search(queries, n_buckets=index.n_buckets, k=10)
r2 = recall(np.asarray(nns2), gt2, 10)
print("sharded-dynamic post-insert full-visit recall:", r2, flush=True)
assert r2 == 1.0, r2

n_del = dyn.delete(ids[::2])
assert n_del == 1500
d3a, n3a, _ = dyn.search(queries, n_buckets=index.n_buckets, k=10)
stats = dyn.compact()
print("compact:", stats, flush=True)
assert stats["chunks_after"] <= stats["chunks_before"]
d3b, n3b, _ = dyn.search(queries, n_buckets=index.n_buckets, k=10)
np.testing.assert_array_equal(np.asarray(n3a), np.asarray(n3b))
np.testing.assert_array_equal(np.asarray(d3a), np.asarray(d3b))
assert not np.isin(np.asarray(n3a), ids[::2]).any()
print("sharded mutate/compact on TPU: OK", flush=True)

# promotion path on the real chip
dyn1 = lmi.DynamicIndex.from_built(index, data, pred, chunk=2048)
dyn1.insert(extra[:500])
dyn1.delete(np.arange(1, 100))
da, na, _ = dyn1.search(queries[:100], n_buckets=index.n_buckets, k=10)
sh = shard_packed_store(dyn1.store, mesh)
dyn2 = ShardedDynamicIndex(index, sh, next_id=dyn1.next_id)
db, nb, _ = dyn2.search(queries[:100], n_buckets=index.n_buckets, k=10)
np.testing.assert_array_equal(np.asarray(na), np.asarray(nb))
print("shard_packed_store promotion on TPU: OK", flush=True)

print("VERIFY OK", flush=True)
