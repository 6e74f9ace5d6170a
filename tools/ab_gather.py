"""IN-SITU A/B of the Pallas gather kernels inside the fused dispatch.

Microbenchmarks are meaningless on this rig: the axon relay's
``block_until_ready`` is a free async enqueue, so standalone kernel
timings read 0.03–30 ms for the same op depending on queue state
(tools/probe_gather.py history).  The only trustworthy number is a
full ``scan_buckets`` call, which materializes its result on the host
(np.asarray readback) — so this A/B interleaves full dispatches with
``LMI_GATHER_MODE=xla`` vs ``kernel`` on the same store, same session,
and reports per-mode medians plus the pairwise delta.

Usage: python tools/ab_gather.py [N] [reps] [precision]
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 7
PREC = sys.argv[3] if len(sys.argv) > 3 else "int8"
Q, V, K = 10_000, 4, 10
NB, D = 120, 768
NOISE = 0.45
CHUNK = 2048

import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

import learnedmetricindex_tpu as lmi

lmi.enable_compilation_cache()

from learnedmetricindex_tpu import native  # noqa: E402
from learnedmetricindex_tpu.index.bucket_store import (  # noqa: E402
    BucketStore,
    scan_buckets,
)
from learnedmetricindex_tpu.ops.quantize import quantize_rows  # noqa: E402

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
order = np.argsort(-(queries @ centers.T), axis=1)[:, :V].astype(np.int64)
queries_dev = jnp.asarray(queries)


def build_store(chunk):
    # identical on-device fill to tools/probe_fused.py
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
    print(f"store: {total_chunks} chunks ({n_slots*D/2**30:.1f} GiB) "
          f"filled in {time.perf_counter()-t0:.1f}s", flush=True)
    return store


store = build_store(CHUNK)


def run():
    return scan_buckets(store, queries_dev, order, k=K, engine="pallas",
                        precision=PREC, rerank=True, rerank_margin=2)


MODES = ["xla", "kernel"]
times = {m: [] for m in MODES}
base = {}
for m in MODES:  # compile both variants up front
    os.environ["LMI_GATHER_MODE"] = m
    base[m] = run()
np.testing.assert_array_equal(base["xla"][1], base["kernel"][1])
print("ids bitwise-identical across modes: OK", flush=True)

for r in range(REPS):
    for m in MODES:
        os.environ["LMI_GATHER_MODE"] = m
        t0 = time.perf_counter()
        run()
        times[m].append(time.perf_counter() - t0)
    print(
        f"rep {r}: xla {times['xla'][-1]*1e3:7.1f} ms | "
        f"kernel {times['kernel'][-1]*1e3:7.1f} ms",
        flush=True,
    )

for m in MODES:
    a = np.array(times[m])
    print(
        f"{m:6s}: median {np.median(a)*1e3:7.1f} ms | "
        f"min {a.min()*1e3:7.1f} | max {a.max()*1e3:7.1f}",
        flush=True,
    )
d = np.array(times["xla"]) - np.array(times["kernel"])
print(
    f"pairwise delta (xla - kernel): median {np.median(d)*1e3:+.1f} ms",
    flush=True,
)
print("AB_GATHER OK", flush=True)
