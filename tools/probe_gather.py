"""A/B the Pallas row-gather kernels vs XLA's native gather at the
three fused-dispatch stage shapes (PERFORMANCE.md decomposition):
query gather (46k rows from a 10k×768 f32 table), merge gather (40k
tiny rows), rerank gather (120k rows from the 8M-slot int8 store)."""
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# repo root on sys.path (PYTHONPATH must stay unset under axon)
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

print("devices:", jax.devices(), flush=True)

from learnedmetricindex_tpu.ops.gather_kernel import gather_rows  # noqa: E402

INTERP = jax.default_backend() != "tpu"


def med(fn, reps=7):
    fn()  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def ab(name, table, idx, block_rows=512, strategy="auto"):
    t_xla = med(lambda: jax.jit(lambda t, i: t[i])(table, idx))
    t_pal = med(
        lambda: gather_rows(table, idx, block_rows=block_rows,
                            interpret=INTERP, strategy=strategy)
    )
    ok = bool(
        jnp.array_equal(
            gather_rows(table, idx, block_rows=block_rows,
                        interpret=INTERP, strategy=strategy),
            table[jnp.clip(idx, 0, table.shape[0] - 1)],
        )
    )
    print(
        f"{name} [{strategy}]: xla {t_xla*1e3:7.2f} ms | pallas "
        f"{t_pal*1e3:7.2f} ms ({t_xla/t_pal:4.1f}x) | "
        f"{idx.shape[0]/t_pal/1e6:6.2f} Mrow/s | equal={ok}",
        flush=True,
    )


rng = np.random.default_rng(0)
k = jax.random.PRNGKey(0)

# stage 1: work-query gather (VMEM-resident table)
Q, QP, D = 10_000, 46_080, 768
queries = jax.random.normal(k, (Q, D), jnp.float32)
qidx = jnp.asarray(rng.integers(0, Q, QP).astype(np.int32))
ab("query-gather  (10k x 768 f32 -> 46k)", queries, qidx)

# stage 2: merge gather (tiny rows) — padded to one 128-lane row
R, QV, KK = 40_960, 40_000, 32
cand = jax.random.randint(k, (R, 128), 0, 1 << 20, jnp.int32)
pr = jnp.asarray(rng.integers(0, R, QV).astype(np.int32))
ab("merge-gather  (41k x 128 i32 -> 40k)", cand, pr)
# dtype test: identical bytes viewed as f32 — is Mosaic's VMEM row
# copy dtype-dependent?
ab("merge-gather  (41k x 128 f32 view)",
   jax.lax.bitcast_convert_type(cand, jnp.float32), pr)
# and the reverse: the (fast) query-gather shape as int32
ab("query-gather  (10k x 768 i32 view)",
   jax.lax.bitcast_convert_type(queries, jnp.int32), qidx)

# width threshold: Mosaic's VMEM row copy vectorizes only for f32 at
# SOME widths (768 fast at ~BW, 128/192/256/384/512/1024 scalarize at
# ~540 ns/row) — isolate what is special about 768
for w in (640, 768, 896, 1536):
    tw = jax.random.normal(k, (10_000, w), jnp.float32)
    ab(f"width-test    (10k x {w:4d} f32 -> 46k)", tw, qidx)
# block_rows sensitivity at the fast width
for br in (128, 256):
    tw = jax.random.normal(k, (10_000, 768), jnp.float32)
    t = med(lambda: gather_rows(tw, qidx, block_rows=br, interpret=INTERP))
    print(f"  768 f32 block_rows={br}: {t*1e3:7.2f} ms", flush=True)

# wide-row variant AS F32: gather 8-row GROUPS of the merge table
# viewed as f32 (bit-preserving copies), select row via one-hot
wide_f = jax.lax.bitcast_convert_type(
    cand.reshape(R // 8, 8 * 128), jnp.float32
)


def merge_wide(w, p):
    g = gather_rows(w, p // 8, interpret=INTERP)  # (QV, 1024) f32
    gi = jax.lax.bitcast_convert_type(g, jnp.int32)
    sel = jax.nn.one_hot(p % 8, 8, dtype=jnp.int32)  # (QV, 8)
    return jnp.einsum(
        "jm,jmc->jc", sel, gi.reshape(-1, 8, 128),
        preferred_element_type=jnp.int32,
    )


t_w = med(lambda: merge_wide(wide_f, pr))
okw = bool(jnp.array_equal(merge_wide(wide_f, pr), cand[pr]))
print(
    f"merge-gather  wide-group f32 variant: {t_w*1e3:7.2f} ms | "
    f"{QV/t_w/1e6:6.2f} Mrow/s | equal={okw}",
    flush=True,
)

# stage 3: rerank gather (HBM table) — aligned-block DMA vs XLA
NS = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
MR = 120_000
# random.bits, not randint: randint materializes an int32
# intermediate (4x the table = 24 GB at 8M x 768) before the cast
store = jax.lax.bitcast_convert_type(
    jax.random.bits(k, (NS, D), jnp.uint8), jnp.int8
)
slots = jnp.asarray(rng.integers(0, NS, MR).astype(np.int32))
# pallas timing only — the XLA jit(t[i]) baseline OOMs HBM at this
# table size on one chip (probe_fused already measured it: ~33 ms at
# the flagship shape)
t = med(lambda: gather_rows(store, slots, interpret=INTERP,
                            strategy="hbm"))
# correctness vs per-row dynamic slices (an XLA t[idx] gather on the
# 6 GB int8 table OOMs the chip — it materializes huge intermediates)
out_chk = np.asarray(
    gather_rows(store, slots[:128], interpret=INTERP, strategy="hbm")
)
ok = all(
    np.array_equal(
        out_chk[j],
        np.asarray(jax.lax.dynamic_slice_in_dim(
            store, int(slots[j]), 1
        ))[0],
    )
    for j in range(0, 128, 17)
)
print(
    f"rerank-gather ({NS/1e6:g}M x 768 i8 -> 120k) [hbm]: pallas "
    f"{t*1e3:7.2f} ms | {MR/t/1e6:6.2f} Mrow/s | equal={ok}",
    flush=True,
)
for br in (256, 1024):
    t = med(lambda: gather_rows(store, slots, block_rows=br,
                                interpret=INTERP, strategy="hbm"))
    print(f"  block_rows={br}: {t*1e3:7.2f} ms", flush=True)

print("PROBE_GATHER OK", flush=True)
