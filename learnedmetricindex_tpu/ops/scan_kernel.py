"""Pallas fused bucket-scan kernel (phase 1 of the batched scan).

One grid step = one work item: a (qtile × d) query tile against one
(chunk × d) bucket slab.  Everything the XLA path does across several
fusions happens in a single VMEM-resident kernel:

    slab DMA (int8/bf16, Mosaic double-buffered via the BlockSpec
    pipeline) → matmul (MXU) → per-column scale multiply (dequantization
    applied to similarities, not slabs) → padding / validity masks →
    exact k-pass top-k (min + argmin + mask on the VPU) → (qtile, k)
    candidate write-out

The slab, id column, scale column, and query tile are selected per grid
step through scalar-prefetched index arrays (``PrefetchScalarGridSpec``)
— the canonical Pallas pattern for data-dependent block access (cf. the
block-sparse / MoE kernels in the TPU Pallas guide).

Candidate ids are materialized inside the kernel with a one-hot
float32 reduction, which is exact for object ids < 2²⁴ (16.7M rows per
shard); larger shards must use the XLA path or shard the store.

The XLA fallback (:func:`bucket_store._scan_items`) remains the default
off-TPU; tests run this kernel in interpreter mode on tiny shapes.

STATUS: experimental.  Compiles and validates against the XLA path for
chunk ≤ ~512; at the flagship shapes (chunk=2048, d=768, k=12) the
Mosaic compile of the unrolled k-pass loop does not terminate in
reasonable time in this environment (a ``fori_loop`` formulation fails
on dynamic lane-dim output indexing: "index in dimension 2 must be a
multiple of 128").  The XLA phase-1 path is the production default; it
reaches the same fused structure through ``dynamic_slice`` + einsum +
the k-pass top-k and is within ~2× of the HBM roofline.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_PALLAS_ID = 1 << 24  # one-hot f32 id reduction exactness limit


def _kernel(
    # scalar prefetch
    item_chunk_ref,  # (W,) int32: chunk index per item
    item_qtile_ref,  # (W,) int32: query-tile index per item
    item_valid_ref,  # (W,) int32: 1 = live item
    # blocks
    qv_ref,  # (qtile, d) f32
    qidx_ref,  # (n_tiles, qtile) int32 — FULL array in VMEM
    slab_ref,  # (chunk, d) store dtype
    ids_ref,  # (chunk, 1) int32
    scales_ref,  # (chunk, 1) f32 (all-ones when unscaled)
    # outputs
    out_d_ref,  # (1, qtile, k)
    out_i_ref,  # (1, qtile, k)
    *,
    k: int,
):
    i = pl.program_id(0)
    qv = qv_ref[:]  # (qtile, d) f32
    cd = slab_ref[:].astype(jnp.float32)  # (chunk, d)
    sims = jax.lax.dot_general(
        qv,
        cd,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (qtile, chunk)
    sims = sims * scales_ref[:, 0][None, :]
    dists = 1.0 - sims

    ids = ids_ref[:, 0]  # (chunk,)
    qi = qidx_ref[item_qtile_ref[i], :]  # (qtile,)
    # Mosaic only supports minor-dim insertion for 32-bit types, so the
    # per-row mask goes through int32 rather than a bool reshape.
    dists = jnp.where((ids == 0)[None, :], jnp.inf, dists)
    qbad = (qi < 0).astype(jnp.int32)[:, None]  # (qtile, 1) int32
    dists = jnp.where(qbad > 0, jnp.inf, dists)
    dists = jnp.where(item_valid_ref[i] == 0, jnp.inf, dists)

    col = jax.lax.broadcasted_iota(jnp.int32, dists.shape, dimension=1)
    ids_f = ids.astype(jnp.float32)[None, :]  # exact for ids < 2^24

    # k-pass top-k, statically unrolled (Mosaic requires static lane
    # indices for the (qtile, k) output writes)
    d = dists
    out_d_cols = []
    out_i_cols = []
    for j in range(k):
        m = jnp.min(d, axis=1)  # (qtile,)
        am = jnp.argmin(d, axis=1).astype(jnp.int32)  # (qtile,)
        sel = col == am[:, None]
        idsel = jnp.sum(jnp.where(sel, ids_f, 0.0), axis=1).astype(jnp.int32)
        out_d_cols.append(m)
        out_i_cols.append(jnp.where(jnp.isinf(m), 0, idsel))
        if j < k - 1:
            d = jnp.where(sel, jnp.inf, d)
    out_d_ref[0] = jnp.stack(out_d_cols, axis=1)
    out_i_ref[0] = jnp.stack(out_i_cols, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("k", "qtile", "chunk", "interpret"),
)
def pallas_scan_items(
    work_queries: jnp.ndarray,  # (QP, d) f32, QP multiple of qtile
    qidx2d: jnp.ndarray,  # (QP // qtile, qtile) int32
    item_chunk: jnp.ndarray,  # (W,) int32
    item_qtile: jnp.ndarray,  # (W,) int32 (q_start // qtile)
    item_valid: jnp.ndarray,  # (W,) int32
    chunk_data: jnp.ndarray,  # (n_slots, d) flat packed store
    chunk_ids2d: jnp.ndarray,  # (n_slots, 1) int32
    chunk_scales2d: jnp.ndarray,  # (n_slots, 1) f32
    *,
    k: int,
    qtile: int,
    chunk: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    W = item_chunk.shape[0]
    d = work_queries.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(W,),
        in_specs=[
            pl.BlockSpec((qtile, d), lambda i, ic, iq, iv: (iq[i], 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full qidx2d
            pl.BlockSpec((chunk, d), lambda i, ic, iq, iv: (ic[i], 0)),
            pl.BlockSpec((chunk, 1), lambda i, ic, iq, iv: (ic[i], 0)),
            pl.BlockSpec((chunk, 1), lambda i, ic, iq, iv: (ic[i], 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, qtile, k), lambda i, ic, iq, iv: (i, 0, 0)),
            pl.BlockSpec((1, qtile, k), lambda i, ic, iq, iv: (i, 0, 0)),
        ],
    )

    out_shapes = [
        jax.ShapeDtypeStruct((W, qtile, k), jnp.float32),
        jax.ShapeDtypeStruct((W, qtile, k), jnp.int32),
    ]
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    cand_d, cand_i = pl.pallas_call(
        functools.partial(_kernel, k=k),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        **kwargs,
    )(item_chunk, item_qtile, item_valid, work_queries, qidx2d,
      chunk_data, chunk_ids2d, chunk_scales2d)
    # per-candidate query ids (row r of item w → qidx2d[item_qtile[w], r])
    cand_q = qidx2d[item_qtile].reshape(W * qtile)
    return (
        cand_d.reshape(W * qtile, k),
        cand_i.reshape(W * qtile, k),
        cand_q,
    )
