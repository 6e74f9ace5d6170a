"""Pallas fused bucket-scan kernel — phase 1 AND the cross-chunk merge.

One grid step = one work item: a (qtile × d) query tile against one
(chunk × d) bucket slab.  Everything the XLA path spreads across
fusions and HBM intermediates happens in one VMEM-resident kernel
(replacing the reference's per-bucket ``faiss.knn`` hot loop,
``search/li/LearnedIndex.py:360-368``):

    slab DMA (int8/f32, Mosaic double-buffered via the BlockSpec
    pipeline) → matmul (MXU) → per-column dequantization scale →
    padding/validity masks → **running top-k across all chunks of the
    (bucket, query-tile) pair** → one (qtile, k) candidate list per
    pair

Three structural wins over the XLA phase-1 (``bucket_store._scan_items``):

* the (qtile × chunk) distance block never exists in HBM — it lives in
  VMEM/registers between the MXU and the top-k;
* the kernel carries each pair's running top-k in a VMEM scratch
  accumulator and emits ONE candidate list per pair instead of one per
  chunk — the phase-2 sort-merge input shrinks by the chunks-per-bucket
  factor (~40× at 10M/120 buckets);
* **slab-residency grouping**: the plan orders items (bucket,
  tile-group, chunk, tile-in-group) with up to ``TILE_GROUP`` query
  tiles per group, so one slab DMA serves the whole group (consecutive
  items keep the same slab block index — the Mosaic pipeline skips the
  re-fetch) and the group's query tiles are cached in VMEM scratch.
  The ungrouped (bucket, tile, chunk) order re-reads every bucket's
  slabs once per tile (~2.6× the store's HBM bytes at the 10M
  flagship).  Measured A/B at 8M×768/int8 (bench_probe): results
  bit-identical, wall time NEUTRAL — the kernel is VPU-bound on the
  selection sweeps (~6.7 µs/item at qtile 128; nominal slab traffic
  runs at only ~27% of HBM speed because DMA fully overlaps compute),
  so the saved bytes buy headroom, not time, at flagship shapes.
  Grouping is kept because it makes slab traffic independent of the
  tiles-per-bucket ratio — the regime where visit-heavy sweeps or
  bf16/f32 stores WOULD become DMA-bound — at zero measured cost.
  Each pair's output row is written once, at its last-chunk item; all
  other items map their output block to the dummy row.  (Wider tiles
  do NOT help: qtile 256 doubles per-item sweep cost — selection is
  lane-parallel only across the native 128 lanes — measured 14.1
  µs/item, a net 1.4× slowdown at half the item count.)

Selection is a **cursor k-pass**: extraction j+1 takes the minimum
over elements strictly after extraction j's ``(value, row)`` pair in
lexicographic order, so the workspace is never masked or written back
between extractions (the round-1 formulation masked the winner with a
full-workspace write per extraction and re-extracted accumulator
entries through one-hot f32 reductions).  Ties break toward earlier
rows, matching the reference's stable order.  Extraction 0 fuses with
the distance materialization; insertion replaces the accumulator's
current per-lane maximum (the accumulator is unsorted; the phase-2
sort orders candidates).  A ``lax.while_loop`` gated on
"did any lane insert" was measured SLOWER than this fixed
``fori_loop`` (at k=12 over ~41-chunk buckets some lane inserts on
almost every chunk, so the gate never skips and its loop mechanics
cost ~2×) — keep the loop fixed-trip.

Candidate ids ride as int32 end-to-end (slot = chunk_base + argmin
row), so stores are bounded only by int32 — the round-1 f32 one-hot
design capped stores at 2²⁴ rows.

The XLA fallback remains the default off-TPU and for stores whose
shapes the kernel does not cover (d % 128 != 0, virtual stores).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ids are int32 throughout the kernel; the practical bound is the int32
# range (the round-1 kernel's f32 one-hot id reduction capped this at
# 2^24 — see module docstring)
MAX_PALLAS_ID = (1 << 31) - 1

# Slab-residency grouping: the plan orders work items
# (bucket, tile-group, chunk, tile-in-group), so one chunk's slab DMA
# serves up to TILE_GROUP query tiles before the next chunk streams in.
# The kernel keeps TILE_GROUP per-tile top-k accumulators plus the
# group's query tiles in VMEM scratch.  The ungrouped (bucket, tile,
# chunk) order re-reads every slab once per tile — ~T× the HBM traffic
# of the store itself at T tiles/bucket.  Measured at the flagship
# shape this is wall-time NEUTRAL (the kernel is VPU-bound on
# selection sweeps, DMA fully overlapped — see module docstring);
# grouping is kept for the DMA headroom it buys at visit-heavy or
# wide-dtype shapes.
TILE_GROUP = 8

# Packed per-item metadata (ONE int32 per item — SMEM scalar prefetch
# is capped near two W-sized arrays, see _kernel's comment):
#   meta = pair << 6 | tile_in_group << 2 | is_first_chunk << 1
#        | is_last_chunk
META_PAIR_SHIFT = 6
META_TILE_SHIFT = 2
META_TILE_MASK = 0xF  # TILE_GROUP ≤ 16
META_FIRST = 2
META_LAST = 1


def _kernel(
    # scalar prefetch (kept to TWO W-sized arrays + one scalar: these
    # live in SMEM, and five W-sized arrays crash the compiler near
    # W ≈ 60k — pair/tile-slot/first/last are bit-packed into one
    # int32 per item, validity comes from w_real)
    item_meta_ref,  # (W,) int32: pair<<6 | t_in_group<<2 | first<<1 | last
    item_chunk_ref,  # (W,) int32: chunk index per item
    w_real_ref,  # (1,) int32: items beyond this are padding
    # blocks
    qv_ref,  # (qtile, d) f32 — or int8 when compute_dtype is int8;
    #          maps to the item's OWN tile on first-chunk items (which
    #          cache it) and to the group's first tile otherwise (so
    #          consecutive non-first items never re-fetch)
    qscale_ref,  # (n_tiles, qtile) f32 — per-query dequant scales
    #              (ones unless compute_dtype is int8); FULL in VMEM
    slab_ref,  # (chunk, d) store dtype
    nscale_ref,  # (chunk,) f32: NEGATED dequant scale per slot
    obias_ref,  # (chunk,) f32: 1.0 on valid slots, +inf on padding —
    #             dists = raw·nscale (+·qscale) + obias materializes
    #             dequant, the 1−sim distance AND the padding-slot mask
    #             in two (three for int8) elementwise sweeps; the old
    #             mul / 1−sims / mask-or / select chain was ~4-6 (the
    #             kernel is VPU-sweep bound, PERFORMANCE.md roofline)
    # outputs (written once per pair, at its last-chunk item; non-last
    # items map to the dummy row, which absorbs the stale flushes)
    out_d_ref,  # (1, qtile, kpad) f32
    out_i_ref,  # (1, qtile, kpad) int32
    # scratch (acc_*/qcache persist across the group's chunks; rest
    # per item)
    acc_d_ref,  # (group·kpad, qtile) f32 — per-tile running top-k
    acc_i_ref,  # (group·kpad, qtile) i32 — per-tile slot ids (-1 = none)
    qcache_ref,  # (group·qtile, d) — the group's query tiles
    d_ref,  # (chunk, qtile) f32 — this item's distances (read-only
    #         after materialization: extractions never mask it)
    mprev_ref,  # (8, qtile) f32 — extraction cursor: last value
    rprev_ref,  # (8, qtile) i32 — extraction cursor: last row
    *,
    k: int,
    kpad: int,
    compute_dtype,
    gate: str,
):
    i = pl.program_id(0)
    meta = item_meta_ref[i]
    pair = meta >> META_PAIR_SHIFT
    t_slot = (meta >> META_TILE_SHIFT) & META_TILE_MASK
    is_first = (meta & META_FIRST) != 0
    is_last = (meta & META_LAST) != 0
    is_valid = i < w_real_ref[0]
    qtile = qv_ref.shape[0]
    acc_rows = pl.ds(t_slot * kpad, kpad)
    cache_rows = pl.ds(t_slot * qtile, qtile)

    @pl.when(is_first)
    def _():
        # first chunk of the group for this tile: cache the query tile
        # (qv_ref maps to the item's own tile exactly when first) and
        # reset the tile's accumulator slot
        qcache_ref[cache_rows, :] = qv_ref[:]
        acc_d_ref[acc_rows, :] = jnp.full((kpad, qtile), jnp.inf, jnp.float32)
        acc_i_ref[acc_rows, :] = jnp.full((kpad, qtile), -1, jnp.int32)

    # Envelope-padding items (i >= w_real — the device-plan path
    # compiles a static W envelope) skip the whole compute body:
    # no matmul, no materialization, no selection sweeps.  Their
    # meta word has no first/last flags, so accumulators and
    # outputs are untouched either way.
    @pl.when(is_valid)
    def _():
        # TRANSPOSED layout throughout: chunk rows on sublanes, queries on
        # lanes.  Lane-dimension min/argmin over a 2k-wide matrix makes
        # Mosaic's register allocator spill ~130 MB; the same reductions
        # over the sublane dimension are native (measured: 0.7 s vs OOM).
        tile = jnp.minimum(pair, qscale_ref.shape[0] - 1)
        qv_cached = qcache_ref[cache_rows, :]  # (qtile, d)
        if compute_dtype == jnp.int8:
            # int8×int8→int32 on the MXU: 2× the bf16 throughput and no
            # dequant cast of the slab.  Scales factor exactly:
            # <q, x> = (q_int · x_int) · q_scale · x_scale.
            sims = jax.lax.dot_general(
                slab_ref[:],
                qv_cached,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)  # (chunk, qtile)
        else:
            qv = qv_cached.astype(compute_dtype)  # (qtile, d)
            cd = slab_ref[:].astype(compute_dtype)  # (chunk, d)
            sims = jax.lax.dot_general(
                cd,
                qv,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                # f32 compute means FULL f32 (multi-pass MXU), matching the
                # XLA engine's Precision.HIGHEST — the default would still
                # run one bf16 pass even on f32 inputs
                precision=(
                    jax.lax.Precision.HIGHEST
                    if compute_dtype == jnp.float32
                    else jax.lax.Precision.DEFAULT
                ),
            )  # (chunk, qtile)
        chunk = sims.shape[0]
        # Distance + dequant + padding mask as ONE multiply-add chain:
        # dists = raw · (−scale) (· qscale) + obias, with obias = +inf
        # on padding slots.  Bitwise-identical to the former
        # 1 − raw·scale then mask-select (sign flip and x+1 round the
        # same as 1−x).  Per-lane invalidity needs NO mask at all:
        # padding query lanes (qidx −1) produce garbage confined to
        # their lane, and the merge's per-(query, visit) row gather
        # (``_merge_pairs_dense``) only ever reads REAL queries' rows;
        # padding WORK items are already excluded by the is_valid gate
        # around this body.  (Scales/bias arrive as 1-D blocks — 1-D
        # HBM arrays keep the compact T(1024) layout; a column array
        # would be tile-padded 128×: 4.9 GB at 10M slots.)
        nscale = nscale_ref[:].reshape(chunk, 1)
        dists = sims * nscale
        if compute_dtype == jnp.int8:
            dists = dists * qscale_ref[tile, :][None, :]
        dists = dists + obias_ref[:].reshape(chunk, 1)

        row = jax.lax.broadcasted_iota(jnp.int32, (chunk, qtile), dimension=0)
        put_row = jax.lax.broadcasted_iota(jnp.int32, (kpad, qtile), dimension=0)
        slot0 = item_chunk_ref[i] * chunk  # first slot id of this chunk

        def insert(m, am):
            """Insert each lane's winner (value m, chunk row am) into the
            tile's accumulator slot if it beats the lane's current k-th
            best; returns the per-lane win mask.  Ties keep the incumbent
            (reference stable-merge semantics: the earlier candidate
            wins)."""
            accd = acc_d_ref[acc_rows, :]
            acck = jnp.where(put_row < k, accd, -jnp.inf)
            tau = jnp.max(acck, axis=0)  # (qtile,) current k-th best
            win = m < tau
            amax = jnp.argmax(acck, axis=0).astype(jnp.int32)
            put = jnp.logical_and(put_row == amax[None, :], win[None, :])
            acc_d_ref[acc_rows, :] = jnp.where(put, m[None, :], accd)
            acc_i_ref[acc_rows, :] = jnp.where(
                put, (slot0 + am)[None, :], acc_i_ref[acc_rows, :]
            )
            return win

        def extract_next(_):
            """One ascending-cursor extraction + accumulator insert (the
            cursor makes extraction j+1 the minimum strictly after
            extraction j's ``(value, row)`` pair — no workspace masking or
            write-backs, stable tie order)."""
            d = d_ref[:]
            mp = mprev_ref[0, :]  # (qtile,)
            rp = rprev_ref[0, :]
            elig = jnp.logical_or(
                d > mp[None, :],
                jnp.logical_and(d == mp[None, :], row > rp[None, :]),
            )
            dv = jnp.where(elig, d, jnp.inf)
            m = jnp.min(dv, axis=0)
            am = jnp.argmin(dv, axis=0).astype(jnp.int32)
            insert(m, am)
            mprev_ref[:] = jnp.broadcast_to(m[None, :], (8, qtile))
            rprev_ref[:] = jnp.broadcast_to(am[None, :], (8, qtile))

        if gate == "fixed":
            # legacy fixed-trip loop: extraction 0 fused with the
            # materialization pass, k-1 further sweeps unconditionally
            m0 = jnp.min(dists, axis=0)  # (qtile,)
            am0 = jnp.argmin(dists, axis=0).astype(jnp.int32)
            insert(m0, am0)
            d_ref[:] = dists
            mprev_ref[:] = jnp.broadcast_to(m0[None, :], (8, qtile))
            rprev_ref[:] = jnp.broadcast_to(am0[None, :], (8, qtile))
            jax.lax.fori_loop(1, k, lambda j, c: (extract_next(None), 0)[1], 0)
        else:
            # COUNT-GATED selection: an element can enter the accumulator
            # only if it beats tau, the pair's current k-th best (inserts
            # only shrink tau, so the pre-insert tau bounds eligibility).
            # One cheap counting sweep bounds the extractions actually
            # needed; ascending-order extraction then visits exactly each
            # lane's cnt smallest elements (everything < tau IS the lane's
            # cnt-smallest prefix), capped at k (k ascending inserts
            # already realize the exact top-k of accumulator ∪ chunk).
            # After the pair's first chunk tau is tight and max-lane cnt is
            # typically 1-3 instead of k — ~4× fewer VPU sweeps per item.
            # (Distinct from the round-2 "skip chunk if no lane can
            # insert" gate, which never fired because SOME lane of 128
            # nearly always inserts; here the trip count itself shrinks.)
            acck = jnp.where(put_row < k, acc_d_ref[acc_rows, :], -jnp.inf)
            tau = jnp.max(acck, axis=0)  # (qtile,) current k-th best
            cnt = jnp.sum((dists < tau[None, :]).astype(jnp.int32), axis=0)
            trips = jnp.minimum(jnp.max(cnt), k)

            # zero-trip chunks (no element beats any lane's current
            # k-th best — common once tau is tight) skip the workspace
            # store AND the cursor init: one fewer full-matrix sweep
            @pl.when(trips > 0)
            def _():
                d_ref[:] = dists
                mprev_ref[:] = jnp.full((8, qtile), -jnp.inf, jnp.float32)
                rprev_ref[:] = jnp.full((8, qtile), -1, jnp.int32)
                jax.lax.while_loop(
                    lambda j: j < trips,
                    lambda j: (extract_next(None), j + 1)[1],
                    jnp.int32(0),
                )

    @pl.when(is_last)
    def _():
        # the pair's chunks are exhausted: flush its accumulator slot.
        # Non-last items leave the output untouched — their block maps
        # to the dummy row, which absorbs the stale buffer flushes.
        out_d_ref[0] = acc_d_ref[acc_rows, :].T
        out_i_ref[0] = acc_i_ref[acc_rows, :].T


@functools.partial(
    jax.jit,
    static_argnames=("k", "qtile", "chunk", "n_pairs", "compute",
                     "interpret", "gate"),
)
def pallas_scan_pairs(
    work_queries: jnp.ndarray,  # (QP, d) f32 — int8 for compute="int8"
    item_meta: jnp.ndarray,  # (W,) int32 packed: pair<<6 | t<<2 |
    #                first<<1 | last (padding items: n_pairs<<6)
    item_chunk: jnp.ndarray,  # (W,) int32
    w_real: jnp.ndarray,  # (1,) int32: first padding item index
    chunk_data: jnp.ndarray,  # (n_slots, d) flat packed store
    chunk_scales_flat: jnp.ndarray,  # (n_slots,) f32, 0.0 = pad slot
    query_scales2d: jnp.ndarray = None,  # (n_tiles, qtile) f32 dequant
    #                scales of int8 queries (compute="int8" only)
    *,
    k: int,
    qtile: int,
    chunk: int,
    n_pairs: int,
    compute: str = "bf16",
    interpret: bool = False,
    gate: str = "count",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused phase 1: one (qtile, k) candidate list per (bucket, tile)
    pair, already merged across the bucket's chunks.

    Work items must arrive in the plan's (bucket, tile-group, chunk,
    tile-in-group) order (``build_scan_plan``): one slab residency
    serves the whole group, and each pair's output row is written at
    its last-chunk item.

    ``compute``: "bf16" (one MXU pass), "f32" (HIGHEST, multi-pass) or
    "int8" — int8×int8→int32 MXU (2× bf16 throughput; requires an int8
    store AND int8 ``work_queries`` with ``query_scales2d``).

    Returns ``(cand_d (n_pairs+1, qtile, k) f32, cand_slot (n_pairs+1,
    qtile, k) int32)`` — SLOT indices (-1 = none), to be mapped to
    object ids by the caller; the last row is the dummy pair that
    absorbs padding items.  Candidate lists are exact top-k per pair
    but UNSORTED (phase 2's stable sort orders them).
    """
    W = item_chunk.shape[0]
    d = work_queries.shape[1]
    kpad = max(16, -(-k // 8) * 8)  # sublane-aligned accumulator rows
    compute_dtype = {
        "bf16": jnp.bfloat16, "f32": jnp.float32, "int8": jnp.int8,
    }[compute]
    qtile_n = work_queries.shape[0] // qtile
    if query_scales2d is None:
        query_scales2d = jnp.ones((qtile_n, qtile), jnp.float32)

    n_tiles = query_scales2d.shape[0]
    # Fold dequant sign and the padding-slot mask into the per-slot
    # columns ONCE per dispatch (two cheap elementwise passes over the
    # flat scales; the kernel then needs no select sweep — see _kernel)
    nscale_flat = -chunk_scales_flat
    obias_flat = jnp.where(chunk_scales_flat == 0.0, jnp.inf, 1.0)

    def qv_index(i, im, ic, wr):
        # first-chunk items fetch their OWN tile (and cache it); later
        # items map to the group's first tile, so consecutive items of
        # the group's remaining chunks never change the block index —
        # the pipeline fetches each group's queries once, not per chunk
        m = im[i]
        pair = m >> META_PAIR_SHIFT
        t = (m >> META_TILE_SHIFT) & META_TILE_MASK
        own = (m & META_FIRST) != 0
        return (
            jnp.minimum(jnp.where(own, pair, pair - t), n_tiles - 1),
            0,
        )

    def out_index(i, im, ic, wr):
        # pairs flush at their last-chunk item; every other item maps
        # to the dummy row, which absorbs the stale buffer flushes
        m = im[i]
        return (
            jnp.where((m & META_LAST) != 0, m >> META_PAIR_SHIFT, n_pairs),
            0,
            0,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(W,),
        in_specs=[
            pl.BlockSpec((qtile, d), qv_index),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full query scales
            pl.BlockSpec((chunk, d), lambda i, im, ic, wr: (ic[i], 0)),
            pl.BlockSpec((chunk,), lambda i, im, ic, wr: (ic[i],)),
            pl.BlockSpec((chunk,), lambda i, im, ic, wr: (ic[i],)),
        ],
        out_specs=[
            pl.BlockSpec((1, qtile, kpad), out_index),
            pl.BlockSpec((1, qtile, kpad), out_index),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_GROUP * kpad, qtile), jnp.float32),
            pltpu.VMEM((TILE_GROUP * kpad, qtile), jnp.int32),
            pltpu.VMEM((TILE_GROUP * qtile, d), work_queries.dtype),
            pltpu.VMEM((chunk, qtile), jnp.float32),
            pltpu.VMEM((8, qtile), jnp.float32),
            pltpu.VMEM((8, qtile), jnp.int32),
        ],
    )

    out_shapes = [
        jax.ShapeDtypeStruct((n_pairs + 1, qtile, kpad), jnp.float32),
        jax.ShapeDtypeStruct((n_pairs + 1, qtile, kpad), jnp.int32),
    ]
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        )
    cand_d, cand_i = pl.pallas_call(
        functools.partial(
            _kernel, k=k, kpad=kpad, compute_dtype=compute_dtype,
            gate=gate,
        ),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        **kwargs,
    )(item_meta, item_chunk, w_real,
      work_queries, query_scales2d, chunk_data, nscale_flat, obias_flat)
    return cand_d[:, :, :k], cand_i[:, :, :k]


def pad_item_meta(n_pairs: int) -> int:
    """Metadata word for a padding work item: the dummy pair, no
    first/last flags — it neither resets an accumulator slot nor
    flushes a real output row."""
    return n_pairs << META_PAIR_SHIFT


def pallas_host_args(store, plan, qtile: int, n_pairs: int):
    """Host-side prep shared by the kernel's call paths: per-item
    prefetch arrays from a
    :class:`~learnedmetricindex_tpu.index.bucket_store.ScanPlan` (whose
    work list is (bucket, tile-group, chunk, tile-in-group)-ordered —
    the slab-residency order the kernel requires), the flat scales
    array, and the written-pair mask.

    Returns ``(item_meta, item_chunk, w_real, scales_flat,
    pair_written)``; ``pair_written`` masks output rows of pairs whose
    bucket has zero chunks (never written — uninitialized memory) and
    the dummy pair row ``n_pairs`` that absorbs padding items.
    """
    import numpy as np

    W = len(plan.item_chunk)
    item_meta = plan.item_meta.astype(np.int32)
    item_chunk = plan.item_chunk.astype(np.int32)
    if W == 0:
        item_meta = np.array([pad_item_meta(n_pairs)], np.int32)
        item_chunk = np.zeros(1, np.int32)

    pair_written = np.zeros(n_pairs + 1, bool)
    if W:
        pair_written[item_meta >> META_PAIR_SHIFT] = True
    pair_written[n_pairs] = False

    if store.chunk_scales is not None:
        scales_flat = store.chunk_scales.reshape(-1)
    else:
        # unscaled store: 1.0 on valid slots, 0.0 marks padding
        scales_flat = (store.chunk_ids.reshape(-1) > 0).astype(jnp.float32)
    return (
        item_meta,
        item_chunk,
        np.array([W], np.int32),
        scales_flat,
        pair_written,
    )
