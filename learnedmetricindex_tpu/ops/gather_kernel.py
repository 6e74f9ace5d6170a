"""Pallas row-gather kernels — the XLA:TPU gather replacement.

XLA:TPU lowers ``table[idx]`` row gathers to a serial per-row DMA chain
(~0.3–0.7 µs/row measured through ``tools/probe_fused.py``), which made
three stages of the fused search dispatch latency-bound rather than
bandwidth-bound (PERFORMANCE.md "Fused dispatch decomposition"): the
work-query gather (~27 ms), the dense-merge row gather (~29 ms) and the
rerank candidate gather (~33 ms) against ~80 ms of actual kernel.

Two strategies, selected by table size:

* **VMEM-resident table** (``_gather_vmem``): when the table fits in
  VMEM next to the pipeline buffers, load it ONCE (one contiguous DMA
  at full HBM bandwidth) and serve every output row with an on-chip
  dynamic row copy — no HBM latency on the critical path at all.  The
  work-query table (10k × 768 f32 ≈ 30 MB) and the merge candidate
  table (≈ 40k × 32 int32 ≈ 5 MB) both qualify at flagship shapes.
* **Pipelined HBM DMA** (``_gather_hbm``): when the table cannot fit
  (the 10M-slot packed store), keep it in HBM and fetch ALIGNED ROW
  BLOCKS through a ``DEPTH``-deep semaphore ring so many fetches are
  in flight at once — replacing XLA's serial latency chain with a
  pipelined one.  Mosaic rejects single-row HBM slices ("Slice shape
  along dimension 0 must be aligned to tiling (8)", measured on v5e),
  so each candidate row costs one (ALIGN, d) block DMA into VMEM
  scratch plus an on-chip row copy; the traffic inflation (8× f32 /
  32× int8) is noise against HBM bandwidth — the latency chain was
  the problem, not bytes.  This strategy is opt-in
  (``strategy="hbm"``) until the on-chip probe shows it beating the
  XLA gather; ``strategy="auto"`` falls back to ``table[idx]`` for
  tables past the VMEM budget.

Both kernels share the calling convention: ``idx`` is scalar-prefetched
into SMEM (`PrefetchScalarGridSpec`) so DMA source addresses are known
before the body runs; out-of-range indices must be clamped by the
caller (``gather_rows`` clamps).  The replaced stages mask invalid rows
downstream exactly as they did with the XLA gather.

Reference anchor: these gathers exist to feed the in-bucket exact
scan that replaces the reference's per-bucket ``faiss.knn`` hot loop
(``search/li/LearnedIndex.py:360-368``); the reference itself has no
counterpart for any of them (single-dispatch search is a TPU-side
design).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# HBM row fetches in flight per grid step.  Sized so the ring covers
# the per-DMA latency (~1 µs) at the per-row issue cadence; deeper
# rings showed no further win in the probe and cost semaphores.
DMA_DEPTH = 16

# Default output rows per grid step.  Large enough to amortize the
# pipeline's per-step overhead, small enough that (rows, d) blocks fit
# comfortably next to a VMEM-resident table.
BLOCK_ROWS = 512


def _vmem_gather_kernel(idx_ref, table_ref, out_ref, *, rows: int):
    base = pl.program_id(0) * rows

    def body(j, _):
        r = idx_ref[base + j]
        out_ref[pl.ds(j, 1), :] = table_ref[pl.ds(r, 1), :]
        return 0

    # Mosaic lowers fori_loop at unroll=1 or full unroll only; partial
    # unroll is rejected (and full unroll of 512 copies blows compile)
    jax.lax.fori_loop(0, rows, body, 0)


def _hbm_gather_kernel(
    idx_ref, table_ref, out_ref, blk, sem, *, rows: int, align: int
):
    base = pl.program_id(0) * rows
    n = table_ref.shape[0]

    def blk_start(r):
        # aligned block containing row r, clamped so the DMA never
        # reads past the table (callers pre-clamp r to [0, n)); the
        # multiply comes AFTER the min so Mosaic can statically prove
        # the slice start is a multiple of the 8-sublane tiling
        return jnp.minimum(r // align, n // align - 1) * align

    def dma(j):
        r = idx_ref[base + j]
        slot = j % DMA_DEPTH
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(blk_start(r), align), :],
            blk.at[slot],
            sem.at[slot],
        )

    # warm the ring, then steady-state: start block j+DEPTH, wait block
    # j, copy the wanted row out of the landed block
    jax.lax.fori_loop(
        0, min(DMA_DEPTH, rows), lambda j, _: (dma(j).start(), 0)[1], 0
    )

    def body(j, _):
        # wait + copy out BEFORE starting the refill: DMA j+DEPTH
        # lands in the same ring slot this step reads
        dma(j).wait()
        r = idx_ref[base + j]
        # row extraction as a one-hot select-sum over the (align, d)
        # block: a dynamic sublane slice is rejected by Mosaic for
        # packed dtypes ("cannot statically prove index is a multiple
        # of 8" for int8), while this is a handful of vector ops.
        # Exactly one row survives the mask, so the sum is exact; the
        # select rides in integer space so float bit patterns
        # (-0.0, NaN payloads) survive untouched.
        # (kernels only ever see f32 or int32 — gather_rows normalizes
        # packed dtypes to an int32 bit-view before the call)
        block = blk[j % DMA_DEPTH]  # (align, d) — leading dim is untiled
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (align, 1), 0)
            == r - blk_start(r)
        )
        dt = block.dtype
        bi = jax.lax.bitcast_convert_type(block, jnp.int32)
        row = jnp.sum(jnp.where(sel, bi, 0), axis=0, keepdims=True)
        out_ref[pl.ds(j, 1), :] = jax.lax.bitcast_convert_type(row, dt)

        @pl.when(j + DMA_DEPTH < rows)
        def _():
            dma(j + DMA_DEPTH).start()

        return 0

    jax.lax.fori_loop(0, rows, body, 0)


def _row_align(dtype) -> int:
    """Minimum dim-0 slice granularity for an HBM DMA: 8 sublanes.
    Kernels only see 4-byte dtypes — ``gather_rows`` normalizes packed
    dtypes (int8/int16/bf16) to an int32 bit-view first, because
    Mosaic rejects dynamic single-row reads and writes of
    sublane-packed layouts."""
    return 8


@functools.partial(
    jax.jit, static_argnames=("block_rows", "vmem_table", "interpret")
)
def _gather_rows_impl(
    table: jnp.ndarray,  # (N, d)
    idx: jnp.ndarray,  # (M,) int32, M % block_rows == 0, pre-clamped
    *,
    block_rows: int,
    vmem_table: bool,
    interpret: bool,
):
    M = idx.shape[0]
    d = table.shape[1]
    grid = M // block_rows

    if vmem_table:
        kernel = functools.partial(_vmem_gather_kernel, rows=block_rows)
        in_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        scratch = []
    else:
        align = _row_align(table.dtype)
        kernel = functools.partial(
            _hbm_gather_kernel, rows=block_rows, align=align
        )
        in_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [
            pltpu.VMEM((DMA_DEPTH, align, d), table.dtype),
            pltpu.SemaphoreType.DMA((DMA_DEPTH,)),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[in_spec],
        out_specs=[
            pl.BlockSpec((block_rows, d), lambda i, idx_ref: (i, 0))
        ],
        scratch_shapes=scratch,
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((M, d), table.dtype)],
        interpret=interpret,
        **kwargs,
    )(idx, table)
    return out


# VMEM budget for the resident-table strategy: the table shares VMEM
# with the (block_rows, d) output pipeline buffers; 64 MB leaves half
# of a v5e's 128 MB for those and Mosaic's own use.
VMEM_TABLE_BYTES = 64 * 1024 * 1024


def _as_i32_rows(table: jnp.ndarray) -> jnp.ndarray:
    """Bit-preserving (N, d·isz/4) int32 view of a (N, d) table whose
    rows are 4-byte divisible.  Mosaic rejects dynamic single-row
    reads AND writes of sublane-packed dtypes (int8/int16: "cannot
    statically prove index is a multiple of 8"), so the kernels run
    entirely in the int32 domain; callers bitcast the output back."""
    isz = table.dtype.itemsize
    if table.dtype == jnp.int32:
        return table
    if isz == 4:
        return jax.lax.bitcast_convert_type(table, jnp.int32)
    n, d = table.shape
    ratio = 4 // isz
    return jax.lax.bitcast_convert_type(
        table.reshape(n, d // ratio, ratio), jnp.int32
    )


def _from_i32_rows(out32: jnp.ndarray, dtype, d: int) -> jnp.ndarray:
    isz = jnp.dtype(dtype).itemsize
    if dtype == jnp.int32:
        return out32
    if isz == 4:
        return jax.lax.bitcast_convert_type(out32, dtype)
    return jax.lax.bitcast_convert_type(out32, dtype).reshape(
        out32.shape[0], d
    )


def gather_rows(
    table: jnp.ndarray,
    idx: jnp.ndarray,
    *,
    block_rows: int = BLOCK_ROWS,
    interpret: bool = False,
    strategy: str = "auto",
) -> jnp.ndarray:
    """``table[idx]`` as a Pallas kernel: ``(N, d)[(M,)] -> (M, d)``.

    ``strategy="auto"`` uses the VMEM-resident kernel when the table
    fits the budget and plain XLA ``table[idx]`` otherwise;
    ``"vmem"``/``"hbm"`` force a kernel, ``"xla"`` forces the
    fallback.  ``idx`` is clamped to ``[0, N)``; callers mask invalid
    rows downstream (the same contract the XLA gathers had).  Rows
    must be 4-byte divisible for the kernel paths (non-f32 dtypes run
    in an int32 bit-view); callers fall back to XLA otherwise (see
    :func:`gather_rows_ok`).
    """
    n = table.shape[0]
    d = table.shape[1]
    M = idx.shape[0]
    idx = jnp.clip(idx.astype(jnp.int32), 0, n - 1)
    if strategy == "auto":
        strategy = (
            "vmem"
            if table.size * table.dtype.itemsize <= VMEM_TABLE_BYTES
            else "xla"
        )
    if strategy == "hbm":
        if n < 8:
            strategy = "vmem"  # too small for one aligned block DMA
        elif (d * table.dtype.itemsize) % (4 * 128) != 0 or n % 8 != 0:
            # the HBM block DMA slices [b:b+8, :] out of the padded
            # int32-view memref; a partial-lane-tile width (e.g.
            # int8 d=768 → 192 i32 lanes) is rejected by Mosaic, and
            # a non-8-multiple table leaves an unreachable tail block
            strategy = "xla"
    if strategy == "xla":
        return table[idx]
    orig_dtype = table.dtype
    if orig_dtype != jnp.float32:
        table = _as_i32_rows(table)
    pad = (-M) % block_rows
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros(pad, jnp.int32)])
    out = _gather_rows_impl(
        table,
        idx,
        block_rows=block_rows,
        vmem_table=(strategy == "vmem"),
        interpret=interpret,
    )
    if orig_dtype != jnp.float32:
        out = _from_i32_rows(out, orig_dtype, d)
    return out[:M] if pad else out


def gather_rows_ok(table: jnp.ndarray) -> bool:
    """Shape gate for the kernel paths: rows must be viewable as whole
    int32 lanes (the kernels run packed dtypes in an int32 bit-view)."""
    return (table.shape[1] * table.dtype.itemsize) % 4 == 0
