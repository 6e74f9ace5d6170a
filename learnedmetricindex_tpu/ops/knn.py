"""Exact brute-force kNN and the recall metric.

This is the correctness oracle of the framework: one tiled MXU matmul +
``lax.top_k`` per data tile, replacing the reference's two exact paths —
``sklearn`` cosine over the full matrix (``search/li/Baseline.py:11-16``,
``search/li/utils.py:10-11``) and ``faiss.knn`` with
``METRIC_INNER_PRODUCT`` inside bucket scans
(``search/li/LearnedIndex.py:360-368``).

Distance convention follows the reference exactly: ``dist = 1 - <q, x>``
on L2-normalized vectors (``LearnedIndex.py:368``), and neighbor ids are
**1-based** ``uint32`` (``search/search.py:190-191``).

The recall definition matches the SISAP evaluator as replicated in the
reference notebook (``01-Introduction.ipynb`` cell 31):
``mean over queries of |top-k ∩ gt-k| / k``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

METRICS = ("inner_product", "cosine", "l2")


def _dist_tile(queries: jnp.ndarray, tile: jnp.ndarray, metric: str) -> jnp.ndarray:
    """Distance block (n_queries, tile_rows); smaller = closer for all metrics.

    Full f32 precision: this is the correctness oracle, and on TPU the
    default matmul precision is bf16 passes (±2e-3 on unit vectors),
    enough to permute near-tied neighbors.
    """
    sims = jnp.dot(
        queries,
        tile.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if metric in ("inner_product", "cosine"):
        return 1.0 - sims
    if metric == "l2":
        q2 = jnp.sum(queries * queries, axis=1, keepdims=True)
        x2 = jnp.sum(tile * tile, axis=1)[None, :]
        return q2 - 2.0 * sims + x2
    raise ValueError(f"Unknown metric: {metric}")


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def _merge_block(
    best_d: jnp.ndarray,  # (Q, k) running best
    best_i: jnp.ndarray,  # (Q, k) running best ids (0-based)
    queries: jnp.ndarray,  # (Q, d)
    block: jnp.ndarray,  # (B, d) padded data block
    base_id: jnp.ndarray,  # scalar: global row index of block[0]
    n_valid: jnp.ndarray,  # scalar: valid rows in this block
    *,
    k: int,
    metric: str,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold one data block into the running top-k (stable: the running
    best is placed first, so earlier rows win ties — matching the
    reference's stable merge, LearnedIndex.py:134)."""
    d = _dist_tile(queries, block, metric)
    ids = base_id + jax.lax.broadcasted_iota(jnp.int32, d.shape, dimension=1)
    d = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) >= n_valid, jnp.inf, d
    )
    cat_d = jnp.concatenate([best_d, d], axis=1)
    cat_i = jnp.concatenate([best_i, ids], axis=1)
    neg_d, pos = jax.lax.top_k(-cat_d, k)
    return -neg_d, jnp.take_along_axis(cat_i, pos, axis=1)


def exact_knn(
    data,
    queries,
    k: int = 10,
    metric: str = "inner_product",
    tile_rows: int = 8192,
    row_scales=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact k-nearest-neighbor search, streamed over data blocks.

    Host data is fed to the device ``tile_rows`` rows at a time, so the
    full dataset never needs a device copy (10M×768 works on one chip).
    ``row_scales``: per-row dequantization scales for int8 data.
    Returns ``(dists (n_q, k) float32, ids (n_q, k) uint32 1-based)``,
    sorted ascending by distance, ties broken toward smaller row index.
    """
    assert metric in METRICS
    if not isinstance(queries, jax.Array):
        queries = np.asarray(queries, dtype=np.float32)
    n, d = data.shape
    assert k >= 1 and queries.shape[1] == d

    tile_rows = int(min(tile_rows, max(8, n)))
    q_dev = jnp.asarray(queries)
    best_d = jnp.full((queries.shape[0], k), jnp.inf, dtype=jnp.float32)
    best_i = jnp.zeros((queries.shape[0], k), dtype=jnp.int32)

    for start in range(0, n, tile_rows):
        block = data[start : start + tile_rows]
        rows = block.shape[0]
        sc = None if row_scales is None else row_scales[start : start + rows]
        if isinstance(block, jax.Array):
            # device-resident data: slice/pad/cast stay on device
            if rows < tile_rows:
                block = jnp.pad(block, ((0, tile_rows - rows), (0, 0)))
            block = block.astype(jnp.float32)
            if sc is not None:
                scj = jnp.asarray(sc, dtype=jnp.float32)
                if rows < tile_rows:
                    scj = jnp.pad(scj, (0, tile_rows - rows))
                block = block * scj[:, None]
        else:
            block = np.asarray(block, dtype=np.float32)
            if sc is not None:
                block = block * np.asarray(sc, np.float32)[:, None]
            if rows < tile_rows:
                padded = np.zeros((tile_rows, d), dtype=np.float32)
                padded[:rows] = block
                block = padded
            block = jnp.asarray(block)
        best_d, best_i = _merge_block(
            best_d,
            best_i,
            q_dev,
            block,
            jnp.int32(start),
            jnp.int32(rows),
            k=k,
            metric=metric,
        )

    dists = np.asarray(best_d)
    ids = np.asarray(best_i)
    return dists, (ids + 1).astype(np.uint32)


def recall(nns, gt_nns, k: int = 10) -> float:
    """SISAP recall: mean over queries of ``|top-k ∩ gt-k| / k``
    (cf. reference ``01-Introduction.ipynb`` cell 31).

    Vectorized sort-based set intersection — one ``O(Q·k log k)``
    pass, no per-row Python loop (this metric runs once per benchmark
    rep over 10k queries).  Duplicate ids within a row are counted
    once, matching ``np.intersect1d`` set semantics.
    """
    nns = np.asarray(nns)[:, :k]
    gt = np.asarray(gt_nns)[:, :k]
    assert nns.shape[0] == gt.shape[0]
    Q = nns.shape[0]
    if Q == 0:
        return 0.0

    def _dedup_sorted(a, sentinel_offset):
        # sort each row; overwrite repeated values with unique,
        # never-matching negative sentinels (ids are 1-based positives)
        s = np.sort(a.astype(np.int64), axis=1)
        dup = np.zeros(s.shape, dtype=bool)
        dup[:, 1:] = s[:, 1:] == s[:, :-1]
        sent = -(np.arange(s.shape[1], dtype=np.int64) + sentinel_offset)
        return np.where(dup, sent[None, :], s)

    s_n = _dedup_sorted(nns, 1)
    s_g = _dedup_sorted(gt, k + 1)
    # merge the two rows; a value present in both appears as exactly one
    # adjacent equal pair with different sources after a stable sort
    merged = np.concatenate([s_n, s_g], axis=1)
    src = np.concatenate(
        [np.zeros_like(s_n, dtype=bool), np.ones_like(s_g, dtype=bool)], axis=1
    )
    order = np.argsort(merged, axis=1, kind="stable")
    m_s = np.take_along_axis(merged, order, axis=1)
    src_s = np.take_along_axis(src, order, axis=1)
    both = (m_s[:, 1:] == m_s[:, :-1]) & (src_s[:, 1:] != src_s[:, :-1])
    return float(both.sum()) / (Q * k)
