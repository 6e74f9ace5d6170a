"""Jitted Lloyd's k-means.

TPU-native replacement for the reference clustering registry
(``search/li/clustering/__init__.py:9-17``) and its two backends —
``faiss.Kmeans`` (``clustering/faiss_kmeans.py:8-24``, the default, seed
2023, 25 iterations) and sklearn ``KMeans`` configured to mimic faiss
(``clustering/scikit_kmeans.py:8-29``: ``init="random"``,
``max_iter=25``, ``n_init=1``).

Design (everything under one ``jit``):

* init = k distinct data points sampled with a seeded ``jax.random`` key
  (faiss's "random" init);
* assignment = tiled ``||x - c||² = ||x||² - 2 x·c + ||c||²`` matmul +
  argmin per tile (MXU), accumulated with a ``lax.scan`` so 10M×768
  never materializes an (n, k) matrix;
* update = per-tile one-hot matmul partial sums (MXU) — under a sharded
  data layout XLA turns the accumulation into a ``psum`` over the mesh;
* empty clusters are deterministically re-seeded by splitting the
  largest cluster (faiss does the same, non-deterministically).

Labels match the reference contract: ``int32`` in ``[0, k)``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pad_rows(x: np.ndarray, multiple: int) -> Tuple[np.ndarray, int]:
    n = x.shape[0]
    pad = (-n) % multiple
    if pad:
        x = np.concatenate([x, np.zeros((pad, x.shape[1]), dtype=x.dtype)], axis=0)
    return x, n


def _assign_tiles(data_tiles, centroids, n_valid, tile_rows):
    """Per-tile argmin assignment; padded rows get label 0 but are masked
    out of the centroid update by the caller."""
    c2 = jnp.sum(centroids * centroids, axis=1)[None, :]

    def body(_, inputs):
        tile_idx, tile = inputs
        sims = jnp.dot(
            tile,
            centroids.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d = c2 - 2.0 * sims  # ||x||² constant per row; omit for argmin
        labels = jnp.argmin(d, axis=1).astype(jnp.int32)
        return None, labels

    n_tiles = data_tiles.shape[0]
    _, labels = jax.lax.scan(
        body, None, (jnp.arange(n_tiles), data_tiles)
    )
    return labels.reshape(n_tiles * tile_rows)


@functools.partial(
    jax.jit, static_argnames=("n_clusters", "n_iters", "tile_rows")
)
def _kmeans_device(
    data: jnp.ndarray,
    n_valid: jnp.ndarray,
    key: jnp.ndarray,
    *,
    n_clusters: int,
    n_iters: int,
    tile_rows: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    n_padded, d = data.shape
    n_tiles = n_padded // tile_rows
    data_tiles = data.reshape(n_tiles, tile_rows, d)
    row_ids = jnp.arange(n_padded, dtype=jnp.int32)
    valid = (row_ids < n_valid).astype(jnp.float32)

    # --- init: k distinct (with high probability) valid points ---------
    # Deterministic seeded sampling; indices are drawn uniformly over the
    # valid range and de-duplicated by striding on collision.
    init_idx = jax.random.randint(key, (n_clusters,), 0, jnp.maximum(n_valid, 1))
    # Nudge exact duplicates apart (rare for n >> k); keeps init distinct
    # enough for the empty-cluster resplit to handle any residue.
    init_idx = (init_idx + jnp.arange(n_clusters)) % jnp.maximum(n_valid, 1)
    centroids = data[init_idx].astype(jnp.float32)

    def step(centroids, step_key):
        c2 = jnp.sum(centroids * centroids, axis=1)[None, :]

        def body(carry, tile):
            sums, counts = carry
            sims = jnp.dot(
                tile[0],
                centroids.T,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            labels = jnp.argmin(c2 - 2.0 * sims, axis=1)
            onehot = (
                jax.nn.one_hot(labels, n_clusters, dtype=jnp.float32) * tile[1][:, None]
            )
            sums = sums + jnp.dot(
                onehot.T,
                tile[0],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            counts = counts + jnp.sum(onehot, axis=0)
            return (sums, counts), None

        valid_tiles = valid.reshape(n_tiles, tile_rows)
        (sums, counts), _ = jax.lax.scan(
            body,
            (
                jnp.zeros((n_clusters, d), jnp.float32),
                jnp.zeros((n_clusters,), jnp.float32),
            ),
            (data_tiles, valid_tiles),
        )

        new_centroids = sums / jnp.maximum(counts, 1.0)[:, None]

        # Deterministic empty-cluster resplit (faiss splits the largest
        # cluster; clustering/faiss_kmeans.py delegates to faiss's
        # internal split_clusters): empty centroid_j <- largest-cluster
        # centroid * (1 ± eps_j), giving each empty a distinct offset.
        biggest = jnp.argmax(counts)
        eps = 1e-4 * (1.0 + jnp.arange(n_clusters, dtype=jnp.float32))[:, None]
        resplit = new_centroids[biggest][None, :] * (1.0 + eps)
        new_centroids = jnp.where(
            (counts == 0.0)[:, None], resplit, new_centroids
        )
        return new_centroids, None

    centroids, _ = jax.lax.scan(
        step, centroids, jax.random.split(key, n_iters)
    )

    labels = _assign_tiles(data_tiles, centroids, n_valid, tile_rows)
    return centroids, labels


def kmeans(
    data,
    n_clusters: int,
    n_iters: int = 25,
    seed: int = 2023,
    tile_rows: int = 65536,
    round_sizes: bool = False,
    max_points_per_centroid: int = 256,
    row_scales=None,
    rows=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Cluster ``data`` into ``n_clusters``; returns ``(centroids, labels)``.

    ``rows``: optional row indices into a device-resident ``data`` —
    cluster only those rows WITHOUT materializing ``data[rows]`` (the
    per-node eager gather compiles a fresh program for every distinct
    node size; at a 10-node level that was most of the level's
    clustering wall-clock).  All gathers on this path run at a bounded
    set of power-of-two shapes.

    Same callable contract as the reference ``ClusteringAlgorithm``
    (``clustering/__init__.py:9-12``) modulo the unused params dict: the
    first return value is the "clustering object" (here the centroid
    matrix), the second the ``int32`` labels.

    ``round_sizes=True`` pads the row count to the next power of two so
    that many calls over variably-sized subsets (per-node clustering in
    the builder) reuse a bounded set of compiled programs.

    ``max_points_per_centroid`` replicates faiss's training subsample
    (``faiss.Clustering`` trains on at most ``256·k`` points by default,
    which the reference inherits through ``faiss.Kmeans``,
    ``clustering/faiss_kmeans.py:18-20``): when ``n`` exceeds the cap,
    centroids are fit on a seeded uniform subsample and only the final
    assignment touches every row.  Pass ``0`` to disable.

    ``data`` may be a device-resident ``jax.Array`` — only a small
    training subsample ever crosses to the host; assignment streams
    device-side slices.
    """
    if rows is not None:
        if not isinstance(data, jax.Array):
            # host corpus: the rows path's device gathers would move
            # the whole array tile by tile — materialize the subset
            rows = np.asarray(rows)
            sub_scales = (
                None
                if row_scales is None
                else np.asarray(row_scales)[rows]
            )
            return kmeans(
                np.asarray(data)[rows],
                n_clusters,
                n_iters=n_iters,
                seed=seed,
                tile_rows=tile_rows,
                round_sizes=round_sizes,
                max_points_per_centroid=max_points_per_centroid,
                row_scales=sub_scales,
            )
        return _kmeans_rows(
            data,
            n_clusters,
            np.asarray(rows),
            n_iters=n_iters,
            seed=seed,
            max_points_per_centroid=max_points_per_centroid,
            row_scales=row_scales,
        )
    is_device = isinstance(data, jax.Array)
    n, d = data.shape
    assert n_clusters >= 1
    if n < 2:
        # Reference guard: <2 points → single label (builder:290-291).
        first = np.asarray(data[:1], dtype=np.float32)
        return first, np.zeros(n, dtype=np.int32)
    n_clusters = min(n_clusters, n)

    cap = max_points_per_centroid * n_clusters
    if max_points_per_centroid and n > cap:
        rng = np.random.default_rng(seed)
        sample = np.sort(rng.choice(n, size=cap, replace=False))
        if is_device:
            # gather + cluster the subsample fully on device — nothing
            # crosses the (slow) host link except the final centroids
            subset = data[jnp.asarray(sample)].astype(jnp.float32)
            if row_scales is not None:
                subset = subset * jnp.asarray(row_scales)[jnp.asarray(sample)][:, None]
            sub_tile = int(min(65536, cap))
            pad = (-cap) % sub_tile
            if pad:
                subset = jnp.pad(subset, ((0, pad), (0, 0)))
            centroids, _ = _kmeans_device(
                subset,
                jnp.int32(cap),
                jax.random.PRNGKey(seed),
                n_clusters=n_clusters,
                n_iters=n_iters,
                tile_rows=sub_tile,
            )
            centroids = np.asarray(centroids)
        else:
            subset = np.asarray(data[sample], dtype=np.float32)
            if row_scales is not None:
                subset = subset * np.asarray(row_scales)[sample][:, None]
            centroids, _ = kmeans(
                subset,
                n_clusters,
                n_iters=n_iters,
                seed=seed,
                tile_rows=tile_rows,
                round_sizes=round_sizes,
                max_points_per_centroid=0,
            )
        return centroids, kmeans_assign(centroids, data, row_scales=row_scales)
    data = np.asarray(data, dtype=np.float32)
    if row_scales is not None:
        data = data * np.asarray(row_scales, np.float32)[:, None]

    if round_sizes:
        target = 256
        while target < n:
            target *= 2
        tile_rows = int(min(tile_rows, target))
        data_r = np.zeros((target, d), dtype=np.float32)
        data_r[:n] = data
        data = data_r
    tile_rows = int(min(tile_rows, max(8, data.shape[0])))
    padded, _ = _pad_rows(data, tile_rows)
    n_valid = n
    centroids, labels = _kmeans_device(
        jnp.asarray(padded),
        jnp.int32(n_valid),
        jax.random.PRNGKey(seed),
        n_clusters=n_clusters,
        n_iters=n_iters,
        tile_rows=tile_rows,
    )
    return np.asarray(centroids), np.asarray(labels)[:n].astype(np.int32)


@functools.partial(
    jax.jit, static_argnames=("T", "n_clusters", "n_iters", "restarts")
)
def _kmeans_nodes_batch(
    data, scales, slot_rows, seg_starts, seg_lens, keys, *,
    T: int, n_clusters: int, n_iters: int, restarts: int,
):
    """Vmapped Lloyd's over a block of stacked node problems: gather a
    fixed-size with-replacement training sample per node, run
    ``restarts`` seeded inits of the single-problem ``_kmeans_device``
    under nested ``vmap`` (same per-node semantics: init from data
    points, deterministic empty-cluster resplit), and keep each node's
    lowest-inertia run — the faiss ``nredo`` analog, nearly free here
    because the restarts ride the same batched dispatch.  Returns
    (M_b, C, d) centroids."""

    def sample(key, start, count):
        # decorrelate the sample draw from _kmeans_device's init draws
        # (which fold in the restart index 0..restarts-1)
        idx = jax.random.randint(
            jax.random.fold_in(key, 2**31 - 1), (T,), 0,
            jnp.maximum(count, 1),
        )
        rows = slot_rows[start + idx]
        x = data[jnp.maximum(rows, 0)].astype(jnp.float32)
        if scales is not None:
            x = x * scales[jnp.maximum(rows, 0)][:, None]
        return x

    xs = jax.vmap(sample)(keys, seg_starts, seg_lens)  # (M_b, T, d)

    def one_restart(x_m, key_r):
        c, lab = _kmeans_device(
            x_m, jnp.int32(T), key_r,
            n_clusters=n_clusters, n_iters=n_iters, tile_rows=T,
        )
        inert = jnp.sum((x_m - c[lab]) ** 2)
        return c, inert

    def per_node(x_m, key):
        keys_r = jax.vmap(
            lambda r: jax.random.fold_in(key, r)
        )(jnp.arange(restarts))
        cs, inerts = jax.vmap(one_restart, in_axes=(None, 0))(x_m, keys_r)
        return cs[jnp.argmin(inerts)]

    return jax.vmap(per_node)(xs, keys)


def _node_tile_scan(tile_node, slot_rows_2d, x, x_scales, centroids):
    """The per-tile nearest-centroid body shared by the single-device
    and mesh assignment paths (their label parity rests on this being
    literally the same code): ``lax.scan`` over tiles, each slot row
    labeled under its tile's node centroids; ``rows == -1`` → -1."""

    def body(_, inputs):
        m, rows = inputs
        c = centroids[m]  # (C, d)
        xt = x[jnp.maximum(rows, 0)].astype(jnp.float32)
        if x_scales is not None:
            xt = xt * x_scales[jnp.maximum(rows, 0)][:, None]
        sims = jnp.dot(
            xt, c.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        c2 = jnp.sum(c * c, axis=1)[None, :]
        lab = jnp.argmin(c2 - 2.0 * sims, axis=1).astype(jnp.int32)
        return None, jnp.where(rows >= 0, lab, -1)

    _, labs = jax.lax.scan(body, None, (tile_node, slot_rows_2d))
    return labs


@functools.partial(jax.jit, static_argnames=("tile",))
def _assign_tiles_nodes(x, x_scales, slot_rows, tile_node, centroids, *,
                        tile: int):
    """Per-slot nearest-centroid label under the slot's own node's
    centroids — one ``lax.scan`` over tiles (the clustering analog of
    ``models/train._predict_own_tiles``)."""
    n_tiles = tile_node.shape[0]
    srt = slot_rows.reshape(n_tiles, tile)
    labs = _node_tile_scan(tile_node, srt, x, x_scales, centroids)
    return labs.reshape(n_tiles * tile)


@functools.lru_cache(maxsize=None)
def _assign_tiles_nodes_mesh_fn(mesh, tile: int, has_scales: bool):
    """One jitted shard_map program per (mesh, tile, scales?) — the
    closure would otherwise re-trace on every builder level."""
    from jax.sharding import PartitionSpec as P

    from learnedmetricindex_tpu.parallel.mesh import get_shard_map

    shard_map = get_shard_map()

    flat = mesh.axis_names

    def local(tn, srt, x, *rest):
        xs = rest[0] if has_scales else None
        cents = rest[-1]
        return _node_tile_scan(tn, srt, x, xs, cents)

    xs_spec = (P(),) if has_scales else ()
    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(flat), P(flat), P()) + xs_spec + (P(),),
            out_specs=P(flat),
        )
    )


def _assign_tiles_nodes_mesh(
    x, x_scales, slot_rows, tile_node, centroids, *, tile: int, mesh
):
    """Mesh-parallel :func:`_assign_tiles_nodes`: ``lax.scan`` is
    sequential, so sharding its inputs alone gains nothing — instead
    each device scans ITS OWN slice of the tile axis under
    ``shard_map`` (corpus, scales, and the level's centroids replicated
    per device; no collectives needed, tiles are independent).  The
    caller pads the tile axis to a multiple of the device count with
    dummy tiles (``rows == -1`` → label -1)."""
    n_tiles = tile_node.shape[0]
    assert n_tiles % mesh.devices.size == 0

    fn = _assign_tiles_nodes_mesh_fn(mesh, tile, x_scales is not None)
    args = (tile_node, slot_rows.reshape(n_tiles, tile), x) + (
        (x_scales,) if x_scales is not None else ()
    ) + (centroids,)
    return fn(*args).reshape(n_tiles * tile)


def kmeans_nodes(
    data,
    parent_gid: np.ndarray,
    node_ids: np.ndarray,
    n_clusters: int,
    *,
    seeds: np.ndarray,
    n_iters: int = 25,
    max_points_per_centroid: int = 256,
    row_scales=None,
    tile: int = 4096,
    node_batch_bytes: int = 1 << 30,
    restarts: int = 4,
    mesh=None,
) -> np.ndarray:
    """Cluster MANY sibling nodes' row sets concurrently — one stacked
    dispatch per node block instead of one k-means job per node (the
    TPU-native replacement for the reference's serial per-path loop,
    ``LearnedIndexBuilder.py:240-278``, on the *clustering* side; the
    trainer side is ``StackedNodeTrainer``).

    ``node_ids`` must each own at least ``n_clusters`` rows of
    ``parent_gid`` (the builder routes smaller nodes through the serial
    guards).  Each node trains on a seeded ``256·k``-point sample drawn
    WITH replacement from its rows (the serial path samples without
    replacement — a documented, quality-neutral deviation that keeps
    every vmapped shape static) over ``restarts`` seeded inits keeping
    the lowest-inertia run (the faiss ``nredo`` analog; single random
    inits of Lloyd's merge/split well-separated clusters a sizable
    fraction of the time, and restarts ride the same batched dispatch
    almost free), then every row is assigned under its own node's
    centroids in one tiled scan.

    Returns ``labels (n,) int32``: cluster label for rows of the given
    nodes, -1 elsewhere.  Deterministic in ``seeds`` (one per node).

    ``mesh`` (optional, single-process): the node axis of the stacked
    Lloyd's dispatch is sharded over every mesh device (the sibling
    problems are independent — expert parallelism, no collectives) and
    the assignment scan runs per-device over its slice of the tile
    axis.  The corpus is REPLICATED per device for the gathers, so the
    caller gates this on the corpus fitting alongside its shard (the
    builder's ``LMI_NODE_KMEANS_REPL_BYTES``).  Per-node math is
    unchanged — labels are identical with and without a mesh.
    """
    from learnedmetricindex_tpu import native

    parent_gid = np.asarray(parent_gid)
    node_ids = np.asarray(node_ids, dtype=np.int64)
    seeds = np.asarray(seeds, dtype=np.uint32)
    n = parent_gid.shape[0]
    M = len(node_ids)
    d = data.shape[1]
    C = n_clusters

    # dense node index per row; non-selected rows go to dummy group M
    pos = np.full(int(parent_gid.max()) + 1, M, dtype=np.int64)
    pos[node_ids] = np.arange(M)
    b_of_row = pos[parent_gid]

    counts = native.bincount(b_of_row, M + 1)
    assert (counts[:M] >= C).all(), "kmeans_nodes needs >= C rows per node"
    padded = np.maximum(-(-counts[:M] // tile) * tile, tile)
    seg_starts = np.concatenate([[0], np.cumsum(padded)]).astype(np.int64)
    S = int(seg_starts[-1])
    slot_rows, _ = native.fill_slots(
        b_of_row, np.concatenate([seg_starts[:-1], [S]]), S + int(counts[M])
    )
    slot_rows = slot_rows[:S]  # drop the dummy segment
    tile_node = np.repeat(np.arange(M), padded // tile).astype(np.int32)

    if isinstance(data, jax.Array):
        x = data
    else:
        x = jnp.asarray(np.asarray(data, np.float32))
    scales_dev = None
    if row_scales is not None:
        scales_dev = (
            row_scales
            if isinstance(row_scales, jax.Array)
            else jnp.asarray(np.asarray(row_scales, np.float32))
        )
    slot_rows_dev = jnp.asarray(slot_rows)

    # training-sample size: the faiss cap, bounded by the largest node
    cap = max(max_points_per_centroid * C, C)
    T = 256
    while T < min(cap, int(counts[:M].max())):
        T *= 2
    T = min(T, cap)

    n_dev = int(mesh.devices.size) if mesh is not None else 1
    use_mesh = n_dev > 1
    if use_mesh:
        from learnedmetricindex_tpu.parallel import multiprocess as _mp

        if _mp.is_multiprocess(mesh):
            # replication here is plain device_put (single controller);
            # fail with intent instead of a non-addressable-device error
            raise ValueError(
                "kmeans_nodes(mesh=...) is single-process only (it "
                "replicates the corpus with device_put); on a "
                "multi-process mesh run the serial per-node path — the "
                "builder gates this automatically"
            )
        from jax.sharding import NamedSharding, PartitionSpec as P

        flat = mesh.axis_names
        repl = NamedSharding(mesh, P())
        node_sh = NamedSharding(mesh, P(flat))
        # replicate the gather operands once per level (the caller
        # gates on the corpus fitting replicated)
        x = jax.device_put(x, repl)
        if scales_dev is not None:
            scales_dev = jax.device_put(scales_dev, repl)
        slot_rows_dev = jax.device_put(slot_rows_dev, repl)

    # node blocks sized so the (M_b, T, d) gather stays in budget
    M_b = max(1, int(node_batch_bytes // max(T * d * 4, 1)))
    M_b = min(M_b, M)
    if use_mesh:  # whole devices per block: pad up to a multiple
        M_b = -(-M_b // n_dev) * n_dev
    keys = jax.vmap(jax.random.PRNGKey)(jnp.asarray(seeds))
    cent_blocks = []
    for m0 in range(0, M, M_b):
        m1 = min(m0 + M_b, M)
        pad = M_b - (m1 - m0)
        sel = np.arange(m0, m1)
        if pad:  # pad the block with repeats of node 0 (discarded)
            sel = np.concatenate([sel, np.zeros(pad, np.int64)])
        block_args = (
            jnp.asarray(seg_starts[sel]),
            jnp.asarray(counts[sel].astype(np.int32)),
            jax.tree.map(lambda a: a[jnp.asarray(sel)], keys),
        )
        if use_mesh:
            # node-sharded block inputs: GSPMD propagation shards the
            # whole vmapped Lloyd's over the mesh (expert parallel)
            block_args = jax.tree.map(
                lambda a: jax.device_put(a, node_sh), block_args
            )
        cents = _kmeans_nodes_batch(
            x,
            scales_dev,
            slot_rows_dev,
            *block_args,
            T=T,
            n_clusters=C,
            n_iters=n_iters,
            restarts=restarts,
        )
        cent_blocks.append(cents[: m1 - m0])
    centroids = jnp.concatenate(cent_blocks) if len(cent_blocks) > 1 else (
        cent_blocks[0]
    )

    if use_mesh:
        pad_tiles = (-len(tile_node)) % n_dev
        srd = slot_rows_dev
        tn = tile_node
        if pad_tiles:  # dummy tiles: node 0, rows -1 → label -1
            tn = np.concatenate([tile_node, np.zeros(pad_tiles, np.int32)])
            srd = jnp.concatenate(
                [srd, jnp.full(pad_tiles * tile, -1, srd.dtype)]
            )
        labs = np.asarray(
            _assign_tiles_nodes_mesh(
                x, scales_dev, srd, jnp.asarray(tn),
                jax.device_put(centroids, repl), tile=tile, mesh=mesh,
            )
        )[:S]
    else:
        labs = np.asarray(
            _assign_tiles_nodes(
                x, scales_dev, slot_rows_dev, jnp.asarray(tile_node),
                centroids, tile=tile,
            )
        )
    labels = np.full(n, -1, dtype=np.int32)
    valid = slot_rows >= 0
    labels[slot_rows[valid]] = labs[valid]
    return labels


def kmeans_assign(centroids, data, tile_rows: int = 0, row_scales=None) -> np.ndarray:
    """Assign each row of ``data`` to its nearest centroid (the reference's
    ``kmeans.index.search(data, 1)``, ``clustering/faiss_kmeans.py:21``).

    Host data streams to the device in blocks; device-resident data is
    sliced in place.  Per-block labels stay on the device and cross to
    the host once at the end (dispatch and transfer latency through a
    slow host link dominate otherwise).

    ``tile_rows=0`` picks a block size targeting ~1.5 GB of f32 rows.
    """
    n, d = data.shape
    if not tile_rows:
        tile_rows = max(8192, min(n, (384 << 20) // max(d, 1)))
        if isinstance(data, jax.Array):
            # the corpus is HBM-resident: clamp the per-block f32
            # working set to what is actually left on the device (a
            # 17.5M int8 corpus leaves ~2 GB on a 16 GB chip)
            free = device_free_bytes(fallback_resident_nbytes=data.nbytes)
            budget_rows = max(8192, int(free // 3) // (4 * max(d, 1)))
            tile_rows = min(tile_rows, budget_rows)
    centroids_dev = jnp.asarray(np.asarray(centroids), dtype=jnp.float32)
    tile_rows = int(min(tile_rows, max(8, n)))
    if row_scales is not None:
        row_scales_dev = (
            row_scales if isinstance(row_scales, jax.Array)
            else jnp.asarray(np.asarray(row_scales, np.float32))
        )
    label_blocks = []
    for start in range(0, n, tile_rows):
        block = data[start : start + tile_rows]
        rows = block.shape[0]
        sc = None
        if isinstance(block, jax.Array):
            # dequantization happens INSIDE the jitted assign: eager
            # astype/multiply here would materialize two block-sized f32
            # temporaries next to the resident corpus (OOM at 17.5M)
            if rows < tile_rows:
                block = jnp.pad(block, ((0, tile_rows - rows), (0, 0)))
            if row_scales is not None:
                sc = row_scales_dev[start : start + rows]
                if rows < tile_rows:
                    sc = jnp.pad(sc, (0, tile_rows - rows))
        else:
            block = np.asarray(block, dtype=np.float32)
            if row_scales is not None:
                block = block * np.asarray(row_scales[start : start + rows],
                                           np.float32)[:, None]
            if rows < tile_rows:
                pad_block = np.zeros((tile_rows, d), dtype=np.float32)
                pad_block[:rows] = block
                block = pad_block
            block = jnp.asarray(block)
        label_blocks.append(_assign_block(block, centroids_dev, sc)[:rows])
    return np.asarray(jnp.concatenate(label_blocks)).astype(np.int32)


def device_free_bytes(fallback_resident_nbytes=None):
    """Free HBM on the default device.

    Returns None if the runtime exposes no memory stats (e.g. the axon
    PJRT plugin) and no fallback is given; with
    ``fallback_resident_nbytes`` set, falls back to an HBM-size
    estimate minus those resident bytes (the single authority for this
    heuristic — don't hand-roll it at call sites).  The estimate
    defaults to a 16 GB v5e chip (minus runtime reserve); on devices
    with smaller HBM behind stats-less runtimes, set ``LMI_HBM_BYTES``
    to the chip's usable HBM in bytes."""
    import os

    try:
        stats = jax.local_devices()[0].memory_stats()
        return int(stats["bytes_limit"]) - int(stats["bytes_in_use"])
    except Exception:
        if fallback_resident_nbytes is None:
            return None
        total = int(os.environ.get("LMI_HBM_BYTES", 15_000_000_000))
        return total - int(fallback_resident_nbytes)


@jax.jit
def _assign_block(block, centroids, scales=None):
    b = block.astype(jnp.float32)
    if scales is not None:
        b = b * scales[:, None]
    sims = jnp.dot(
        b,
        centroids.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    c2 = jnp.sum(centroids * centroids, axis=1)[None, :]
    return jnp.argmin(c2 - 2.0 * sims, axis=1).astype(jnp.int32)


@jax.jit
def _gather_rows_f32(data, idx, scales=None):
    """Fused gather + dequantize: (T, d) f32 rows of ``data`` at
    ``idx`` (fixed T per compiled program)."""
    block = data[idx].astype(jnp.float32)
    if scales is not None:
        block = block * scales[idx][:, None]
    return block


@jax.jit
def _assign_block_rows(data, idx, centroids, scales=None):
    """Assign ``data[idx]`` to nearest centroids, gather + dequantize
    fused in one program (fixed tile shape)."""
    block = data[idx].astype(jnp.float32)
    if scales is not None:
        block = block * scales[idx][:, None]
    sims = jnp.dot(
        block,
        centroids.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    c2 = jnp.sum(centroids * centroids, axis=1)[None, :]
    return jnp.argmin(c2 - 2.0 * sims, axis=1).astype(jnp.int32)


def _assign_tile_rows_size(n: int, d: int, data_nbytes: int) -> int:
    """Power-of-two assignment tile for the rows path, clamped to free
    HBM (shape reuse across nodes is the point — data-dependent tiles
    would recompile per node)."""
    tile = 1 << min(18, max(13, (max(n, 1) - 1).bit_length()))  # 8k..256k
    free = device_free_bytes(fallback_resident_nbytes=data_nbytes)
    while tile > 8192 and tile * d * 4 * 3 > free:
        tile >>= 1
    return tile


def _kmeans_rows(
    data,
    n_clusters: int,
    rows: np.ndarray,
    *,
    n_iters: int,
    seed: int,
    max_points_per_centroid: int,
    row_scales,
):
    """Device-resident subset clustering by row indices (see ``kmeans``).

    Semantics match the materialized-subset path exactly: the training
    subsample draws the same local indices from the same seeded rng, and
    padded slots are masked via ``n_valid`` rather than fed to Lloyd's.
    """
    assert isinstance(data, jax.Array)
    d = data.shape[1]
    n = rows.shape[0]
    assert n_clusters >= 1
    if n < 2:
        first = np.asarray(
            _gather_rows_f32(data, jnp.asarray(rows[:1].astype(np.int32)))
        ) if n else np.zeros((0, d), np.float32)
        return first, np.zeros(n, dtype=np.int32)
    n_clusters = min(n_clusters, n)
    scales_dev = None
    if row_scales is not None:
        scales_dev = (
            row_scales
            if isinstance(row_scales, jax.Array)
            else jnp.asarray(np.asarray(row_scales, np.float32))
        )

    cap = max_points_per_centroid * n_clusters
    rng = np.random.default_rng(seed)
    subsampled = bool(max_points_per_centroid) and n > cap
    if subsampled:
        sample = np.sort(rng.choice(n, size=cap, replace=False))
        train_idx = rows[sample]
        n_train = cap
    else:
        train_idx = rows
        n_train = n

    # pad the training gather to the same power-of-two ladder as the
    # round_sizes host path (bounded compiled-shape set)
    target = 256
    while target < n_train:
        target *= 2
    pad_idx = np.zeros(target, np.int32)
    pad_idx[:n_train] = train_idx
    subset = _gather_rows_f32(data, jnp.asarray(pad_idx), scales_dev)
    sub_tile = int(min(65536, target))
    centroids, labels_train = _kmeans_device(
        subset,
        jnp.int32(n_train),
        jax.random.PRNGKey(seed),
        n_clusters=n_clusters,
        n_iters=n_iters,
        tile_rows=sub_tile,
    )
    centroids_np = np.asarray(centroids)
    if not subsampled:
        return centroids_np, np.asarray(labels_train)[:n].astype(np.int32)

    # assignment over all node rows, fixed power-of-two tiles
    tile = _assign_tile_rows_size(n, d, data.nbytes)
    centroids_dev = jnp.asarray(centroids_np)
    label_blocks = []
    for start in range(0, n, tile):
        idx = rows[start : start + tile].astype(np.int32)
        r = len(idx)
        if r < tile:
            idx = np.pad(idx, (0, tile - r))
        lb = _assign_block_rows(
            data, jnp.asarray(idx), centroids_dev, scales_dev
        )
        label_blocks.append(lb[:r])
    labels = np.asarray(jnp.concatenate(label_blocks)).astype(np.int32)
    return centroids_np, labels
