"""Index construction.

Same observable behavior as the reference builder
(``search/li/LearnedIndexBuilder.py:21-352``): top-down, level by level —
cluster the data at each node with k-means, train an MLP to imitate the
clustering, then partition the data by the **MLP's own predictions**
(not the k-means labels; ``builder:76``, ``builder:270-274``) and recurse.
Returns the same 5-tuple as ``LearnedIndexBuilder.build``
(``builder:43-107``): ``(index, data_prediction, n_buckets, build_t,
cluster_t)`` with ``data_prediction`` an ``(n, n_levels)`` int64 matrix
padded with -1.

Structural TPU differences (capability-equivalent, SURVEY.md §7):

* All node models of one level train **concurrently** as a stacked
  pytree (:class:`StackedNodeTrainer`) instead of the reference's
  sequential per-path loop (``builder:234-278``).
* Node paths are dense row-major integers over the configured category
  counts rather than ``EMPTY_VALUE``-padded tuples; node slots that a
  parent never predicts into are tracked with validity masks (the
  reference shrinks ``n_categories`` in place when clustering returns
  fewer clusters, ``builder:161-167``).
* The per-node empty-data assertion (``builder:244-246``) is enforced
  for every *valid* node slot — the coverage-based training criterion
  guarantees it.
* k-means guards match the reference: <2 points → single cluster,
  ``n_clusters > n → n // 5`` with a floor of 2 (``builder:290-296``).
"""

from __future__ import annotations

import time
from typing import List, Tuple

import numpy as np

from learnedmetricindex_tpu.config import BuildConfiguration
from learnedmetricindex_tpu.index.index import LearnedIndex, LevelModels
from learnedmetricindex_tpu.index.navigation import TreeLayout
from learnedmetricindex_tpu.models.train import StackedNodeTrainer, group_rows
from learnedmetricindex_tpu.ops.clustering import algorithms as clustering_algorithms
from learnedmetricindex_tpu.utils.logging import Logger

EMPTY_VALUE = -1  # cf. PriorityQueue.py:4


def _as_array(data):
    """Accept a plain array, a device-resident ``jax.Array`` (kept on
    device — never pulled to the host), or the reference's 1-indexed
    DataFrame (``search/search.py:190-191``)."""
    import jax

    if isinstance(data, jax.Array):
        return data
    try:
        import pandas as pd

        if isinstance(data, pd.DataFrame):
            return np.ascontiguousarray(data.to_numpy(dtype=np.float32))
    except ImportError:  # pragma: no cover
        pass
    return np.ascontiguousarray(np.asarray(data, dtype=np.float32))


def _guarded_n_clusters(n_rows: int, n_clusters: int) -> int:
    """Reference guards (``builder:290-296``)."""
    if n_rows < n_clusters:
        n_clusters = max(n_rows // 5, 2)
    return n_clusters


class LearnedIndexBuilder(Logger):
    def __init__(self, data, config: BuildConfiguration, mesh=None):
        # ``data`` may be (values, row_scales) for an int8-quantized
        # corpus (see ops/quantize.py)
        if isinstance(data, tuple):
            values, scales = data
            self.data = _as_array(values)
            self.row_scales = scales
        else:
            self.data = _as_array(data)
            self.row_scales = None
        self.config = config
        # Optional ("data", "model") jax.sharding.Mesh: clustering runs
        # as mesh-sharded Lloyd's (psum centroid reduction over ICI) and
        # all node models train expert-parallel over "model" with corpus
        # rows over the mesh (parallel/distributed.py,
        # models/train.py StackedNodeTrainer(mesh=...)).  The reference
        # has no distributed counterpart (SURVEY.md §2.3).
        self.mesh = mesh

    def build(self) -> Tuple[LearnedIndex, np.ndarray, int, float, float]:
        s = time.perf_counter()
        cfg = self.config
        n, d = self.data.shape
        n_levels = cfg.n_levels

        data_prediction = np.full((n, n_levels), EMPTY_VALUE, dtype=np.int64)
        levels: List[LevelModels] = []
        cluster_t_total = 0.0

        # node validity per level: level ℓ has prod(C_0..C_{ℓ-1}) slots
        valid_nodes = np.ones(1, dtype=bool)  # level 0: the root

        for level in range(n_levels):
            params = cfg.level_configurations[level]
            n_models = int(np.prod(cfg.n_categories[:level], dtype=np.int64)) if level else 1
            C = params.n_categories

            if level == 0:
                parent_gid = np.zeros(n, dtype=np.int64)
            else:
                parent_gid = np.ravel_multi_index(
                    tuple(data_prediction[:, l] for l in range(level)),
                    tuple(cfg.n_categories[:level]),
                )

            counts = np.bincount(parent_gid, minlength=n_models)
            empty_valid = valid_nodes & (counts == 0)
            assert not empty_valid.any(), (
                "There are no data points associated with the given path."
            )  # cf. builder:244-246

            # ---- per-node clustering ---------------------------------
            labels_full = np.zeros(n, dtype=np.int32)
            class_mask = np.zeros((n_models, C), dtype=bool)
            s_cluster = time.perf_counter()
            import jax as _jax

            handled = np.zeros(n_models, dtype=bool)
            serial_nodes = np.nonzero(valid_nodes)[0]
            # Batched sibling clustering (level > 0): stack every node
            # with >= C rows into vmapped Lloyd's — one dispatch per
            # node block instead of one serial k-means per node (the
            # clustering half of the reference's hot loop #1,
            # ``LearnedIndexBuilder.py:240-278``; the trainer half is
            # StackedNodeTrainer).  Small nodes and custom clustering
            # backends keep the serial path and its guards.
            multiproc_data = isinstance(
                self.data, _jax.Array
            ) and not self.data.is_fully_addressable
            import os as _os

            if (
                level > 0
                and not multiproc_data
                and params.clustering_algorithm
                in ("kmeans", "faiss_kmeans", "scikit_kmeans")
                # A/B escape hatch: force the serial per-node loop
                and _os.environ.get("LMI_BATCHED_NODE_KMEANS", "1") != "0"
            ):
                eligible = serial_nodes[
                    counts[serial_nodes] >= max(C, 2)
                ]
                if len(eligible) > 1:
                    from learnedmetricindex_tpu.ops.kmeans import (
                        kmeans_nodes,
                    )

                    seeds = (
                        cfg.seed + level * 1_000_003 + eligible
                    ).astype(np.int64)  # same per-node seeds as serial
                    # Deep-level mesh sharding (the level-0 analog of
                    # sharded_kmeans): node axis over every device.
                    # kmeans_nodes replicates the corpus for its
                    # gathers, so gate on it fitting alongside the
                    # per-chip store shard; single-process only
                    # (multiproc corpora take the serial guards above).
                    node_mesh = None
                    if self.mesh is not None:
                        from learnedmetricindex_tpu.parallel import (
                            multiprocess as _mp,
                        )

                        repl_budget = int(
                            _os.environ.get(
                                "LMI_NODE_KMEANS_REPL_BYTES", 8 << 30
                            )
                        )
                        if (
                            not _mp.is_multiprocess(self.mesh)
                            and self.data.nbytes <= repl_budget
                        ):
                            node_mesh = self.mesh
                    lab_b = kmeans_nodes(
                        self.data,
                        parent_gid,
                        eligible,
                        C,
                        seeds=seeds,
                        row_scales=self.row_scales,
                        mesh=node_mesh,
                    )
                    sel = lab_b >= 0
                    # per-node dense label compaction + class mask —
                    # the reference's unique-shrink (builder:161-167),
                    # vectorized over the whole level
                    pos = np.full(n_models, len(eligible), np.int64)
                    pos[eligible] = np.arange(len(eligible))
                    b = pos[parent_gid[sel]]
                    hist = np.zeros((len(eligible), C), np.int64)
                    np.add.at(hist, (b, lab_b[sel]), 1)
                    present = hist > 0
                    remap = np.cumsum(present, axis=1) - 1
                    labels_full[sel] = remap[b, lab_b[sel]].astype(
                        np.int32
                    )
                    class_mask[eligible[:, None], np.arange(C)[None, :]] = (
                        np.arange(C)[None, :] < present.sum(axis=1)[:, None]
                    )
                    handled[eligible] = True

            for gid in serial_nodes:
                if handled[gid]:
                    continue
                rows = np.nonzero(parent_gid == gid)[0]
                # Device corpus + partial node: hand the row indices to
                # k-means instead of materializing data[rows] — the
                # per-node eager gather compiles a fresh program for
                # every distinct node size (measured: most of a level's
                # clustering wall-clock at 10 nodes), and per-node
                # scale slices do the same.
                rows_kw = None
                if isinstance(self.data, _jax.Array) and len(rows) != n:
                    subset = self.data
                    rows_kw = rows
                else:
                    subset = self.data if len(rows) == n else self.data[rows]
                if len(rows) < 2:
                    labels_full[rows] = 0
                    class_mask[gid, :1] = True
                    continue
                k_g = _guarded_n_clusters(len(rows), C)
                sub_scales = None
                if self.row_scales is not None:
                    if rows_kw is not None or len(rows) == n:
                        sub_scales = self.row_scales
                    else:
                        sub_scales = self.row_scales[rows]
                seed_g = cfg.seed + level * 1_000_003 + int(gid)
                if (
                    self.mesh is not None
                    and level == 0
                    and len(rows) >= 2 * self.mesh.devices.size
                ):
                    # mesh path: rows sharded over every device, psum
                    # centroid reduction (level 0 = the whole corpus;
                    # deeper levels are many small per-node problems)
                    from learnedmetricindex_tpu.parallel.distributed import (
                        sharded_kmeans,
                    )

                    _, lab = sharded_kmeans(
                        subset,
                        k_g,
                        self.mesh,
                        seed=seed_g,
                        row_scales=sub_scales,
                    )
                else:
                    algo = clustering_algorithms[params.clustering_algorithm]
                    _, lab = algo(
                        subset,
                        k_g,
                        {
                            "seed": seed_g,
                            "round_sizes": level > 0,
                            "row_scales": sub_scales,
                            "rows": rows_kw,
                        },
                    )
                if len(lab) != len(rows):
                    # explicit raise (not assert): silently mis-sized
                    # labels under ``python -O`` would corrupt
                    # labels_full for every row of this node
                    raise ValueError(
                        "clustering backend returned "
                        f"{len(lab)} labels for {len(rows)} rows — a "
                        "backend given a device corpus must honor "
                        "params['rows'] (cluster only those row "
                        "indices) or raise; see the ``rows`` extension "
                        "in ops/clustering.ClusteringAlgorithm"
                    )
                # Compact to a dense label range — the reference's
                # ``len(np.unique(labels))`` shrink (builder:159-167)
                # assumes labels are dense; guarantee it.
                uniques, lab = np.unique(lab, return_inverse=True)
                lab = lab.astype(np.int32)
                actual = len(uniques)
                if actual != k_g:
                    self.logger.debug(
                        "Clustering returned %d clusters instead of %d "
                        "at level %d node %d.",
                        actual,
                        k_g,
                        level,
                        gid,
                    )  # cf. builder:161-167
                labels_full[rows] = lab
                class_mask[gid, :actual] = True
            cluster_t = time.perf_counter() - s_cluster
            cluster_t_total += cluster_t

            # ---- concurrent training of all node models --------------
            import jax.numpy as jnp

            grouped = group_rows(
                self.data,
                parent_gid,
                n_models,
                labels=labels_full,
                tile=4096,
                dtype=jnp.dtype(cfg.dtype),
                scales=self.row_scales,
            )
            trainer = StackedNodeTrainer(
                n_models,
                d,
                C,
                model_type=params.model_type,
                lr=params.lr,
                batch_size=cfg.batch_size,
                seed=cfg.seed + level,
                mesh=self.mesh,
                update_rule=getattr(cfg, "update_rule", "minibatch"),
            )
            trainer.set_class_mask(class_mask)
            if params.class_weight == "balanced":
                # sklearn-style inverse-frequency weights per NODE:
                # w[m,c] = n_m / (C_m · count[m,c]) — rare k-means
                # clusters (which the unweighted router tends to starve
                # into other buckets) get proportionally louder CE.
                # The TPU wiring of the reference's CrossEntropyLoss
                # weight knob (``search/li/model.py:145-161``).
                cnt = np.zeros((n_models, C), np.int64)
                np.add.at(cnt, (parent_gid, labels_full), 1)
                n_m = cnt.sum(axis=1, keepdims=True)
                c_m = class_mask.sum(axis=1, keepdims=True)
                with np.errstate(divide="ignore", invalid="ignore"):
                    w = n_m / (np.maximum(c_m, 1) * cnt)
                w = np.where(class_mask & (cnt > 0), w, 0.0)
                trainer.set_class_weight(w.astype(np.float32))
            preds_slots, rounds = trainer.fit(grouped, params.epochs)

            # scatter per-slot predictions back to original row order
            data_prediction[:, level] = grouped.scatter_to_rows(
                preds_slots.astype(np.int64), n, fill=EMPTY_VALUE
            )

            levels.append(
                LevelModels(
                    params=trainer.params,
                    class_mask=class_mask,
                    model_type=params.model_type,
                )
            )

            # next level's node validity = this level's (node, class) grid
            valid_nodes = (valid_nodes[:, None] & class_mask).reshape(-1)

            self.logger.debug(
                "Level %d: %d models, %d training rounds, cluster %.2fs",
                level,
                n_models,
                rounds,
                cluster_t,
            )

        layout = TreeLayout.create(cfg.n_categories)
        n_buckets = int(valid_nodes.sum())  # == len(reference bucket_paths)

        index = LearnedIndex(
            levels=levels,
            layout=layout,
            config=cfg,
            leaf_valid=valid_nodes,
        )
        build_t = time.perf_counter() - s
        return index, data_prediction, n_buckets, build_t, cluster_t_total
