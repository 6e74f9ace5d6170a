"""The learned index: navigation + bucket scan + merge.

Same observable API as the reference ``LearnedIndex``
(``search/li/LearnedIndex.py:22-161``): ``search(data_navigation,
queries_navigation, data_search, queries_search, data_prediction,
n_categories, n_buckets, k)`` → ``(dists (Q, k), anns (Q, k) uint32
1-based, measured_time dict)`` with the reference's timing taxonomy
(``inference``, ``search``, ``search_within_buckets``, ``seq_search``,
``sort``).

Execution is restructured for TPU (see module docstrings of
:mod:`navigation` and :mod:`bucket_store`):

* phase A (visit order): batched stacked-model forwards for every tree
  level, then either the reference-parity best-first replay or the fast
  joint-probability ``top_k``;
* phase B (scan): chunked bucket store + flat work-list matmul scan +
  one stable merge — replacing the reference's per-round
  pandas-groupby/faiss loop (``LearnedIndex.py:107-146``, ``:327-373``).

Dual-embedding searches (navigate in PCA space, scan in 768-d CLIP
space — ``search/search.py:192-215``) work unchanged: navigation uses
``queries_navigation`` against the models, scanning uses
``data_search``/``queries_search`` in the bucket store.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from learnedmetricindex_tpu.config import BuildConfiguration
from learnedmetricindex_tpu.index.bucket_store import BucketStore, scan_buckets
from learnedmetricindex_tpu.index.navigation import (
    TreeLayout,
)
from learnedmetricindex_tpu.models.mlp import stacked_mlp_apply
from learnedmetricindex_tpu.utils.logging import Logger

NEG_INF = -1e9


@dataclass
class LevelModels:
    """All node models of one tree level as a stacked pytree."""

    params: list  # stacked pytree, leading axis = n_models
    class_mask: np.ndarray  # (n_models, n_categories) bool
    model_type: str

    @property
    def n_models(self) -> int:
        return self.class_mask.shape[0]

    @property
    def n_categories(self) -> int:
        return self.class_mask.shape[1]


def _masked_level_probs(params, mask, queries, inv_temp=1.0):
    """(Q, n_models, C) conditional probabilities, masked classes at 0.

    ``inv_temp`` scales the logits before the softmax (temperature
    ``T = 1/inv_temp``).  ``T > 1`` flattens a level's distribution;
    for a SINGLE level this never changes the ranking (softmax is
    monotone in the logits), but for multi-level JOINT ranking it
    re-weights how much that level's confidence concentrates the
    top-k: an overconfident level-1 model otherwise pushes the whole
    visit list into one branch, which is exactly the measured
    epochs-up/recall-down collapse (visit-1 recall flat, visit-2..10
    falling — bench_artifacts/run/sweep_ep824 vs sweep_base)."""
    logits = stacked_mlp_apply(params, queries) * inv_temp  # (M, Q, C)
    m = mask[:, None, :]
    logits = jnp.where(m, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.where(m, probs, 0.0)
    return jnp.transpose(probs, (1, 0, 2))


@functools.partial(
    jax.jit, static_argnames=("cap", "policy", "layout_key", "frontier")
)
def _navigate_device(
    queries,  # (Q, d) f32
    level_params,  # tuple of stacked pytrees, one per level
    level_masks,  # tuple of (M, C) bool arrays
    child_base,
    child_count,
    is_leaf,
    first_level_end,
    inv_temps,  # (n_levels,) f32 per-level inverse nav temperature
    *,
    cap: int,
    policy: str,
    layout_key,
    frontier: int = 16,
):
    """The WHOLE navigation phase as one jitted dispatch: per-level
    stacked forwards + masking + the ordering policy.  Issued as eager
    glue between small jits (round 1) this spanned ~38 programs of
    ~0.4 s compile each through the remote compile service, and the
    class masks were closure-captured constants — now traced arguments,
    so different builds share the compiled program."""
    from learnedmetricindex_tpu.index.navigation import (
        _best_first_device,
        flatten_entry_probs_device,
        joint_order_device,
        single_level_order_device,
    )

    level_probs = [
        _masked_level_probs(p, m, queries, inv_temps[i])
        for i, (p, m) in enumerate(zip(level_params, level_masks))
    ]
    if len(level_probs) == 1:
        return single_level_order_device(
            level_probs[0][:, 0, :], level_masks[0][0], cap
        )
    if policy == "joint":
        return joint_order_device(level_probs, level_masks, cap)
    # best_first: flatten per-level entries then replay the traversal
    entry_probs = flatten_entry_probs_device(level_probs, level_masks)
    return _best_first_device(
        entry_probs,
        child_base,
        child_count,
        is_leaf,
        first_level_end,
        n_buckets=cap,
        layout_key=layout_key,
        frontier=frontier,
    )


class LearnedIndex(Logger):
    """A built index (see :class:`LearnedIndexBuilder`)."""

    def __init__(
        self,
        levels: List[LevelModels],
        layout: TreeLayout,
        config: BuildConfiguration,
        leaf_valid: np.ndarray,
    ):
        self.levels = levels
        self.layout = layout
        self.config = config
        self.leaf_valid = np.asarray(leaf_valid, dtype=bool)
        # (values, data_prediction, store) — strong refs, see
        # get_bucket_store for why identity keying must hold them alive
        self._store_cache: Optional[tuple] = None

    # ------------------------------------------------------------------
    # reference-parity introspection
    # ------------------------------------------------------------------
    @property
    def n_levels(self) -> int:
        return len(self.levels)

    @property
    def bucket_paths(self) -> List[Tuple[int, ...]]:
        """Paths of all valid leaf buckets as tuples (the reference's
        ``bucket_paths`` list, ``LearnedIndexBuilder.py:276-278``)."""
        dims = tuple(self.config.n_categories)
        out = []
        for leaf in np.nonzero(self.leaf_valid)[0]:
            out.append(tuple(int(v) for v in np.unravel_index(leaf, dims)))
        return out

    @property
    def n_buckets(self) -> int:
        return int(self.leaf_valid.sum())

    # ------------------------------------------------------------------
    # persistence (fixes the reference's unusable pickle checkpoint —
    # no load path, data_prediction missing; search/search.py:234-241)
    # ------------------------------------------------------------------
    def save(self, path: str, data_prediction: Optional[np.ndarray] = None):
        from learnedmetricindex_tpu.index.serialization import save_index

        save_index(self, path, data_prediction)

    @classmethod
    def load(cls, path: str):
        from learnedmetricindex_tpu.index.serialization import load_index

        return load_index(path)

    # ------------------------------------------------------------------
    # search
    # ------------------------------------------------------------------
    def classify(self, vectors) -> np.ndarray:
        """Predict each row's full tree path (its ``data_prediction``
        rows had it been present at build time) — used by
        :class:`~learnedmetricindex_tpu.index.mutation.DynamicIndex`
        to route inserts, and the multi-level analog of the
        reference's per-node ``model.predict``
        (``search/li/model.py:213-224``)."""
        from learnedmetricindex_tpu.index.mutation import classify

        return classify(self, vectors)

    def bucket_ids_from_prediction(self, data_prediction: np.ndarray) -> np.ndarray:
        """Dense global bucket id per data row (row-major over the path,
        the analog of the reference's ``category_L*`` annotation,
        ``LearnedIndex.py:101-104``)."""
        from learnedmetricindex_tpu import native

        return native.ravel_rows(
            np.asarray(data_prediction), tuple(self.config.n_categories)
        )

    def get_bucket_store(
        self, data_search, data_prediction: np.ndarray
    ) -> BucketStore:
        """Build (and cache) the chunked device-resident bucket store."""
        values, scales = (
            data_search if isinstance(data_search, tuple) else (data_search, None)
        )
        # Key the one-entry cache on object *identity held alive*: the
        # cached entry stores strong references to the keying arrays, so
        # an id() can never be recycled while the entry exists (a bare
        # id-tuple key could silently alias freshly-allocated arrays at
        # the same addresses and return a store built from other data).
        cached = self._store_cache
        if (
            cached is not None
            and cached[0] is values
            and cached[1] is data_prediction
            # the one-entry cache is shared with get_sharded_store:
            # a ShardedStore (has .mesh) must not satisfy this lookup
            and getattr(cached[2], "mesh", None) is None
        ):
            store = cached[2]
        else:
            store = None
        if store is None:
            from learnedmetricindex_tpu.index.builder import _as_array

            bucket_ids = self.bucket_ids_from_prediction(data_prediction)
            data_arr = _as_array(values)
            n_total = int(np.prod(self.config.n_categories, dtype=np.int64))
            if isinstance(data_arr, jax.Array):
                # device-resident data: index-only virtual store, zero
                # duplicate HBM, no host round-trip
                store = BucketStore.build_virtual(
                    data_arr,
                    bucket_ids,
                    n_buckets=n_total,
                    chunk=self.config.chunk_size,
                )
                if scales is not None:
                    store = store._replace(
                        row_scales=jnp.asarray(np.asarray(scales))
                        if not isinstance(scales, jax.Array)
                        else scales
                    )
            else:
                if scales is not None:
                    data_arr = np.asarray(data_arr, np.float32) * np.asarray(
                        scales, np.float32
                    )[:, None]
                store = BucketStore.build(
                    data_arr,
                    bucket_ids,
                    n_buckets=n_total,
                    chunk=self.config.chunk_size,
                    dtype=jnp.dtype(self.config.dtype),
                )
            self._store_cache = (values, data_prediction, store)
        return store

    def prepare_packed_store(
        self, data_search, data_prediction: np.ndarray
    ) -> BucketStore:
        """Materialize (and cache) a *packed* device store — contiguous
        DMA reads at scan time instead of random row gathers.  Needs a
        second corpus-sized HBM buffer transiently; with an int8 corpus
        both fit at 10M×768 on one chip.  The caller may free the
        original corpus afterwards."""
        values, scales = (
            data_search if isinstance(data_search, tuple) else (data_search, None)
        )
        from learnedmetricindex_tpu.index.builder import _as_array

        data_arr = _as_array(values)
        assert isinstance(data_arr, jax.Array), (
            "prepare_packed_store expects device-resident data"
        )
        bucket_ids = self.bucket_ids_from_prediction(data_prediction)
        n_total = int(np.prod(self.config.n_categories, dtype=np.int64))
        store = BucketStore.build_packed_device(
            data_arr,
            bucket_ids,
            n_buckets=n_total,
            chunk=self.config.chunk_size,
            row_scales=scales,
        )
        self._store_cache = (values, data_prediction, store)
        return store

    def get_sharded_store(
        self, data_search, data_prediction: np.ndarray, mesh, chunk=None
    ):
        """Build (and cache) a bucket-sharded multi-chip store: leaf
        buckets balanced over ``mesh`` devices, each chip holding only
        its slabs (``corpus_bytes / n_devices`` per chip for int8).
        Pass the result as ``store=`` to :meth:`search` to run the scan
        as per-device local work + one ICI-merged top-k."""
        from learnedmetricindex_tpu.parallel.sharded_index import shard_store

        values, scales = (
            data_search if isinstance(data_search, tuple) else (data_search, None)
        )
        cached = self._store_cache
        if (
            cached is not None
            and cached[0] is values
            and cached[1] is data_prediction
            and getattr(cached[2], "mesh", None) is mesh
        ):
            return cached[2]
        from learnedmetricindex_tpu.index.builder import _as_array

        bucket_ids = self.bucket_ids_from_prediction(data_prediction)
        n_total = int(np.prod(self.config.n_categories, dtype=np.int64))
        store = shard_store(
            _as_array(values),
            bucket_ids,
            n_total,
            mesh,
            # TPU default 1024: the smallest chunk the fused Pallas
            # kernel's shard-local scan covers (chunk % 1024 layout
            # rule); elsewhere small chunks minimize per-bucket padding
            chunk=chunk
            or (
                1024
                if jax.default_backend() == "tpu"
                else min(self.config.chunk_size, 256)
            ),
            row_scales=None if scales is None else np.asarray(scales),
        )
        self._store_cache = (values, data_prediction, store)
        return store

    def compute_bucket_order(
        self,
        queries_navigation,
        n_buckets: int,
        policy: str = "best_first",
        keep_on_device: bool = False,
        nav_temp=None,
    ) -> Tuple[np.ndarray, float]:
        """Phase A: per-query bucket visit order
        (cf. ``_precompute_bucket_order``, ``LearnedIndex.py:164-252``).

        Returns (order (Q, n_buckets) global bucket ids with -1 padding,
        inference seconds).  ``keep_on_device`` returns the order as a
        DEVICE array without the host readback (a ~33 ms relay round
        trip) — the zero-sync scan path consumes it directly.

        ``nav_temp``: navigation softmax temperature — a scalar, or a
        per-level sequence (e.g. ``(2.0, 1.0)`` flattens only level 1).
        Ranking-neutral for single-level trees; for multi-level JOINT
        ranking it counteracts per-level overconfidence (see
        ``_masked_level_probs``).  Default 1.0 = untempered softmax,
        the reference's distribution (``model.py:226-241``).
        """
        s = time.perf_counter()
        if policy not in ("best_first", "joint"):
            raise ValueError(f"Unknown navigation policy: {policy}")
        if nav_temp is None:
            nav_temp = 1.0
        temps = (
            [float(nav_temp)] * len(self.levels)
            if np.isscalar(nav_temp)
            else [float(t) for t in nav_temp]
        )
        if len(temps) != len(self.levels):
            raise ValueError(
                f"nav_temp has {len(temps)} entries for "
                f"{len(self.levels)} levels"
            )
        inv_temps = np.asarray(
            [1.0 / t for t in temps], dtype=np.float32
        )
        # multi-process index (params span processes): queries and the
        # layout constants must be placed as replicated global arrays
        leaf0 = jax.tree.leaves(self.levels[0].params)[0]
        multi = isinstance(leaf0, jax.Array) and not leaf0.is_fully_addressable
        if multi:
            from jax.sharding import PartitionSpec as P

            from learnedmetricindex_tpu.parallel import multiprocess as mp

            mesh = leaf0.sharding.mesh

            def _repl(a):
                return mp.put_global(np.asarray(a), mesh, P())
        else:
            def _repl(a):
                return jnp.asarray(a)
        if isinstance(queries_navigation, jax.Array) and (
            not multi
            or (
                queries_navigation.is_fully_replicated
                and queries_navigation.sharding.device_set
                == leaf0.sharding.device_set
            )
        ):
            # already device-resident with the right coverage — in the
            # multi-process case a batch replicated over the same mesh
            # (e.g. returned by a previous search step) is reused as-is
            # instead of paying an allgather + re-upload per call
            q = queries_navigation.astype(jnp.float32)
        else:
            from learnedmetricindex_tpu.parallel.multiprocess import (
                to_host_replicated,
            )

            q = _repl(
                np.asarray(
                    to_host_replicated(queries_navigation)
                    if isinstance(queries_navigation, jax.Array)
                    else queries_navigation,
                    dtype=np.float32,
                )
            )

        from learnedmetricindex_tpu.index.navigation import (
            _quantize_visits,
            check_best_first_budget,
            max_best_first_queries,
            nav_frontier,
        )

        layout = self.layout
        nav_slice = None
        if policy == "best_first" and len(self.levels) > 1:
            if multi:
                # global SPMD batch: slicing would issue per-slice
                # collectives across processes — keep the loud guard
                # (policy="joint" has no traversal state, or search in
                # smaller global batches)
                check_best_first_budget(q.shape[0], layout.n_entries)
            else:
                # wide-tree handling: the traversal state is (Q, E);
                # instead of allocating gigabytes OR failing, navigate
                # in query slices that fit the state budget (exact —
                # the traversal is per-query independent)
                nav_slice = max_best_first_queries(layout.n_entries)
        n_leaves = layout.n_leaves
        n_buckets = min(n_buckets, n_leaves)
        cap = _quantize_visits(n_buckets, n_leaves)
        nav_args = (
            tuple(level.params for level in self.levels),
            tuple(_repl(level.class_mask) for level in self.levels),
            _repl(layout.child_base),
            _repl(layout.child_count),
            _repl(layout.is_leaf),
            _repl(np.int32(layout.offsets[1])) if multi
            else jnp.int32(layout.offsets[1]),
            _repl(inv_temps),
        )
        nav_kwargs = dict(
            cap=cap, policy=policy, layout_key=layout.offsets,
            frontier=nav_frontier(),
        )
        if nav_slice is not None and q.shape[0] > nav_slice:
            parts = []
            for s0 in range(0, q.shape[0], nav_slice):
                qs = q[s0 : s0 + nav_slice]
                pad = nav_slice - qs.shape[0]
                if pad:  # last slice: repeat row 0, reuse the program
                    qs = jnp.concatenate(
                        [qs, jnp.broadcast_to(qs[:1], (pad, qs.shape[1]))]
                    )
                o = _navigate_device(qs, *nav_args, **nav_kwargs)
                parts.append(np.asarray(o[:, :n_buckets]))
            order_np = np.concatenate(parts)[: q.shape[0]]
            return order_np, time.perf_counter() - s
        order = _navigate_device(q, *nav_args, **nav_kwargs)
        if keep_on_device and not multi:
            return order[:, :n_buckets], time.perf_counter() - s
        if multi:
            from learnedmetricindex_tpu.parallel.multiprocess import (
                to_host_replicated,
            )

            return (
                to_host_replicated(order)[:, :n_buckets],
                time.perf_counter() - s,
            )
        # flatten before the readback: a (Q, n_buckets) device array is
        # lane-padded n_buckets→128, so the wire would carry up to 128×
        # the real bytes; 1-D keeps the compact layout (probe_rtt/read)
        nq = order.shape[0]
        flat = np.asarray(order[:, :n_buckets].reshape(-1))
        return flat.reshape(nq, n_buckets), time.perf_counter() - s

    def search(
        self,
        data_navigation,
        queries_navigation,
        data_search,
        queries_search,
        data_prediction: np.ndarray,
        n_categories: Optional[Sequence[int]] = None,
        n_buckets: int = 1,
        k: int = 10,
        policy: str = "best_first",
        approx_recall: Optional[float] = None,
        store: Optional[BucketStore] = None,
        rerank_margin: int = 6,
        precision: str = "default",
        rerank: bool = True,
        qtile: int = 128,
        nav_temp=None,
    ):
        """Search ``k`` nearest neighbors in the ``n_buckets`` most
        probable buckets per query (cf. ``LearnedIndex.search``,
        ``LearnedIndex.py:41-161``).

        ``data_navigation`` and ``n_categories`` are accepted for
        signature parity; navigation state lives in the index itself.

        ``approx_recall``: per-scan-item recall target for the hardware
        approximate top-k (``lax.approx_max_k``); ``None`` = exact.

        Ranking-exactness knobs (default = the fast path): the bulk scan
        runs at ``precision`` matmul precision ("default" = one bf16
        pass) over a ``k + rerank_margin`` shortlist, and ``rerank=True``
        recomputes exact f32 distances for the shortlist only.  The
        final ranking is exact *over the shortlist*; a true neighbor
        pushed past the shortlist by ~2e-3 bf16 noise in a dense
        near-tie region can be missed.  For strict parity with the
        reference's all-f32 in-bucket scan
        (``LearnedIndex.py:360-368``), pass ``precision="highest"``
        (with or without rerank) — ~6× the MXU passes.
        """
        measured: Dict[str, float] = {
            "inference": 0.0,
            "search": 0.0,
            "search_within_buckets": 0.0,
            "seq_search": 0.0,
            "sort": 0.0,
        }
        if len(queries_navigation) == 0:
            # the navigation forward and the scan-plan gathers both
            # assume >= 1 query; an empty batch is a valid no-op
            return (
                np.zeros((0, k), np.float32),
                np.zeros((0, k), np.uint32),
                measured,
            )
        # Serving-stability: the query count is a traced SHAPE, so a
        # batch of 487 after a batch of 512 would recompile navigation,
        # scan, and merge.  Pad host batches to a ⅛-octave boundary by
        # REPEATING row 0 — the pad queries follow row 0's navigation
        # path, so they join its scan tiles instead of adding work —
        # and slice the results.  Device-array callers (multi-process
        # global batches) manage their own shapes and are not touched.
        n_q = len(queries_navigation)
        pad_q = 0
        same_queries = queries_navigation is queries_search
        if (
            isinstance(queries_navigation, np.ndarray)
            and isinstance(queries_search, np.ndarray)
        ):
            from learnedmetricindex_tpu.index.bucket_store import (
                _SHAPE_HINTS,
                _quantize,
            )

            # sticky: the first batch runs at its exact size (a fixed-Q
            # workload never pads); later batches pad up to the largest
            # compiled Q, growing octave-quantized only when exceeded
            hints = _SHAPE_HINTS.setdefault(("searchQ", id(self)), {})
            prev = hints.get("Q", 0)
            if n_q <= prev:
                q_cap = prev
            elif prev == 0:
                q_cap = n_q
            else:
                q_cap = _quantize(n_q, 8)
            hints["Q"] = q_cap
            pad_q = q_cap - n_q
            if pad_q:
                queries_navigation = np.concatenate([
                    queries_navigation,
                    np.broadcast_to(
                        queries_navigation[:1],
                        (pad_q, queries_navigation.shape[1]),
                    ),
                ])
                queries_search = np.concatenate([
                    queries_search,
                    np.broadcast_to(
                        queries_search[:1], (pad_q, queries_search.shape[1])
                    ),
                ])
        if same_queries and not isinstance(queries_search, jax.Array):
            # single-embedding mode: navigation and scan read the SAME
            # queries — upload once (every host→device transfer through
            # the axon relay pays a ~33 ms round-trip, probe_rtt) and
            # hand the device array to both phases
            q_both = jnp.asarray(
                np.ascontiguousarray(queries_search, dtype=np.float32)
            )
            queries_navigation = queries_search = q_both
        s = time.perf_counter()

        if store is None:
            store = self.get_bucket_store(data_search, data_prediction)

        from learnedmetricindex_tpu.parallel.sharded_index import (
            ShardedStore,
            sharded_search,
        )

        # ZERO-SYNC fast path: navigation result stays on device and
        # feeds a device-built scan plan — one dispatch chain, one
        # flat readback; no bucket_order round-trip, no plan upload
        # (each a ~33 ms relay RTT — PERFORMANCE.md).  Falls back to
        # the host plan when the work list overflows the compiled
        # envelope (rare; the envelope then grows for the next call).
        import os as _os

        from learnedmetricindex_tpu.index.bucket_store import (
            _pallas_engine_usable,
            scan_buckets_device,
        )

        order = None
        if (
            _os.environ.get("LMI_DEVICE_PLAN", "1") != "0"
            and not isinstance(store, ShardedStore)
            and getattr(store, "chunk_data", None) is not None
            and _pallas_engine_usable(store, qtile)
            and not (
                precision == "int8"
                and store.chunk_data.dtype != jnp.int8
            )
        ):
            order_dev, measured["inference"] = self.compute_bucket_order(
                queries_navigation, n_buckets, policy=policy,
                keep_on_device=True, nav_temp=nav_temp,
            )
            if isinstance(order_dev, np.ndarray):  # sliced-nav path
                order_dev = jnp.asarray(order_dev.astype(np.int32))
            s_scan = time.perf_counter()
            res = scan_buckets_device(
                store,
                queries_search
                if isinstance(queries_search, jax.Array)
                else np.asarray(queries_search, dtype=np.float32),
                order_dev,
                k=k,
                qtile=qtile,
                precision=precision,
                rerank=rerank,
                rerank_margin=rerank_margin,
            )
            if res is not None:
                dists, anns = res
                t_scan = time.perf_counter() - s_scan
                measured["search_within_buckets"] = t_scan
                measured["seq_search"] = t_scan
                measured["search"] = time.perf_counter() - s
                return dists[:n_q], anns[:n_q], measured
            order = np.asarray(order_dev)  # envelope overflow: rerun

        if order is None:
            order, measured["inference"] = self.compute_bucket_order(
                queries_navigation, n_buckets, policy=policy,
                nav_temp=nav_temp,
            )

        s_scan = time.perf_counter()
        q_search = (
            queries_search
            if isinstance(queries_search, jax.Array)
            else np.asarray(queries_search, dtype=np.float32)
        )

        if isinstance(store, ShardedStore):
            # multi-chip path: per-device local scans + ICI top-k merge,
            # with the same two-stage fast path as single-chip — each
            # shard reranks its own shortlist at exact HIGHEST precision
            # before the all-gather, so per-chip cost matches the
            # single-chip fast path (precision="highest" opts into the
            # strict all-f32 bulk scan, as on one chip).
            dists, anns = sharded_search(
                store,
                np.asarray(q_search, dtype=np.float32),
                order,
                k=k,
                qtile=min(qtile, 32),
                precision=precision,
                rerank=rerank,
                rerank_margin=rerank_margin,
            )
            t_scan = time.perf_counter() - s_scan
            measured["search_within_buckets"] = t_scan
            measured["seq_search"] = t_scan
            measured["search"] = time.perf_counter() - s
            return dists[:n_q], anns[:n_q], measured
        # Default two-stage scan: bulk pass at fast DEFAULT precision
        # with a k+margin shortlist, then exact HIGHEST-precision rerank
        # of the shortlist (bf16 matmul noise of ±2e-3 would otherwise
        # permute near-tied neighbors; a full-precision bulk scan costs
        # 6x the MXU passes).  qtile=128 measured best at flagship
        # scale: phase-1 top-k and merge cost scale with pair-slots ×
        # chunk (constant in qtile), while larger tiles only cut slab
        # re-reads — not the bottleneck — and push the k-pass working
        # set out of VMEM.
        dists, anns = scan_buckets(
            store,
            q_search,
            order,
            k=k,
            qtile=qtile,
            precision=precision,
            approx_recall=approx_recall,
            rerank=rerank,
            rerank_margin=rerank_margin,
        )
        t_scan = time.perf_counter() - s_scan
        measured["search_within_buckets"] = t_scan
        measured["seq_search"] = t_scan

        measured["search"] = time.perf_counter() - s
        return dists[:n_q], anns[:n_q], measured
