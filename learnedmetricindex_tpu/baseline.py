"""Brute-force baseline index.

Same API as the reference ``Baseline`` (``search/li/Baseline.py:11-21``):
``build()`` is a no-op, ``search`` does exact cosine-distance kNN and
returns 1-based neighbor ids — but here it is one tiled device matmul +
``lax.top_k`` instead of a full ``sklearn`` n×q matrix on the host.
"""

from __future__ import annotations

import time

import numpy as np

from learnedmetricindex_tpu.ops.knn import exact_knn
from learnedmetricindex_tpu.utils.logging import Logger
from learnedmetricindex_tpu.data import normalize


class Baseline(Logger):
    def __init__(self):
        # cache the normalized corpus by identity so repeat searches
        # (the reference's n_buckets sweep pattern) skip the host-side
        # O(n·d) re-normalization
        self._norm_cache = None

    def build(self, data) -> float:
        s = time.perf_counter()
        self.logger.info("No build step for the brute-force baseline.")
        return time.perf_counter() - s

    def _normalized(self, data):
        """Identity-keyed cache: holds BOTH the raw array and one
        normalized f32 copy for the Baseline's lifetime, and assumes the
        caller does not mutate ``data`` in place between searches (an
        in-place update with the same array object would serve stale
        neighbors — pass a fresh array, or a fresh ``Baseline``, after
        mutating)."""
        if self._norm_cache is not None and self._norm_cache[0] is data:
            return self._norm_cache[1]
        normed = normalize(np.asarray(data))
        self._norm_cache = (data, normed)
        return normed

    def search(self, queries, data, k: int = 10):
        """Exact cosine kNN; returns ``(dists, nns 1-based, seconds)``
        (cf. ``Baseline.search``, ``search/li/Baseline.py:11-16``)."""
        s = time.perf_counter()
        dists, nns = exact_knn(
            self._normalized(data),
            normalize(np.asarray(queries)),
            k=k,
            metric="cosine",
        )
        return dists, nns, time.perf_counter() - s
