"""Clustering algorithm registry.

Same uniform contract as the reference registry
(``search/li/clustering/__init__.py:9-17``): a
``ClusteringAlgorithm`` is ``(data, n_clusters, params) →
(clustering_object, labels)``.  The reference ships two backends —
faiss k-means (default, seed 2023, ``clustering/faiss_kmeans.py:8-24``)
and sklearn k-means configured to mimic faiss
(``clustering/scikit_kmeans.py:8-29``: ``init="random"``,
``max_iter=25``, ``n_init=1``) — precisely so backends can substitute
for each other.  Here both names map to the one jitted TPU
implementation with faiss-equivalent settings (random init from data
points, 25 Lloyd iterations, training subsample of 256·k points); the
"clustering object" is the centroid matrix.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

from learnedmetricindex_tpu.ops.kmeans import kmeans

#: Contract (reference parity + one extension): ``(data, n_clusters,
#: params) → (clustering_object, labels)``.  ``params`` may carry a
#: ``"rows"`` key — row indices into a device-resident ``data``; a
#: backend honoring it must cluster ONLY those rows and return
#: ``len(rows)`` labels (the builder passes the full corpus plus
#: ``rows`` to avoid materializing per-node subsets).  A backend that
#: cannot must raise rather than silently cluster all of ``data``.
ClusteringAlgorithm = Callable[
    [np.ndarray, int, Optional[Dict[str, Any]]],
    Tuple[Any, np.ndarray],
]


def _tpu_kmeans(
    data, n_clusters: int, parameters: Optional[Dict[str, Any]] = None
):
    if parameters is None:
        parameters = {"seed": 2023}  # cf. faiss_kmeans.py:14
    centroids, labels = kmeans(
        data,
        n_clusters,
        n_iters=parameters.get("max_iter", 25),
        seed=parameters.get("seed", parameters.get("random_state", 2023)),
        max_points_per_centroid=parameters.get("max_points_per_centroid", 256),
        round_sizes=parameters.get("round_sizes", False),
        row_scales=parameters.get("row_scales"),
        rows=parameters.get("rows"),
    )
    return centroids, labels


#: name → algorithm; the reference names are aliases of the TPU path
#: (cf. ``algorithms`` dict, ``clustering/__init__.py:14-17``).
algorithms: Dict[str, ClusteringAlgorithm] = {
    "kmeans": _tpu_kmeans,
    "faiss_kmeans": _tpu_kmeans,
    "scikit_kmeans": _tpu_kmeans,
}
