"""Dataset I/O and synthetic data.

Host-side equivalents of the reference driver's data plumbing
(``search/search.py:31-48`` download, ``:136-144`` HDF5 load +
L2-normalization).  HDF5 stays on the host (h5py); arrays are fed to the
device with ``jax.device_put`` by the callers.

Adds a seeded synthetic blob generator so the test-suite and benchmarks
never need the 800 MB LAION downloads (the reference has no offline
path; its CI downloads real data, ``.github/workflows/ci.yml:80-122``).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

SISAP_URL = "https://sisap-23-challenge.s3.amazonaws.com/SISAP23-Challenge"

#: dataset kind → HDF5 key, mirroring the reference CLI defaults
#: (``search/search.py:308-309`` and ``evaluate_learned_index``'s
#: hard-coded ``clip768v2``/``emb`` pair at ``search/search.py:192-193``).
KIND_TO_KEY = {
    "pca32v2": "pca32",
    "pca96v2": "pca96",
    "clip768v2": "emb",
    "hammingv2": "hamming",
}


def normalize(x: np.ndarray) -> np.ndarray:
    """Row-wise L2 normalization (cf. ``sklearn.preprocessing.normalize``
    used at ``search/search.py:142-144``)."""
    x = np.asarray(x, dtype=np.float32)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms = np.where(norms == 0.0, 1.0, norms)
    return x / norms


def dataset_urls(kind: str, size: str) -> dict:
    """SISAP'23 LAION challenge URLs (cf. ``search/search.py:38-44``)."""
    return {
        "query": f"{SISAP_URL}/public-queries-10k-{kind}.h5",
        "dataset": f"{SISAP_URL}/laion2B-en-{kind}-n={size}.h5",
    }


def prepare(
    kind: str, size: str, data_dir: str = "data", download: bool = True
) -> Tuple[str, str]:
    """Return paths to the dataset + query HDF5 files, downloading only
    what is missing (cf. ``search/search.py:38-48``).

    **Pre-staged files are used as-is, without touching the network**:
    place them at ``<data_dir>/<kind>/<size>/dataset.h5`` and
    ``<data_dir>/<kind>/<size>/query.h5`` (e.g. copied from a
    network-enabled host) and this function returns immediately.  With
    ``download=False`` a missing file raises a ``FileNotFoundError``
    naming the expected path and source URL instead of attempting a
    download — the explicit offline mode.
    """
    urls = dataset_urls(kind, size)
    paths = {}
    for version, url in urls.items():
        target = os.path.join(data_dir, kind, size, f"{version}.h5")
        if not os.path.exists(target):
            if not download:
                raise FileNotFoundError(
                    f"{target} is not staged and download=False; stage "
                    f"the file there (source: {url}) to run offline"
                )
            from urllib.request import urlretrieve

            Path(target).parent.mkdir(parents=True, exist_ok=True)
            urlretrieve(url, target)
        assert os.path.exists(target), f"Failed to download {url}"
        paths[version] = target
    return paths["dataset"], paths["query"]


def load_h5(path: str, key: str) -> np.ndarray:
    import h5py

    with h5py.File(path, "r") as f:
        return np.asarray(f[key], dtype=np.float32)


def load_dataset(
    kind: str,
    size: str,
    data_dir: str = "data",
    key: Optional[str] = None,
    preprocess: bool = True,
    download: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Load (data, queries) for a SISAP kind/size, normalizing if asked.

    ``download=False`` requires the files to be pre-staged (see
    :func:`prepare`) — the offline path for real-data benchmarks."""
    key = key or KIND_TO_KEY.get(kind, kind)
    dataset_path, query_path = prepare(kind, size, data_dir, download=download)
    data = load_h5(dataset_path, key)
    queries = load_h5(query_path, key)
    if preprocess:
        data, queries = normalize(data), normalize(queries)
    return data, queries


def synthetic_blobs(
    n: int,
    d: int,
    n_queries: int,
    n_clusters: int = 16,
    seed: int = 2023,
    normalized: bool = True,
    cluster_std: float = 0.25,
) -> Tuple[np.ndarray, np.ndarray]:
    """Seeded Gaussian blobs on the unit sphere.

    Returns ``(data, queries)`` with queries drawn from the same mixture,
    mimicking the clustered structure of CLIP embeddings so learned
    partitions are meaningful in tests.
    """
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    def sample(count: int) -> np.ndarray:
        assignment = rng.integers(0, n_clusters, size=count)
        points = centers[assignment] + cluster_std * rng.normal(
            size=(count, d)
        ).astype(np.float32)
        return points.astype(np.float32)

    data, queries = sample(n), sample(n_queries)
    if normalized:
        data, queries = normalize(data), normalize(queries)
    return data, queries
