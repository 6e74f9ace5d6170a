"""Sharded k-means over a ("data", "model") mesh.

Part of the framework's multi-chip execution layer (the reference has
no distributed counterpart, SURVEY.md §2.3).  The other two sharded
engines live with their single-chip counterparts:

* expert-parallel node-model training —
  ``models/train.py`` ``StackedNodeTrainer(mesh=...)``;
* bucket-sharded scan + cross-chip top-k merge —
  ``parallel/sharded_index.py``.

The design follows the standard JAX recipe — annotate input shardings,
write plain array code, let XLA insert the collectives: dataset rows
sharded over every mesh device; the per-iteration centroid sums/counts
are plain ``dot``/``sum`` reductions, which XLA lowers to ``psum`` over
the mesh (ICI within a slice, DCN across processes).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# ----------------------------------------------------------------------
# sharded k-means
# ----------------------------------------------------------------------
def sharded_kmeans(
    data,
    n_clusters: int,
    mesh: Mesh,
    n_iters: int = 25,
    seed: int = 2023,
    row_scales=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Lloyd's k-means with rows sharded across the whole mesh.

    Semantics match :func:`learnedmetricindex_tpu.ops.kmeans.kmeans`
    (seeded init from data points, deterministic empty-cluster resplit);
    the centroid reduction crosses the mesh via XLA-inserted ``psum``.

    ``data`` may be a host array or a device-resident ``jax.Array``
    (resharded over the mesh without a host round-trip).
    ``row_scales``: per-row dequantization scales for int8 corpora.
    """
    n, d = data.shape
    n_clusters = min(n_clusters, n)
    n_dev = mesh.devices.size
    pad = (-n) % n_dev
    if isinstance(data, jax.Array):
        if pad:
            data = jnp.pad(data, ((0, pad), (0, 0)))
    else:
        data = np.asarray(data, dtype=np.float32)
        if pad:
            data = np.concatenate([data, np.zeros((pad, d), np.float32)])
    if row_scales is not None:
        row_scales = jnp.asarray(row_scales, jnp.float32)
        if pad:
            row_scales = jnp.pad(row_scales, (0, pad))
    row_sharding = NamedSharding(mesh, P(("data", "model"), None))
    label_sharding = NamedSharding(mesh, P(("data", "model")))
    repl = NamedSharding(mesh, P())
    # multi-process mesh: labels must come back replicated, or the
    # np.asarray below would touch non-addressable shards (each process
    # holds only its own); single-process keeps them sharded (cheaper)
    multiproc = len({d.process_index for d in mesh.devices.flat}) > 1
    if multiproc:
        label_sharding = repl

    data_dev = jax.device_put(data, row_sharding)
    scales_dev = (
        None
        if row_scales is None
        else jax.device_put(row_scales, NamedSharding(mesh, P(("data", "model"))))
    )
    key = jax.random.PRNGKey(seed)

    @functools.partial(
        jax.jit,
        static_argnames=("k", "iters"),
        out_shardings=(repl, label_sharding),
    )
    def run(x, scales, n_valid, key, *, k, iters):
        x = x.astype(jnp.float32)
        if scales is not None:
            x = x * scales[:, None]
        row_ids = jnp.arange(x.shape[0])
        valid = (row_ids < n_valid).astype(jnp.float32)
        init_idx = jax.random.randint(key, (k,), 0, n_valid)
        init_idx = (init_idx + jnp.arange(k)) % n_valid
        centroids = x[init_idx]

        def step(c, _):
            sims = jnp.dot(
                x, c.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            c2 = jnp.sum(c * c, axis=1)[None, :]
            labels = jnp.argmin(c2 - 2.0 * sims, axis=1)
            onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32) * valid[:, None]
            sums = jnp.dot(
                onehot.T, x, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            counts = jnp.sum(onehot, axis=0)
            new_c = sums / jnp.maximum(counts, 1.0)[:, None]
            biggest = jnp.argmax(counts)
            eps = 1e-4 * (1.0 + jnp.arange(k, dtype=jnp.float32))[:, None]
            resplit = new_c[biggest][None, :] * (1.0 + eps)
            new_c = jnp.where((counts == 0.0)[:, None], resplit, new_c)
            return new_c, None

        centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
        sims = jnp.dot(
            x, centroids.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        c2 = jnp.sum(centroids * centroids, axis=1)[None, :]
        labels = jnp.argmin(c2 - 2.0 * sims, axis=1).astype(jnp.int32)
        return centroids, labels

    centroids, labels = run(
        data_dev, scales_dev, jnp.int32(n), key, k=n_clusters, iters=n_iters
    )
    return np.asarray(centroids), np.asarray(labels)[:n]
