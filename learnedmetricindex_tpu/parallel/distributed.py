"""Sharded build and query kernels over a ("data", "model") mesh.

These are the multi-chip execution paths of the framework.  The
reference has no distributed counterpart (SURVEY.md §2.3); the designs
follow the standard JAX recipe — annotate input shardings, write plain
array code, let XLA insert the collectives:

* **Sharded k-means** — dataset rows sharded over every mesh device;
  the per-iteration centroid sums/counts are plain ``dot``/``sum``
  reductions, which XLA lowers to ``psum`` over the mesh (ICI).
* **Sharded build step** — one index-build training step: a minibatch
  Adam update on all sibling node MLPs with the stacked-model axis
  sharded over ``"model"`` (expert-parallel analog) and each model's
  minibatch sharded over ``"data"`` (data parallel); gradients
  ``psum`` over ``"data"`` only.
* **Sharded bucket scan** — work items sharded over devices; each
  device emits per-item top-k candidates, merged by one per-query
  ``top_k`` after an implicit all-gather.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from learnedmetricindex_tpu.models.mlp import mlp_apply
from learnedmetricindex_tpu.models.train import NEG_INF


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


# ----------------------------------------------------------------------
# sharded stacked-model training step
# ----------------------------------------------------------------------
def make_sharded_build_step(mesh: Mesh, lr: float):
    """One jitted index-build training step over the mesh.

    Inputs and shardings:

    * ``params``, ``opt_state`` — stacked node-model pytrees, leading
      model axis sharded over ``"model"``;
    * ``xb (M, B, d)``, ``yb (M, B)`` — per-model minibatches, model
      axis over ``"model"``, batch axis over ``"data"``;
    * ``class_mask (M, C)``, ``active (M,)`` — over ``"model"``.

    Returns ``(step_fn, shard_fn)`` where ``shard_fn(params, opt_state,
    xb, yb, class_mask, active)`` places everything with the right
    :class:`NamedSharding` before the first call.
    """
    opt = optax.adam(lr)
    model_s = NamedSharding(mesh, P("model"))
    batch_s = NamedSharding(mesh, P("model", "data"))
    batch3_s = NamedSharding(mesh, P("model", "data", None))

    def shard_fn(params, opt_state, xb, yb, class_mask, active):
        def put_model(tree):
            return jax.tree.map(
                lambda leaf: jax.device_put(
                    leaf,
                    NamedSharding(
                        mesh, P(*(("model",) + (None,) * (leaf.ndim - 1)))
                    ),
                )
                if hasattr(leaf, "ndim") and leaf.ndim >= 1
                else leaf,
                tree,
            )

        return (
            put_model(params),
            put_model(opt_state),
            jax.device_put(xb, batch3_s),
            jax.device_put(yb, batch_s),
            jax.device_put(class_mask, NamedSharding(mesh, P("model", None))),
            jax.device_put(active, model_s),
        )

    @jax.jit
    def step_fn(params, opt_state, xb, yb, class_mask, active):
        n_models = class_mask.shape[0]

        def loss_fn(p):
            logits = jax.vmap(mlp_apply)(p, xb)
            logits = jnp.where(class_mask[:, None, :], logits, NEG_INF)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.maximum(yb, 0)
            )
            ce = jnp.where(yb >= 0, ce, 0.0)
            per_model = jnp.mean(ce, axis=1)
            return jnp.sum(per_model * active), per_model

        (_, per_model), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state_new = opt.update(grads, opt_state, params)
        params_new = optax.apply_updates(params, updates)

        def sel(n, o):
            if hasattr(n, "ndim") and n.ndim >= 1 and n.shape[0] == n_models:
                mask = active.reshape((n_models,) + (1,) * (n.ndim - 1))
                return jnp.where(mask > 0, n, o)
            return n

        params = jax.tree.map(sel, params_new, params)
        opt_state = jax.tree.map(sel, opt_state_new, opt_state)
        return params, opt_state, per_model

    return step_fn, shard_fn


# ----------------------------------------------------------------------
# sharded bucket scan (phase 1 items sharded over the mesh)
# ----------------------------------------------------------------------
def make_sharded_scan(mesh: Mesh, k: int, qtile: int):
    """Jitted sharded scan phase: items (and their chunk slabs) sharded
    over all devices; the candidate merge gathers per query."""
    devs = ("data", "model")
    item_s = NamedSharding(mesh, P(devs))
    repl = NamedSharding(mesh, P())

    @functools.partial(jax.jit, static_argnames=("n_queries",))
    def scan_fn(queries, qidx, item_q_start, item_chunk, item_valid,
                chunk_data, chunk_ids, *, n_queries):
        offs = item_q_start[:, None] + jnp.arange(qtile)[None, :]
        qi = qidx[offs]  # (W, qtile)
        qv = queries[jnp.maximum(qi, 0)]  # (W, qtile, d)
        chunk = chunk_ids.shape[1]
        W_loc = item_chunk.shape[0]
        rows = (
            item_chunk[:, None] * chunk + jnp.arange(chunk)[None, :]
        ).reshape(-1)
        cd = chunk_data[rows].reshape(W_loc, chunk, -1).astype(jnp.float32)
        ids = chunk_ids[item_chunk]
        sims = jnp.einsum(
            "wqd,wcd->wqc", qv, cd, preferred_element_type=jnp.float32
        )
        dists = 1.0 - sims
        dists = jnp.where(ids[:, None, :] == 0, jnp.inf, dists)
        dists = jnp.where(qi[:, :, None] < 0, jnp.inf, dists)
        dists = jnp.where(item_valid[:, None, None], dists, jnp.inf)
        neg, pos = jax.lax.top_k(-dists, k)
        cid = jnp.take_along_axis(
            jnp.broadcast_to(ids[:, None, :], dists.shape), pos, axis=2
        )
        W = qi.shape[0]
        cand_d = (-neg).reshape(W * qtile, k)
        cand_i = cid.reshape(W * qtile, k)
        cand_q = qi.reshape(W * qtile)

        # sort-based merge (see bucket_store._merge_candidates): XLA
        # inserts the cross-shard collectives for the global sort
        R = W * qtile
        q_key = jnp.where(cand_q < 0, n_queries, cand_q).astype(jnp.int32)
        q_rep = jnp.repeat(q_key, k, total_repeat_length=R * k)
        q_s, d_s, i_s = jax.lax.sort(
            (q_rep, cand_d.reshape(R * k), cand_i.reshape(R * k)), num_keys=2
        )
        starts = jnp.searchsorted(q_s, jnp.arange(n_queries, dtype=jnp.int32))
        idx = jnp.minimum(starts[:, None] + jnp.arange(k)[None, :], R * k - 1)
        out_d = d_s[idx]
        out_i = i_s[idx]
        valid = (
            q_s[idx] == jnp.arange(n_queries, dtype=jnp.int32)[:, None]
        ) & (~jnp.isinf(out_d))
        out_d = jnp.where(valid, out_d, jnp.inf)
        out_i = jnp.where(valid, out_i, 0)
        return out_d, out_i

    def place(queries, qidx, item_q_start, item_chunk, item_valid):
        return (
            jax.device_put(queries, repl),
            jax.device_put(qidx, repl),
            jax.device_put(item_q_start, item_s),
            jax.device_put(item_chunk, item_s),
            jax.device_put(item_valid, item_s),
        )

    return scan_fn, place
