"""Jitted MLP training — single and many-models-at-once.

Replaces the reference training stack (``search/li/model.py:130-241``:
``NeuralNetwork`` = MLP + CrossEntropyLoss + Adam, full-softmax
``predict_proba``) and its build-time usage pattern
(``LearnedIndexBuilder.py:120-201``): train for ``epochs``, check that
the model's own predictions cover every class, retrain until covered
(at most 1000 rounds).

Two deliberate behavioral improvements over the reference, documented
per SURVEY.md §3.5:

* **True minibatch SGD.**  The reference's ``train_batch`` calls
  ``backward``/``step`` once per epoch *outside* the batch loop, so per
  epoch only the last batch's gradient is applied
  (``model.py:191-211``).  We apply an Adam update per minibatch; the
  all-classes-covered convergence criterion (which is load-bearing —
  it guarantees no empty buckets, ``builder:244-246``) is kept.
* **Sampling with replacement.**  Per step each model draws a uniform
  batch from its own segment instead of a per-epoch permutation; with
  models of different data sizes trained concurrently under ``vmap``
  this keeps every shape static.  (The reference shuffles via
  ``SubsetRandomSampler``, ``builder:170-174``.)

Both divergences are A/B-testable: ``update_rule="reference"``
(trainer/config) re-enables the reference's exact effective update —
one Adam step per epoch from the epoch's runt batch (see
``_run_epochs``) — so the training-dynamics recall delta can be
measured on identical data (``bench.py --hard --update-rule``).

The many-model trainer is the TPU-native replacement for the
reference's sequential per-path loop (``builder:240-278``): all sibling
node models of a level train concurrently as one stacked pytree; models
that reach class coverage are frozen (params and Adam state held) while
the rest continue.

**Virtual grouping.**  Rows are never physically re-sorted: the grouped
layout is an *index* structure — slot ``s`` of the layout maps to
original row ``slot_rows[s]`` — so a 10M×768 dataset is neither copied
on the host nor duplicated in HBM.  Training batches and per-row
prediction gather through ``slot_rows`` (two-level gather, negligible
next to the feature gather itself).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from learnedmetricindex_tpu.models.mlp import (
    init_stacked_mlp,
    mlp_apply,
    stacked_mlp_apply,
)
from learnedmetricindex_tpu.utils.logging import Logger

NEG_INF = -1e9


class GroupedData(NamedTuple):
    """Index-only grouped layout over an unmoved data array.

    Slot space is tile-aligned per model: model ``m`` owns slots
    ``[seg_starts[m], seg_starts[m] + seg_lens[m])`` (padded to a tile
    boundary; every tile belongs to exactly one model, ``tile_model``).
    ``slot_rows[s]`` is the original data row of slot ``s`` (-1 = pad).
    """

    x: jnp.ndarray  # (n_rows, d) device array, ORIGINAL order
    slot_rows: jnp.ndarray  # (total_slots,) int32, -1 = pad
    labels: jnp.ndarray  # (total_slots,) int32, -1 = pad
    tile_model: jnp.ndarray  # (n_tiles,) int32
    seg_starts: jnp.ndarray  # (n_models,) int32, tile-aligned
    seg_lens: jnp.ndarray  # (n_models,) int32, true lengths
    slot_rows_np: np.ndarray  # host copy of slot_rows (for scatters)
    tile: int
    x_scales: Optional[jnp.ndarray] = None  # (n_rows,) f32 — int8 corpora

    def scatter_to_rows(self, slot_values: np.ndarray, n_rows: int, fill=0):
        """Scatter per-slot values back to original row order."""
        out = np.full(n_rows, fill, dtype=np.asarray(slot_values).dtype)
        valid = self.slot_rows_np >= 0
        out[self.slot_rows_np[valid]] = np.asarray(slot_values)[valid]
        return out


def group_rows(
    data,
    group_ids: np.ndarray,
    n_groups: int,
    labels: Optional[np.ndarray] = None,
    tile: int = 4096,
    dtype=jnp.float32,
    scales=None,
) -> GroupedData:
    """Build the index-only grouped layout (vectorized counting sort on
    row *indices*; the data itself is not touched).

    ``data`` may be a host array (uploaded once, as ``dtype``) or an
    already device-resident ``jax.Array`` (used as-is — important when
    host↔device bandwidth is the bottleneck).
    """
    from learnedmetricindex_tpu import native

    group_ids = np.asarray(group_ids)
    counts = native.bincount(group_ids, n_groups)
    padded_counts = np.maximum(-(-counts // tile) * tile, tile)
    seg_starts = np.concatenate([[0], np.cumsum(padded_counts)[:-1]])
    total = int(padded_counts.sum())

    slot_rows, lab = native.fill_slots(
        group_ids, seg_starts, total, labels=labels
    )
    if lab is None:
        lab = np.full(total, -1, dtype=np.int32)

    tile_model = np.repeat(np.arange(n_groups), padded_counts // tile).astype(
        np.int32
    )
    if isinstance(data, jax.Array):
        x = data
    else:
        x = jnp.asarray(np.asarray(data), dtype=dtype)
    if scales is not None and not isinstance(scales, jax.Array):
        scales = jnp.asarray(np.asarray(scales, np.float32))
    return GroupedData(
        x=x,
        slot_rows=jnp.asarray(slot_rows),
        labels=jnp.asarray(lab),
        tile_model=jnp.asarray(tile_model),
        seg_starts=jnp.asarray(seg_starts.astype(np.int32)),
        seg_lens=jnp.asarray(counts.astype(np.int32)),
        slot_rows_np=slot_rows,
        tile=tile,
        x_scales=scales,
    )


def _tree_where_model(active: jnp.ndarray, new, old, n_models: int):
    """Per-model select: leaves with a leading model axis take ``new``
    where the model is active; scalar leaves (e.g. Adam's step count)
    always take ``new``."""

    def sel(n, o):
        if hasattr(n, "ndim") and n.ndim >= 1 and n.shape[0] == n_models:
            mask = active.reshape((n_models,) + (1,) * (n.ndim - 1))
            return jnp.where(mask, n, o)
        return n

    return jax.tree.map(sel, new, old)


def _weighted_mean_ce(ce, yb, class_weight):
    """Per-model reduction of per-sample cross-entropies.

    ``class_weight=None`` reproduces the unweighted mean over the batch
    (invalid pad rows contribute 0).  With a ``(n_models, n_classes)``
    weight array the reduction follows torch's
    ``CrossEntropyLoss(weight=w)`` exactly — Σᵢ w[yᵢ]·ceᵢ / Σᵢ w[yᵢ] —
    the semantics the reference wires its ``class_weight`` parameter
    into (``search/li/model.py:145-161``)."""
    if class_weight is None:
        ce = jnp.where(yb >= 0, ce, 0.0)  # guard: empty-segment pad rows
        return jnp.mean(ce, axis=1)  # (M,)
    w = jnp.take_along_axis(class_weight, jnp.maximum(yb, 0), axis=1)
    w = jnp.where(yb >= 0, w, 0.0)
    return jnp.sum(w * ce, axis=1) / jnp.maximum(
        jnp.sum(w, axis=1), 1e-12
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_models", "batch_size", "steps", "lr", "ref_dynamics"),
)
def _run_epochs(
    params,
    opt_state,
    key,
    x,
    x_scales,
    slot_rows,
    labels,
    seg_starts,
    seg_lens,
    class_mask,
    active,
    class_weight=None,
    *,
    n_models: int,
    batch_size: int,
    steps: int,
    lr: float,
    ref_dynamics: bool = False,
):
    """Run ``steps`` Adam updates on every active model.

    ``ref_dynamics=False`` (default): one update per uniform
    with-replacement minibatch — true minibatch SGD.

    ``ref_dynamics=True`` replicates the reference's effective update
    rule (``search/li/model.py:191-211``): per epoch the torch loop
    forwards every batch but calls ``zero_grad``/``backward``/``step``
    once, OUTSIDE the loop — so the gradient comes solely from the LAST
    batch of the epoch's random permutation, whose length is the runt
    ``((n-1) % 256) + 1`` (torch ``DataLoader`` with ``drop_last=False``;
    the discarded earlier forwards carry no state, so they need not be
    executed).  Here ``steps`` therefore means EPOCHS: each scan step
    takes one Adam update from a uniform batch of exactly that runt
    length (segments that fit in one batch use all their rows — the
    exact reference gradient; larger segments approximate the
    permutation tail's without-replacement draw by with-replacement,
    indistinguishable at reference scales)."""
    opt = optax.adam(lr)
    if ref_dynamics:
        # per-model effective batch length of the reference update
        runt = ((jnp.maximum(seg_lens, 1) - 1) % batch_size) + 1

    def loss_fn(p, xb, yb):
        logits = jax.vmap(mlp_apply)(p, xb)  # (M, B, C)
        logits = jnp.where(class_mask[:, None, :], logits, NEG_INF)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.maximum(yb, 0)
        )
        w = class_weight
        if ref_dynamics and w is None:
            # the reference batch is the masked prefix: torch's mean
            # reduces over the runt length, not the padded batch
            w = jnp.ones((n_models, logits.shape[-1]), jnp.float32)
        per_model = _weighted_mean_ce(ce, yb, w)  # (M,)
        return jnp.sum(per_model * active), per_model

    def step(carry, skey):
        p, s = carry
        idx = seg_starts[:, None] + jax.random.randint(
            skey, (n_models, batch_size), 0, jnp.maximum(seg_lens, 1)[:, None]
        )
        if ref_dynamics:
            # segments within one batch: take ALL rows (the reference's
            # single batch == the whole segment, a deterministic
            # full-segment gradient); larger segments: random rows,
            # truncated to the runt length
            seq = seg_starts[:, None] + (
                jnp.arange(batch_size)[None, :]
                % jnp.maximum(seg_lens, 1)[:, None]
            )
            idx = jnp.where((seg_lens <= batch_size)[:, None], seq, idx)
        rows = slot_rows[idx]  # (M, B) original rows, -1 only if seg empty
        xb = x[jnp.maximum(rows, 0)].astype(jnp.float32)  # (M, B, d)
        if x_scales is not None:
            xb = xb * x_scales[jnp.maximum(rows, 0)][:, :, None]
        yb = jnp.where(rows >= 0, labels[idx], -1)  # (M, B)
        if ref_dynamics:
            yb = jnp.where(
                jnp.arange(batch_size)[None, :] < runt[:, None], yb, -1
            )
        (_, per_model), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, xb, yb
        )
        updates, s_new = opt.update(grads, s, p)
        p_new = optax.apply_updates(p, updates)
        p = _tree_where_model(active, p_new, p, n_models)
        s = _tree_where_model(active, s_new, s, n_models)
        return (p, s), per_model

    (params, opt_state), losses = jax.lax.scan(
        step, (params, opt_state), jax.random.split(key, steps)
    )
    return params, opt_state, losses[-1]


@functools.partial(jax.jit, static_argnames=("tile", "n_classes"))
def _predict_own_tiles(
    params, x, x_scales, slot_rows, tile_model, class_mask, *, tile, n_classes
):
    """Per-slot argmax prediction under the slot's own model.

    Scan over tiles; each tile gathers its one model's parameters (a few
    MB at most) plus its rows and does one matmul chain — no ragged
    per-model loops.
    """
    n_tiles = tile_model.shape[0]
    srt = slot_rows.reshape(n_tiles, tile)

    def body(_, inputs):
        m, rows = inputs
        p_m = jax.tree.map(lambda leaf: leaf[m], params)
        xtile = x[jnp.maximum(rows, 0)].astype(jnp.float32)
        if x_scales is not None:
            xtile = xtile * x_scales[jnp.maximum(rows, 0)][:, None]
        logits = mlp_apply(p_m, xtile)
        logits = jnp.where(class_mask[m][None, :], logits, NEG_INF)
        return None, jnp.argmax(logits, axis=-1).astype(jnp.int32)

    _, preds = jax.lax.scan(body, None, (tile_model, srt))
    return preds.reshape(n_tiles * tile)


@functools.partial(jax.jit, static_argnames=("n_models", "n_classes"))
def _coverage(preds, labels, tile_model, class_mask, *, n_models, n_classes):
    """covered[m] = every valid class of model m appears in its own
    predictions (the reference's convergence criterion,
    ``builder:183-194``)."""
    tile = preds.shape[0] // tile_model.shape[0]
    model_of_row = jnp.repeat(tile_model, tile)
    valid = labels >= 0
    counts = jnp.zeros((n_models, n_classes), jnp.int32).at[
        model_of_row, preds
    ].add(valid.astype(jnp.int32))
    return jnp.all((counts > 0) | ~class_mask, axis=1)


class StackedNodeTrainer(Logger):
    """Trains ``n_models`` same-architecture MLPs concurrently, each on
    its own row segment, until every model's predictions cover all of
    its valid classes.

    ``mesh``: an optional ``("data", "model")`` mesh.  When given, the
    stacked parameter/optimizer pytrees are placed with the model axis
    sharded over ``"model"`` (expert-parallel: sibling node models are
    the experts) and the corpus rows over the whole mesh; the standard
    JAX recipe applies — the jitted step is unchanged, XLA propagates
    the shardings and inserts the collectives (gradient ``psum`` over
    data, batch gathers across row shards).
    """

    def __init__(
        self,
        n_models: int,
        input_dim: int,
        n_classes: int,
        model_type: str = "MLP",
        lr: float = 0.01,
        batch_size: int = 256,
        seed: int = 2023,
        mesh=None,
        update_rule: str = "minibatch",
    ):
        if update_rule not in ("minibatch", "reference"):
            raise ValueError(
                f"update_rule must be 'minibatch' or 'reference', got "
                f"{update_rule!r}"
            )
        self.n_models = n_models
        self.n_classes = n_classes
        self.batch_size = batch_size
        self.lr = lr
        self.update_rule = update_rule
        self.mesh = mesh
        self.key = jax.random.PRNGKey(seed)
        self.key, init_key = jax.random.split(self.key)
        self.params = init_stacked_mlp(
            init_key, n_models, model_type, input_dim, n_classes
        )
        self.opt_state = optax.adam(lr).init(self.params)
        self.class_mask = jnp.ones((n_models, n_classes), bool)
        self.class_weight = None
        if mesh is not None:
            self.params = self._place_model_tree(self.params)
            self.opt_state = self._place_model_tree(self.opt_state)
            self.class_mask = self._place_model_tree(self.class_mask)

    def _place_model_tree(self, tree):
        """Shard every model-stacked leaf over the ``"model"`` axis
        (leaves without the leading model axis — e.g. Adam's step
        counter — are replicated).  On a multi-process mesh the leaves
        go through ``put_global`` (identical host values on every
        process — params are seeded identically), since ``device_put``
        cannot target non-addressable devices."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from learnedmetricindex_tpu.parallel import multiprocess as mp

        model_axis = self.mesh.shape["model"]
        multi = mp.is_multiprocess(self.mesh)

        def put(leaf):
            if (
                hasattr(leaf, "ndim")
                and leaf.ndim >= 1
                and leaf.shape[0] == self.n_models
                and self.n_models % model_axis == 0
            ):
                if multi:
                    return mp.put_global(np.asarray(leaf), self.mesh, P("model"))
                return jax.device_put(leaf, NamedSharding(self.mesh, P("model")))
            if hasattr(leaf, "ndim"):
                # few models (e.g. the level-0 root): replicate; the
                # batch axis still parallelizes over "data"
                if multi:
                    return mp.put_global(np.asarray(leaf), self.mesh, P())
                return jax.device_put(leaf, NamedSharding(self.mesh, P()))
            return leaf

        return jax.tree.map(put, tree)

    def _place_grouped(self, grouped: GroupedData) -> GroupedData:
        """Shard the corpus rows over the whole mesh; the index arrays
        (slot maps, labels — 4 bytes/row) are replicated.

        Multi-process: the corpus must arrive as a global ``jax.Array``
        (e.g. via ``multiprocess.from_process_local``) — it is resharded
        in place with a jitted identity; a process-local corpus is
        replicated host-side (small cases only).  Index arrays are
        identical on every process and go through ``put_global``.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from learnedmetricindex_tpu.parallel import multiprocess as mp

        mesh = self.mesh
        n = grouped.x.shape[0]
        pad = (-n) % mesh.devices.size
        if not mp.is_multiprocess(mesh):
            rows = NamedSharding(mesh, P(("data", "model"), None))
            rows1 = NamedSharding(mesh, P(("data", "model")))
            repl = NamedSharding(mesh, P())
            x = jnp.pad(jnp.asarray(grouped.x), ((0, pad), (0, 0))) if pad else grouped.x
            x_scales = grouped.x_scales
            if x_scales is not None and pad:
                x_scales = jnp.pad(jnp.asarray(x_scales), (0, pad))
            return grouped._replace(
                x=jax.device_put(x, rows),
                x_scales=(
                    None if x_scales is None else jax.device_put(x_scales, rows1)
                ),
                slot_rows=jax.device_put(grouped.slot_rows, repl),
                labels=jax.device_put(grouped.labels, repl),
                tile_model=jax.device_put(grouped.tile_model, repl),
                seg_starts=jax.device_put(grouped.seg_starts, repl),
                seg_lens=jax.device_put(grouped.seg_lens, repl),
            )

        def rows_global(a, spec):
            if a is None:
                return None
            if isinstance(a, jax.Array) and (
                not a.is_fully_addressable or len(a.sharding.device_set) > 1
            ):
                target = NamedSharding(mesh, spec)
                widths = ((0, pad),) + ((0, 0),) * (a.ndim - 1)
                return jax.jit(
                    lambda t: jnp.pad(t, widths) if pad else t,
                    out_shardings=target,
                )(a)
            h = np.asarray(a)
            if pad:
                h = np.pad(h, ((0, pad),) + ((0, 0),) * (h.ndim - 1))
            return mp.put_global(h, mesh, spec)

        def repl_global(a):
            return mp.put_global(np.asarray(a), mesh, P())

        return grouped._replace(
            x=rows_global(grouped.x, P(("data", "model"), None)),
            x_scales=rows_global(grouped.x_scales, P(("data", "model"))),
            slot_rows=repl_global(grouped.slot_rows),
            labels=repl_global(grouped.labels),
            tile_model=repl_global(grouped.tile_model),
            seg_starts=repl_global(grouped.seg_starts),
            seg_lens=repl_global(grouped.seg_lens),
        )

    def set_class_mask(self, mask) -> None:
        """(n_models, n_classes) bool — False marks classes a node does
        not use (its clustering returned fewer clusters; cf. the
        reference's n_categories shrink at ``builder:161-167``)."""
        self.class_mask = jnp.asarray(mask, dtype=bool)
        if self.mesh is not None:
            self.class_mask = self._place_model_tree(self.class_mask)

    def set_class_weight(self, weight) -> None:
        """(n_models, n_classes) f32 per-class loss weights, torch
        ``CrossEntropyLoss(weight=)`` semantics (reference
        ``model.py:145-161``); ``None`` restores the unweighted mean.
        Masked-out classes' weights are irrelevant (their labels never
        occur)."""
        if weight is None:
            self.class_weight = None
            return
        self.class_weight = jnp.asarray(weight, jnp.float32)
        if self.mesh is not None:
            self.class_weight = self._place_model_tree(self.class_weight)

    def fit(
        self,
        grouped: GroupedData,
        epochs: int,
        max_rounds: int = 1000,
    ) -> Tuple[np.ndarray, int]:
        """Train until covered; returns (per-slot predictions over the
        grouped layout, number of rounds run).

        Raises ``RuntimeError`` after ``max_rounds`` rounds without full
        coverage (cf. ``builder:191-192``).
        """
        from learnedmetricindex_tpu.parallel import multiprocess as mp

        seg_lens_np = np.asarray(grouped.seg_lens)
        max_len = max(int(seg_lens_np.max()), 1)
        ref_dynamics = self.update_rule == "reference"
        if ref_dynamics:
            steps = epochs  # ONE update per epoch (model.py:191-211)
        else:
            steps_per_epoch = max(1, -(-max_len // self.batch_size))
            steps = steps_per_epoch * epochs

        multi = self.mesh is not None and mp.is_multiprocess(self.mesh)
        if self.mesh is not None:
            grouped = self._place_grouped(grouped)
        active = np.ones((self.n_models,), bool)
        rounds = 0
        # Bound the steps per jitted dispatch: a 200-epoch build at 10M
        # is ~2M minibatch steps, and a single multi-minute lax.scan
        # execution gets killed by remote-runtime execution limits
        # (observed: "TPU worker process crashed").  Chunking costs one
        # extra compile for the remainder shape and nothing else.
        import os as _os

        max_steps = int(_os.environ.get("LMI_MAX_STEPS_PER_CALL", 50_000))
        while True:
            act = active.astype(np.float32)
            if multi:
                from jax.sharding import PartitionSpec as P

                act = mp.put_global(act, self.mesh, P())
            remaining = steps
            while remaining > 0:
                s = min(remaining, max_steps)
                self.key, skey = jax.random.split(self.key)
                self.params, self.opt_state, losses = _run_epochs(
                    self.params,
                    self.opt_state,
                    skey,
                    grouped.x,
                    grouped.x_scales,
                    grouped.slot_rows,
                    grouped.labels,
                    grouped.seg_starts,
                    grouped.seg_lens,
                    self.class_mask,
                    act,
                    self.class_weight,
                    n_models=self.n_models,
                    batch_size=self.batch_size,
                    steps=s,
                    lr=self.lr,
                    ref_dynamics=ref_dynamics,
                )
                remaining -= s
            preds = _predict_own_tiles(
                self.params,
                grouped.x,
                grouped.x_scales,
                grouped.slot_rows,
                grouped.tile_model,
                self.class_mask,
                tile=grouped.tile,
                n_classes=self.n_classes,
            )
            covered_dev = _coverage(
                preds,
                grouped.labels,
                grouped.tile_model,
                self.class_mask,
                n_models=self.n_models,
                n_classes=self.n_classes,
            )
            covered = mp.to_host_replicated(covered_dev).astype(bool)
            rounds += 1
            if covered.all():
                break
            if rounds > max_rounds:
                raise RuntimeError(
                    "The model did not converge after "
                    f"{max_rounds} iterations."
                )  # cf. builder:191-192
            active = ~covered
            self.logger.debug(
                "round %d: %d/%d models covered",
                rounds,
                int(covered.sum()),
                self.n_models,
            )
        if rounds > 1:
            self.logger.debug(
                "Trained for %d epochs instead of %d.", rounds * epochs, epochs
            )
        return mp.to_host_replicated(preds), rounds

    def predict_slots(self, grouped: GroupedData) -> np.ndarray:
        """Per-slot argmax under each slot's own model."""
        from learnedmetricindex_tpu.parallel import multiprocess as mp

        return mp.to_host_replicated(
            _predict_own_tiles(
                self.params,
                grouped.x,
                grouped.x_scales,
                grouped.slot_rows,
                grouped.tile_model,
                self.class_mask,
                tile=grouped.tile,
                n_classes=self.n_classes,
            )
        )

    def predict_proba_all(self, queries) -> jnp.ndarray:
        """All models on the same queries → probabilities
        (n_models, n_queries, n_classes), invalid classes at 0."""
        logits = stacked_mlp_apply(self.params, jnp.asarray(queries))
        logits = jnp.where(self.class_mask[:, None, :], logits, NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1)
        # A fully-masked model (invalid node slot) softmaxes to uniform;
        # zero it out explicitly so such nodes can never rank buckets.
        return jnp.where(self.class_mask[:, None, :], probs, 0.0)


@functools.partial(jax.jit, static_argnames=("epochs", "lr"))
def _full_batch_epochs(
    params, opt_state, x, y, class_mask, class_weight=None, *, epochs, lr
):
    """One Adam step per epoch on the ENTIRE dataset (reference
    ``train`` semantics, ``model.py:166-189``; 1-model stacked pytree)."""
    opt = optax.adam(lr)

    def loss_fn(p):
        logits = jax.vmap(mlp_apply)(p, x[None])[0]  # (n, C)
        logits = jnp.where(class_mask[0][None, :], logits, NEG_INF)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        return _weighted_mean_ce(ce[None], y[None], class_weight)[0]

    def step(carry, _):
        p, s = carry
        grads = jax.grad(loss_fn)(p)
        updates, s = opt.update(grads, s, p)
        return (optax.apply_updates(p, updates), s), None

    (params, opt_state), _ = jax.lax.scan(
        step, (params, opt_state), None, length=epochs
    )
    return params, opt_state


class NeuralNetwork(Logger):
    """Single-model wrapper with the reference API surface
    (``search/li/model.py:130-241``): ``train``/``train_batch``,
    ``predict``, ``predict_proba``.  Internally a 1-model
    :class:`StackedNodeTrainer`."""

    def __init__(
        self,
        input_dim: int,
        output_dim: int,
        lr: float = 0.1,
        model_type: str = "MLP",
        class_weight=None,
        seed: int = 2023,
        batch_size: int = 256,
    ):
        self._trainer = StackedNodeTrainer(
            1, input_dim, output_dim, model_type, lr, batch_size, seed
        )
        if class_weight is not None:
            class_weight = np.asarray(class_weight, np.float32)
            if class_weight.shape != (output_dim,):
                raise ValueError(
                    f"class_weight must have shape ({output_dim},), got "
                    f"{class_weight.shape}"
                )
            # torch CrossEntropyLoss(weight=) semantics, wired into both
            # train paths like the reference (model.py:145-161)
            self._trainer.set_class_weight(class_weight[None, :])
        self.output_dim = output_dim

    @property
    def params(self):
        return jax.tree.map(lambda leaf: leaf[0], self._trainer.params)

    def train_batch(self, X, y, epochs: int = 5) -> None:
        """One round of ``epochs`` epochs of minibatch Adam (no coverage
        loop — cf. ``model.py:191-211``)."""
        grouped = group_rows(
            np.asarray(X, np.float32),
            np.zeros(len(X), np.int64),
            1,
            labels=y,
            tile=4096,
        )
        seg_len = int(np.asarray(grouped.seg_lens)[0])
        steps = max(1, -(-seg_len // self._trainer.batch_size)) * epochs
        self._trainer.key, ekey = jax.random.split(self._trainer.key)
        (
            self._trainer.params,
            self._trainer.opt_state,
            _,
        ) = _run_epochs(
            self._trainer.params,
            self._trainer.opt_state,
            ekey,
            grouped.x,
            grouped.x_scales,
            grouped.slot_rows,
            grouped.labels,
            grouped.seg_starts,
            grouped.seg_lens,
            self._trainer.class_mask,
            jnp.ones((1,), jnp.float32),
            self._trainer.class_weight,
            n_models=1,
            batch_size=self._trainer.batch_size,
            steps=steps,
            lr=self._trainer.lr,
        )

    def train(self, X, y, epochs: int = 5) -> None:
        """Full-batch training: ONE Adam step per epoch on the whole
        dataset — the reference's (unused-in-repo) ``train`` semantics
        (``model.py:166-189``), not an alias of :meth:`train_batch`."""
        x = jnp.asarray(np.asarray(X, np.float32))
        yv = jnp.asarray(np.asarray(y, np.int32))
        (
            self._trainer.params,
            self._trainer.opt_state,
        ) = _full_batch_epochs(
            self._trainer.params,
            self._trainer.opt_state,
            x,
            yv,
            self._trainer.class_mask,
            self._trainer.class_weight,
            epochs=epochs,
            lr=self._trainer.lr,
        )

    def predict(self, X) -> np.ndarray:
        """Argmax class per row (cf. ``model.py:213-224``)."""
        logits = mlp_apply(self.params, jnp.asarray(X, jnp.float32))
        return np.asarray(jnp.argmax(logits, axis=-1).astype(jnp.int32))

    def predict_proba(self, X) -> Tuple[np.ndarray, np.ndarray]:
        """(probs sorted desc, class ids), full softmax + top-all —
        cf. ``model.py:226-241``."""
        logits = mlp_apply(self.params, jnp.asarray(X, jnp.float32))
        prob = jax.nn.softmax(logits, axis=-1)
        probs, classes = jax.lax.top_k(prob, prob.shape[-1])
        return np.asarray(probs), np.asarray(classes)


def train_until_covered(
    data,
    labels,
    n_classes: int,
    *,
    model_type: str = "MLP",
    lr: float = 0.01,
    epochs: int = 100,
    batch_size: int = 256,
    seed: int = 2023,
    max_rounds: int = 1000,
) -> Tuple[StackedNodeTrainer, np.ndarray]:
    """Convenience single-model path: train until the model's own
    predictions use every class (``builder:183-194``); returns
    (trainer, per-row predictions in original row order)."""
    n = len(data)
    d = data.shape[1]
    trainer = StackedNodeTrainer(
        1, d, n_classes, model_type, lr, batch_size, seed
    )
    grouped = group_rows(data, np.zeros(n, np.int64), 1, labels=labels)
    preds_slots, _ = trainer.fit(grouped, epochs, max_rounds)
    return trainer, grouped.scatter_to_rows(preds_slots, n)
