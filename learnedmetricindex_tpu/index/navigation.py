"""Query navigation: from per-node probabilities to a bucket visit order.

The reference interleaves model inference with a per-query priority
queue: pop the most probable path, run that node's MLP on the matching
query subset, push children, re-sort, repeat
(``search/li/LearnedIndex.py:164-301`` + ``PriorityQueue.py``).  That
couples tiny per-node forwards to serial host control flow.

Here the two concerns are decoupled:

1. **All probabilities first.**  Every level's node models are stacked,
   so all conditional probabilities ``P(child | node)`` for the whole
   tree come from one batched einsum per level (MXU-friendly), done by
   the caller (``LearnedIndex._navigate_device``).
2. **Traversal as an array state machine.**  Given the precomputed
   entry probabilities, the reference's best-first traversal is replayed
   exactly: each tree entry (node or leaf) is hidden / queued / popped;
   one ``lax.while_loop`` iteration pops the most probable queued entry
   for every unfinished query simultaneously, unlocking its children or
   emitting the leaf.  Priorities are the reference's: a child is ranked
   by its *conditional* probability alone, not the joint path
   probability (``LearnedIndex.py:286-299`` pushes
   ``probabilities[:, child_idx]`` unscaled).

A faster ``joint`` policy (rank leaves by ``∏ P(child|node)``, one
``top_k``) is provided as a TPU-friendly alternative; ``best_first``
is the default and reproduces reference semantics exactly.

Tie-breaking: the reference resolves equal probabilities via its
argsort history (``PriorityQueue.py:58-94``); we use ``argmax`` (lowest
entry index wins).  Exact float ties are the only divergence.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np

INVALID = -1.0  # entry probability marker; valid probabilities are >= 0


class TreeLayout(NamedTuple):
    """Static entry numbering for an index tree.

    Level ℓ (1-based) holds ``prod(n_categories[:ℓ])`` entries — one per
    path prefix — numbered contiguously from ``offsets[ℓ-1]``.  Leaves
    are the last level's entries; a leaf's local index is the *global
    bucket id* (row-major over the path, the dense analog of the
    reference's ``bucket_paths`` tuples, ``builder:276-278``).
    """

    n_categories: Tuple[int, ...]
    offsets: Tuple[int, ...]  # per level, len = n_levels + 1 (end sentinel)
    child_base: np.ndarray  # (E,) first child entry, 0 for leaves
    child_count: np.ndarray  # (E,) n children, 0 for leaves
    is_leaf: np.ndarray  # (E,) bool

    @property
    def n_entries(self) -> int:
        return int(self.offsets[-1])

    @property
    def n_leaves(self) -> int:
        return int(self.offsets[-1] - self.offsets[-2])

    @classmethod
    def create(cls, n_categories: Sequence[int]) -> "TreeLayout":
        n_categories = tuple(int(c) for c in n_categories)
        counts = []
        acc = 1
        for c in n_categories:
            acc *= c
            counts.append(acc)
        offsets = [0]
        for cnt in counts:
            offsets.append(offsets[-1] + cnt)
        E = offsets[-1]
        child_base = np.zeros(E, dtype=np.int32)
        child_count = np.zeros(E, dtype=np.int32)
        is_leaf = np.zeros(E, dtype=bool)
        for lvl in range(len(n_categories)):
            lo, hi = offsets[lvl], offsets[lvl + 1]
            if lvl == len(n_categories) - 1:
                is_leaf[lo:hi] = True
            else:
                c_next = n_categories[lvl + 1]
                j = np.arange(hi - lo)
                child_base[lo:hi] = offsets[lvl + 1] + j * c_next
                child_count[lo:hi] = c_next
        return cls(
            n_categories=n_categories,
            offsets=tuple(offsets),
            child_base=child_base,
            child_count=child_count,
            is_leaf=is_leaf,
        )


def flatten_entry_probs_device(
    level_probs: List[jnp.ndarray], level_valid
) -> jnp.ndarray:
    """Traced core of :func:`flatten_entry_probs` (shared with the
    single-dispatch ``index._navigate_device``): concatenate per-level
    probabilities into (Q, E) entry scores, invalid entries at
    :data:`INVALID`."""
    Q = level_probs[0].shape[0]
    parts = []
    for probs, valid in zip(level_probs, level_valid):
        p = jnp.where(jnp.asarray(valid)[None, :, :], probs, INVALID)
        parts.append(p.reshape(Q, -1))
    return jnp.concatenate(parts, axis=1)


def flatten_entry_probs(
    layout: TreeLayout, level_probs: List[jnp.ndarray], level_valid: List[np.ndarray]
) -> jnp.ndarray:
    """Concatenate per-level probabilities into (Q, E) entry scores.

    ``level_probs[ℓ]``: (Q, n_nodes_ℓ, C_ℓ) conditional probabilities
    (n_nodes_0 = 1 for the root).  ``level_valid[ℓ]``: same shape bool
    (False = class unused by that node after clustering shrink,
    cf. ``builder:161-167``); invalid entries score :data:`INVALID`.
    """
    flat = flatten_entry_probs_device(level_probs, level_valid)
    assert flat.shape[1] == layout.n_entries
    return flat


@functools.partial(
    jax.jit, static_argnames=("n_buckets", "layout_key", "frontier")
)
def _best_first_device(
    entry_probs: jnp.ndarray,  # (Q, E)
    child_base: jnp.ndarray,
    child_count: jnp.ndarray,
    is_leaf: jnp.ndarray,
    first_level_end: jnp.ndarray,
    *,
    n_buckets: int,
    layout_key: Tuple,
    frontier: int = 16,
):
    """Frontier-``F`` best-first traversal.

    Each iteration takes the top-``F`` queued entries per query and
    pops the longest PREFIX of leaves plus (at most) the first
    internal entry.  This reproduces one-pop-at-a-time semantics
    exactly: a leaf pop unlocks nothing, so the pop sequence can only
    diverge AFTER the first internal pop — whose unlocked children
    (ranked by conditional probability, reference
    ``LearnedIndex.py:286-299``) may outrank everything still queued
    and are therefore re-ranked next iteration.  Visit-heavy sweeps
    (``n_buckets`` near ``n_leaves``, the reference's
    ``--buckets-perc 100`` end) emit up to ``F`` leaves per iteration
    instead of one."""
    Q, E = entry_probs.shape
    HIDDEN, QUEUED, POPPED = 0, 1, 2
    F = max(1, min(frontier, E))
    leaf_offset = jnp.int32(layout_key[-2])  # first leaf entry index

    col = jnp.arange(E, dtype=jnp.int32)[None, :]
    status0 = jnp.where(
        col < first_level_end, jnp.uint8(QUEUED), jnp.uint8(HIDDEN)
    ).repeat(Q, axis=0)

    order0 = jnp.full((Q, n_buckets), -1, jnp.int32)
    emitted0 = jnp.zeros((Q,), jnp.int32)
    rows = jnp.arange(Q, dtype=jnp.int32)[:, None]

    def cond(state):
        status, emitted, order = state
        queued_valid = (status == QUEUED) & (entry_probs > INVALID + 0.5)
        return jnp.any((emitted < n_buckets) & jnp.any(queued_valid, axis=1))

    def body(state):
        status, emitted, order = state
        masked = jnp.where(status == QUEUED, entry_probs, -jnp.inf)
        # top_k ties → ascending index, matching repeated argmax pops
        vals, pops = jax.lax.top_k(masked, F)  # (Q, F)
        pops = pops.astype(jnp.int32)
        valid_f = vals > INVALID + 0.5
        leaf_f = is_leaf[pops]

        # longest leaf prefix + the first internal entry (see docstring)
        prev_all_leaf = jnp.cumprod(
            jnp.concatenate(
                [jnp.ones((Q, 1), jnp.int32), leaf_f[:, :-1].astype(jnp.int32)],
                axis=1,
            ),
            axis=1,
        ).astype(bool)
        take_pfx = prev_all_leaf & valid_f
        emit_pfx = take_pfx & leaf_f
        # leaves popped strictly before batch position j
        before = jnp.cumsum(emit_pfx.astype(jnp.int32), axis=1) - emit_pfx
        # sequential gate: entry j is popped iff the query still needs
        # buckets at that point (emitted-so-far < n_buckets)
        take = take_pfx & (emitted[:, None] + before < n_buckets)

        # mark popped (top_k positions are distinct per row)
        cur = status[rows, pops]
        status = status.at[rows, pops].set(
            jnp.where(take, jnp.uint8(POPPED), cur)
        )

        # emit leaves at their sequential slots
        is_emit = take & leaf_f
        slot = jnp.where(is_emit, emitted[:, None] + before, n_buckets)
        order = order.at[rows, slot].set(pops - leaf_offset, mode="drop")
        emitted = emitted + jnp.sum(is_emit, axis=1, dtype=jnp.int32)

        # unlock children of the (single) popped internal entry
        internal = take & ~leaf_f  # at most one True per row
        any_int = jnp.any(internal, axis=1)
        pop_i = pops[rows[:, 0], jnp.argmax(internal, axis=1)]
        base = child_base[pop_i][:, None]
        cnt = child_count[pop_i][:, None]
        in_range = (col >= base) & (col < base + cnt)
        unlock = in_range & any_int[:, None] & (status == HIDDEN)
        status = jnp.where(unlock, jnp.uint8(QUEUED), status)
        return status, emitted, order

    _, _, order = jax.lax.while_loop(cond, body, (status0, emitted0, order0))
    return order


def nav_frontier() -> int:
    """Frontier width ``F`` of the best-first traversal (see
    :func:`_best_first_device`): up to ``F`` entries popped per
    while-loop iteration without changing the pop order.  Override via
    ``LMI_NAV_FRONTIER`` (1 = the one-pop-per-iteration loop)."""
    import os

    return max(1, int(os.environ.get("LMI_NAV_FRONTIER", 16)))


#: Default ceiling on the best-first state machine (bytes of per-query
#: entry state).  The traversal carries (Q, E) f32 probabilities + (Q, E)
#: uint8 status and pops ONE entry per while-loop iteration, so a wide
#: tree (E = ∏ n_categories entries) at a large query batch is both a
#: silent multi-GB allocation and a serially-popping loop.  Override via
#: the ``LMI_MAX_NAV_STATE_BYTES`` environment variable.
MAX_NAV_STATE_BYTES = 1 << 30


def check_best_first_budget(n_queries: int, n_entries: int) -> None:
    """Fail loudly when the best-first state machine would exceed the
    configured budget (see :data:`MAX_NAV_STATE_BYTES`) instead of
    silently allocating it.  The single-controller public path no
    longer hits this: ``index.compute_bucket_order`` navigates wide
    trees in budget-sized query slices (:func:`max_best_first_queries`).
    The guard remains for multi-process global batches (where slicing
    would issue per-slice cross-process collectives) and for direct
    :func:`best_first_order` callers; ``policy="joint"`` (one
    joint-probability ``top_k``, no traversal state) is the other way
    out.

    Call this BEFORE materializing the (Q, E) ``entry_probs`` array —
    the probs themselves are 4/5 of the budget being guarded.  The
    public path does (``index.compute_bucket_order`` checks before
    flattening); :func:`best_first_order` re-checks, but by then a
    caller who built ``entry_probs`` by hand has already paid that
    allocation."""
    import os

    budget = int(
        os.environ.get("LMI_MAX_NAV_STATE_BYTES", MAX_NAV_STATE_BYTES)
    )
    state_bytes = n_queries * n_entries * 5  # f32 probs + uint8 status
    if state_bytes > budget:
        raise ValueError(
            f"best-first navigation state would be {state_bytes/1e9:.2f} "
            f"GB ({n_queries} queries x {n_entries} tree entries) — over "
            f"the {budget/1e9:.2f} GB budget. Use policy='joint' (exact "
            "for joint-probability ranking, no traversal state), search "
            "in smaller query batches, or raise LMI_MAX_NAV_STATE_BYTES."
        )


def max_best_first_queries(n_entries: int) -> int:
    """Largest per-dispatch query count that keeps the best-first
    traversal state (``n_entries * 5`` bytes per query, see
    :func:`check_best_first_budget`) within the configured budget —
    rounded down to a power of two so the sliced dispatches reuse one
    compiled program.  The single-controller public path
    (``index.compute_bucket_order``) navigates wide trees in query
    slices of this size instead of failing; the traversal is per-query
    independent, so slicing is exact.  When even ONE query's state
    exceeds the budget, slicing cannot help — raise the loud budget
    error rather than silently dispatch over-budget 1-query slices."""
    import os

    budget = int(
        os.environ.get("LMI_MAX_NAV_STATE_BYTES", MAX_NAV_STATE_BYTES)
    )
    per_q = max(int(n_entries) * 5, 1)
    m = budget // per_q
    if m < 1:
        check_best_first_budget(1, n_entries)  # raises
    return 1 << (int(m).bit_length() - 1)


def _quantize_visits(n_buckets: int, n_leaves: int) -> int:
    """Round the compiled emit capacity up to a power of two so
    sweeping ``n_buckets`` (the reference's ``--buckets-perc`` sweep)
    reuses a logarithmic set of compiled programs — each distinct
    capacity otherwise recompiles the traversal while-loop for seconds
    to minutes.  Best-first order has the prefix property, so
    computing a few extra visits and slicing changes nothing; the
    extra emit iterations are bounded by 2×."""
    cap = 1 << max(int(n_buckets) - 1, 0).bit_length()
    return min(n_leaves, max(cap, 1))


def best_first_order(
    layout: TreeLayout, entry_probs: jnp.ndarray, n_buckets: int
) -> np.ndarray:
    """Reference-parity best-first visit order → (Q, n_buckets) global
    bucket ids (-1 where a query ran out of reachable buckets)."""
    check_best_first_budget(entry_probs.shape[0], layout.n_entries)
    n_buckets = min(n_buckets, layout.n_leaves)
    cap = _quantize_visits(n_buckets, layout.n_leaves)
    order = _best_first_device(
        entry_probs,
        jnp.asarray(layout.child_base),
        jnp.asarray(layout.child_count),
        jnp.asarray(layout.is_leaf),
        jnp.int32(layout.offsets[1]),
        n_buckets=cap,
        layout_key=layout.offsets,
        frontier=nav_frontier(),
    )
    return np.asarray(order[:, :n_buckets])


@functools.partial(jax.jit, static_argnames=("n_buckets",))
def _joint_topk(leaf_probs: jnp.ndarray, *, n_buckets: int):
    probs, ids = jax.lax.top_k(leaf_probs, n_buckets)
    return jnp.where(probs > INVALID + 0.5, ids, -1)


def joint_order_device(
    level_probs: List[jnp.ndarray], level_valid, cap: int
) -> jnp.ndarray:
    """Traced core of :func:`joint_order` (shared with
    ``index._navigate_device``)."""
    Q = level_probs[0].shape[0]
    acc = None
    for probs, valid in zip(level_probs, level_valid):
        p = jnp.where(jnp.asarray(valid)[None, :, :], probs, 0.0)
        if acc is None:
            acc = p.reshape(Q, -1)
        else:
            acc = (acc[:, :, None] * p).reshape(Q, -1)
    # leaves with zero accumulated probability are unreachable
    acc = jnp.where(acc > 0.0, acc, INVALID)
    return _joint_topk(acc, n_buckets=cap)


def joint_order(
    layout: TreeLayout,
    level_probs: List[jnp.ndarray],
    level_valid: List[np.ndarray],
    n_buckets: int,
) -> np.ndarray:
    """Rank leaves by joint path probability ``∏ P(child|node)`` — the
    principled TPU-fast policy (single ``top_k``, no traversal loop)."""
    n_buckets = min(n_buckets, layout.n_leaves)
    cap = _quantize_visits(n_buckets, layout.n_leaves)
    order = joint_order_device(level_probs, level_valid, cap)
    return np.asarray(order[:, :n_buckets])


def single_level_order_device(
    root_probs: jnp.ndarray, valid, cap: int
) -> jnp.ndarray:
    """Traced core of :func:`topk_order_single_level` (shared with
    ``index._navigate_device``)."""
    probs = jnp.where(jnp.asarray(valid)[None, :], root_probs, INVALID)
    return _joint_topk(probs, n_buckets=cap)


def topk_order_single_level(
    root_probs: jnp.ndarray, valid: np.ndarray, n_buckets: int
) -> np.ndarray:
    """1-level navigation: top ``n_buckets`` classes of the root model
    (the reference's special case, ``LearnedIndex.py:209-214``)."""
    n_buckets = min(n_buckets, root_probs.shape[1])
    cap = _quantize_visits(n_buckets, root_probs.shape[1])
    order = single_level_order_device(root_probs, valid, cap)
    return np.asarray(order[:, :n_buckets])
