"""Navigation: best-first state machine vs a NumPy re-implementation of
the reference priority-queue traversal (LearnedIndex.py:164-301)."""

import numpy as np
import jax.numpy as jnp

from learnedmetricindex_tpu.index.navigation import (
    TreeLayout,
    best_first_order,
    flatten_entry_probs,
    joint_order,
    topk_order_single_level,
)


def reference_best_first(level_probs, n_categories, n_buckets):
    """Faithful re-implementation of the reference semantics: pop the
    highest-probability queued path; internal → push children with their
    *conditional* probabilities; leaf → emit.  Per query independently."""
    Q = level_probs[0].shape[0]
    L = len(n_categories)
    orders = np.full((Q, n_buckets), -1, dtype=np.int64)
    for q in range(Q):
        # heap entries: (prob, path tuple)
        import heapq

        heap = []
        counter = 0
        for c in range(n_categories[0]):
            p = float(level_probs[0][q, 0, c])
            if p >= 0:
                heapq.heappush(heap, (-p, counter, (c,)))
                counter += 1
        emitted = 0
        while heap and emitted < n_buckets:
            negp, _, path = heapq.heappop(heap)
            if len(path) == L:
                flat = np.ravel_multi_index(path, n_categories)
                orders[q, emitted] = flat
                emitted += 1
            else:
                lvl = len(path)
                node = int(np.ravel_multi_index(path, n_categories[:lvl]))
                for c in range(n_categories[lvl]):
                    p = float(level_probs[lvl][q, node, c])
                    if p >= 0:
                        heapq.heappush(heap, (-p, counter, path + (c,)))
                        counter += 1
    return orders


def _random_probs(rng, Q, n_categories):
    """Random softmax-like conditional probabilities for a full tree."""
    level_probs, level_valid = [], []
    n_nodes = 1
    for C in n_categories:
        logits = rng.normal(size=(Q, n_nodes, C)).astype(np.float32) * 3
        p = np.exp(logits)
        p /= p.sum(axis=-1, keepdims=True)
        level_probs.append(jnp.asarray(p))
        level_valid.append(np.ones((n_nodes, C), bool))
        n_nodes *= C
    return level_probs, level_valid


def test_two_level_parity_with_reference_traversal():
    rng = np.random.default_rng(0)
    n_categories = (4, 3)
    layout = TreeLayout.create(n_categories)
    level_probs, level_valid = _random_probs(rng, 40, n_categories)
    entry = flatten_entry_probs(layout, level_probs, level_valid)
    for n_buckets in (1, 3, 7, 12):
        got = best_first_order(layout, entry, n_buckets)
        ref = reference_best_first(
            [np.asarray(p) for p in level_probs], n_categories, n_buckets
        )
        np.testing.assert_array_equal(got, ref)


def test_three_level_parity():
    rng = np.random.default_rng(7)
    n_categories = (3, 2, 4)
    layout = TreeLayout.create(n_categories)
    level_probs, level_valid = _random_probs(rng, 15, n_categories)
    entry = flatten_entry_probs(layout, level_probs, level_valid)
    for n_buckets in (2, 10, 24):
        got = best_first_order(layout, entry, n_buckets)
        ref = reference_best_first(
            [np.asarray(p) for p in level_probs], n_categories, n_buckets
        )
        np.testing.assert_array_equal(got, ref)


def test_masked_classes_never_emitted():
    rng = np.random.default_rng(3)
    n_categories = (3, 3)
    layout = TreeLayout.create(n_categories)
    level_probs, level_valid = _random_probs(rng, 10, n_categories)
    # invalidate class 2 of the root and class 0 of node 1
    level_valid[0][0, 2] = False
    level_valid[1][1, 0] = False
    entry = flatten_entry_probs(layout, level_probs, level_valid)
    got = best_first_order(layout, entry, 9)
    dims = n_categories
    for row in got:
        for b in row:
            if b < 0:
                continue
            l1, l2 = np.unravel_index(b, dims)
            assert l1 != 2
            assert not (l1 == 1 and l2 == 0)
    # only 2 valid level-1 nodes × (3 or 2) leaves = 5 reachable buckets
    assert ((got >= 0).sum(axis=1) == 5).all()


def test_emitted_buckets_distinct():
    rng = np.random.default_rng(11)
    n_categories = (5, 4)
    layout = TreeLayout.create(n_categories)
    level_probs, level_valid = _random_probs(rng, 30, n_categories)
    entry = flatten_entry_probs(layout, level_probs, level_valid)
    got = best_first_order(layout, entry, 20)
    for row in got:
        vals = row[row >= 0]
        assert len(set(vals.tolist())) == len(vals)


def test_single_level_topk():
    rng = np.random.default_rng(5)
    probs = rng.random((8, 6)).astype(np.float32)
    valid = np.ones(6, bool)
    order = topk_order_single_level(jnp.asarray(probs), valid, 4)
    ref = np.argsort(-probs, axis=1, kind="stable")[:, :4]
    np.testing.assert_array_equal(order, ref)


def test_joint_order_ranks_by_product():
    rng = np.random.default_rng(9)
    n_categories = (3, 3)
    layout = TreeLayout.create(n_categories)
    level_probs, level_valid = _random_probs(rng, 12, n_categories)
    got = joint_order(layout, level_probs, level_valid, 9)
    p1 = np.asarray(level_probs[0])[:, 0, :]  # (Q, 3)
    p2 = np.asarray(level_probs[1])  # (Q, 3, 3)
    joint = (p1[:, :, None] * p2).reshape(12, 9)
    ref = np.argsort(-joint, axis=1, kind="stable")
    np.testing.assert_array_equal(got, ref)


def test_visit_capacity_quantization_preserves_prefix():
    # the compiled emit capacity rounds up to a power of two; the
    # returned order must still be exactly the requested prefix
    from learnedmetricindex_tpu.index.navigation import _quantize_visits

    assert _quantize_visits(1, 100) == 1
    assert _quantize_visits(5, 100) == 8
    assert _quantize_visits(20, 100) == 32
    assert _quantize_visits(20, 24) == 24  # clamped to the leaf count
    assert _quantize_visits(64, 100) == 64


def test_wide_tree_best_first_guard(monkeypatch):
    """A [64,64] tree works below the state budget and fails LOUDLY
    (pointing at policy='joint') above it — no silent multi-GB
    navigation state (VERDICT r2 weak #3)."""
    import pytest

    n_categories = (64, 64)
    layout = TreeLayout.create(n_categories)
    assert layout.n_entries == 64 + 64 * 64
    rng = np.random.default_rng(13)
    level_probs, level_valid = _random_probs(rng, 8, n_categories)
    entry = flatten_entry_probs(layout, level_probs, level_valid)

    # small batch: fine, and matches the reference traversal
    got = best_first_order(layout, entry, 5)
    ref = reference_best_first(
        [np.asarray(p) for p in level_probs], n_categories, 5
    )
    np.testing.assert_array_equal(got, ref)

    # over budget: explicit error, not an allocation
    monkeypatch.setenv("LMI_MAX_NAV_STATE_BYTES", "100000")
    with pytest.raises(ValueError, match="joint"):
        best_first_order(layout, entry, 5)

    # joint policy is untouched by the budget
    joint = joint_order(layout, level_probs, level_valid, 5)
    assert joint.shape == (8, 5)


def test_nav_slice_refuses_single_query_over_budget(monkeypatch):
    """When ONE query's traversal state already exceeds the budget,
    query-slicing cannot help — ``max_best_first_queries`` must raise
    the loud budget error, not return 1 and let the public path issue
    over-budget single-query dispatches."""
    import pytest

    from learnedmetricindex_tpu.index.navigation import (
        max_best_first_queries,
    )

    monkeypatch.setenv("LMI_MAX_NAV_STATE_BYTES", "1000")
    with pytest.raises(ValueError, match="joint"):
        max_best_first_queries(n_entries=300)  # 1500 B/query > 1000 B
    assert max_best_first_queries(n_entries=50) >= 1  # 250 B/query: fine


def test_wide_tree_public_path_auto_slices(monkeypatch):
    """The PUBLIC navigation path (``index.compute_bucket_order``) no
    longer fails on wide trees: over the state budget it navigates in
    budget-sized query slices (per-query independent, so the sliced
    order is bitwise-identical to the one-dispatch order)."""
    import jax

    import learnedmetricindex_tpu as lmi
    from learnedmetricindex_tpu.index.index import LearnedIndex, LevelModels
    from learnedmetricindex_tpu.index.navigation import (
        max_best_first_queries,
    )
    from learnedmetricindex_tpu.models.mlp import init_stacked_mlp

    cats = (6, 5)
    d = 8
    key = jax.random.PRNGKey(3)
    levels = [
        LevelModels(
            params=init_stacked_mlp(key, 1, "MLP-2", d, cats[0]),
            class_mask=np.ones((1, cats[0]), bool),
            model_type="MLP-2",
        ),
        LevelModels(
            params=init_stacked_mlp(jax.random.fold_in(key, 1), cats[0],
                                    "MLP-2", d, cats[1]),
            class_mask=np.ones((cats[0], cats[1]), bool),
            model_type="MLP-2",
        ),
    ]
    cfg = lmi.BuildConfiguration("kmeans", 1, "MLP-2", 0.01, list(cats))
    index = LearnedIndex(
        levels=levels,
        layout=TreeLayout.create(cats),
        config=cfg,
        leaf_valid=np.ones(cats[0] * cats[1], bool),
    )
    rng = np.random.default_rng(5)
    queries = rng.normal(size=(50, d)).astype(np.float32)

    one_dispatch, _ = index.compute_bucket_order(queries, 7)

    # budget that fits only 8 queries per dispatch -> 7 slices
    E = index.layout.n_entries  # 36
    monkeypatch.setenv("LMI_MAX_NAV_STATE_BYTES", str(E * 5 * 8))
    assert max_best_first_queries(E) == 8
    sliced, _ = index.compute_bucket_order(queries, 7)
    np.testing.assert_array_equal(sliced, one_dispatch)

    # joint policy unaffected either way
    j1, _ = index.compute_bucket_order(queries, 7, policy="joint")
    monkeypatch.delenv("LMI_MAX_NAV_STATE_BYTES")
    j2, _ = index.compute_bucket_order(queries, 7, policy="joint")
    np.testing.assert_array_equal(j1, j2)


def test_frontier_widths_identical_orders(monkeypatch):
    """The frontier-F pop (leaf-prefix + first internal per iteration)
    must reproduce the one-pop-per-iteration order bitwise at every
    width, including the visit-heavy full sweep (n_buckets == n_leaves,
    the reference's --buckets-perc 100 end)."""
    from learnedmetricindex_tpu.index.navigation import nav_frontier

    rng = np.random.default_rng(11)
    n_categories = (5, 4, 3)
    layout = TreeLayout.create(n_categories)
    level_probs, level_valid = _random_probs(rng, 30, n_categories)
    entry = flatten_entry_probs(layout, level_probs, level_valid)

    for n_buckets in (1, 7, layout.n_leaves):
        monkeypatch.setenv("LMI_NAV_FRONTIER", "1")
        assert nav_frontier() == 1
        serial = best_first_order(layout, entry, n_buckets)
        for width in (2, 16, layout.n_entries + 5):
            monkeypatch.setenv("LMI_NAV_FRONTIER", str(width))
            got = best_first_order(layout, entry, n_buckets)
            np.testing.assert_array_equal(got, serial)
    monkeypatch.delenv("LMI_NAV_FRONTIER")


def _tiny_two_level_index(cats=(6, 5), d=8, seed=3):
    import jax

    import learnedmetricindex_tpu as lmi
    from learnedmetricindex_tpu.index.index import LearnedIndex, LevelModels
    from learnedmetricindex_tpu.models.mlp import init_stacked_mlp

    key = jax.random.PRNGKey(seed)
    levels = [
        LevelModels(
            params=init_stacked_mlp(key, 1, "MLP-2", d, cats[0]),
            class_mask=np.ones((1, cats[0]), bool),
            model_type="MLP-2",
        ),
        LevelModels(
            params=init_stacked_mlp(jax.random.fold_in(key, 1), cats[0],
                                    "MLP-2", d, cats[1]),
            class_mask=np.ones((cats[0], cats[1]), bool),
            model_type="MLP-2",
        ),
    ]
    cfg = lmi.BuildConfiguration("kmeans", 1, "MLP-2", 0.01, list(cats))
    return LearnedIndex(
        levels=levels,
        layout=TreeLayout.create(cats),
        config=cfg,
        leaf_valid=np.ones(cats[0] * cats[1], bool),
    )


def test_nav_temp_default_is_identity():
    """nav_temp=1.0 (scalar or per-level) must be bitwise the untempered
    order for BOTH policies; a single-level tree is ranking-invariant to
    ANY temperature (softmax is monotone in the logits)."""
    index = _tiny_two_level_index()
    rng = np.random.default_rng(5)
    queries = rng.normal(size=(40, 8)).astype(np.float32)
    for policy in ("best_first", "joint"):
        base, _ = index.compute_bucket_order(queries, 7, policy=policy)
        for t in (1.0, [1.0, 1.0]):
            got, _ = index.compute_bucket_order(
                queries, 7, policy=policy, nav_temp=t
            )
            np.testing.assert_array_equal(got, base)


def test_nav_temp_flattens_level_one_branching():
    """A high level-1 temperature must increase how many distinct
    level-1 branches the joint top-k spans (the anti-overconfidence
    knob: sweep_ep824's collapse is top-10 lists stuck in one branch)."""
    index = _tiny_two_level_index(seed=11)
    rng = np.random.default_rng(7)
    queries = rng.normal(size=(64, 8)).astype(np.float32)
    C2 = index.layout.n_categories[1]

    def mean_branches(order):
        b = np.asarray(order) // C2
        return np.mean([len(np.unique(r[r >= 0])) for r in b])

    sharp, _ = index.compute_bucket_order(
        queries, 10, policy="joint", nav_temp=[0.25, 1.0]
    )
    flat, _ = index.compute_bucket_order(
        queries, 10, policy="joint", nav_temp=[8.0, 1.0]
    )
    assert mean_branches(flat) > mean_branches(sharp)


def test_nav_temp_validation():
    import pytest

    index = _tiny_two_level_index()
    q = np.zeros((3, 8), np.float32)
    with pytest.raises(ValueError, match="nav_temp"):
        index.compute_bucket_order(q, 4, nav_temp=[1.0, 1.0, 1.0])
