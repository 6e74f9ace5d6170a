"""MLP registry, training convergence, coverage loop, stacked trainer."""

import numpy as np
import pytest

from learnedmetricindex_tpu.data import synthetic_blobs
from learnedmetricindex_tpu.models.mlp import (
    MLP_REGISTRY,
    init_mlp,
    init_stacked_mlp,
    mlp_apply,
    stacked_mlp_apply,
)
from learnedmetricindex_tpu.models.train import (
    NeuralNetwork,
    StackedNodeTrainer,
    group_rows,
    train_until_covered,
)
from learnedmetricindex_tpu.ops.kmeans import kmeans

import jax
import jax.numpy as jnp


def test_registry_covers_reference_architectures():
    # Nine architectures, hidden widths 8..512 (cf. model.py:29-79).
    assert set(MLP_REGISTRY) == {
        "MLP", "MLP-2", "MLP-3", "MLP-4", "MLP-5", "MLP-6", "MLP-7",
        "MLP-8", "MLP-9",
    }
    assert MLP_REGISTRY["MLP-4"] == [512]
    assert MLP_REGISTRY["MLP-9"] == [8, 16]


def test_unknown_model_type_raises():
    with pytest.raises(ValueError, match="not supported"):
        init_mlp(jax.random.PRNGKey(0), "MLP-99", 8, 4)


def test_forward_shapes():
    params = init_mlp(jax.random.PRNGKey(0), "MLP-5", 32, 7)
    out = mlp_apply(params, jnp.ones((13, 32)))
    assert out.shape == (13, 7)


def test_stacked_apply_matches_individual():
    stacked = init_stacked_mlp(jax.random.PRNGKey(1), 4, "MLP-2", 16, 5)
    x = jax.random.normal(jax.random.PRNGKey(2), (9, 16))
    batched = stacked_mlp_apply(stacked, x)
    assert batched.shape == (4, 9, 5)
    for m in range(4):
        single = jax.tree.map(lambda leaf: leaf[m], stacked)
        np.testing.assert_allclose(
            batched[m], mlp_apply(single, x), rtol=2e-3, atol=2e-3
        )


def test_single_model_learns_kmeans_partition():
    data, _ = synthetic_blobs(2000, 16, 1, n_clusters=5, seed=3)
    _, labels = kmeans(data, 5)
    trainer, preds = train_until_covered(
        data, labels, 5, model_type="MLP-2", lr=0.01, epochs=30
    )
    acc = (preds == labels).mean()
    assert acc > 0.9, f"model should imitate k-means partition, acc={acc}"
    assert len(np.unique(preds)) == 5  # coverage criterion held


def test_neural_network_reference_api():
    data, _ = synthetic_blobs(500, 8, 1, n_clusters=3, seed=4)
    _, labels = kmeans(data, 3)
    nn = NeuralNetwork(8, 3, lr=0.01, model_type="MLP-8")
    nn.train_batch(data, labels, epochs=50)
    preds = nn.predict(data)
    assert preds.shape == (500,)
    probs, classes = nn.predict_proba(data[:7])
    assert probs.shape == (7, 3) and classes.shape == (7, 3)
    # probs sorted descending, rows sum to 1 (model.py:226-241)
    assert np.all(np.diff(probs, axis=1) <= 1e-6)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)


def test_stacked_trainer_concurrent_models():
    # Three models, each owning a distinct blob subset with its own labels.
    rng = np.random.default_rng(0)
    n_per, d = 400, 12
    datas, group_ids, labels = [], [], []
    for g in range(3):
        blob, _ = synthetic_blobs(n_per, d, 1, n_clusters=4, seed=10 + g)
        _, lab = kmeans(blob, 4, seed=g)
        datas.append(blob)
        labels.append(lab)
        group_ids.append(np.full(n_per, g))
    data = np.concatenate(datas)
    group_ids = np.concatenate(group_ids)
    labels = np.concatenate(labels)
    # shuffle rows so grouping is non-trivial
    perm = rng.permutation(len(data))
    data, group_ids, labels = data[perm], group_ids[perm], labels[perm]

    grouped = group_rows(data, group_ids, 3, labels=labels, tile=256)
    trainer = StackedNodeTrainer(3, d, 4, "MLP-2", lr=0.01, seed=0)
    preds_grouped, rounds = trainer.fit(grouped, epochs=30)

    valid = np.asarray(grouped.labels) >= 0
    acc = (preds_grouped[valid] == np.asarray(grouped.labels)[valid]).mean()
    assert acc > 0.85, f"stacked training acc={acc}"
    # every model covered all 4 classes
    for m in range(3):
        start = int(np.asarray(grouped.seg_starts)[m])
        ln = int(np.asarray(grouped.seg_lens)[m])
        assert len(np.unique(preds_grouped[start : start + ln])) == 4


def test_group_rows_layout():
    data = np.arange(20, dtype=np.float32).reshape(10, 2)
    gids = np.array([1, 0, 1, 1, 0, 2, 2, 2, 2, 0])
    g = group_rows(data, gids, 3, labels=np.arange(10), tile=4)
    seg_starts = np.asarray(g.seg_starts)
    seg_lens = np.asarray(g.seg_lens)
    np.testing.assert_array_equal(seg_lens, [3, 3, 4])
    # tile-aligned starts
    assert all(s % 4 == 0 for s in seg_starts)
    # virtual layout: x is the UNMOVED original data
    np.testing.assert_array_equal(np.asarray(g.x), data)
    # each model's slots map to exactly its original rows (stable order)
    sr = g.slot_rows_np
    np.testing.assert_array_equal(sr[seg_starts[0] : seg_starts[0] + 3], [1, 4, 9])
    np.testing.assert_array_equal(sr[seg_starts[2] : seg_starts[2] + 4], [5, 6, 7, 8])
    # padding: slot_rows and labels are -1
    assert (sr[seg_starts[0] + 3 : seg_starts[1]] == -1).all()
    lab = np.asarray(g.labels)
    assert (lab[seg_starts[0] + 3 : seg_starts[1]] == -1).all()
    # tile_model maps every tile to its owner
    np.testing.assert_array_equal(np.asarray(g.tile_model), [0, 1, 2])
    # scatter round-trip
    vals = np.arange(len(sr), dtype=np.int32)
    out = g.scatter_to_rows(vals, 10, fill=-1)
    for slot, row in enumerate(sr):
        if row >= 0:
            assert out[row] == slot


def test_class_mask_excludes_untrained_classes():
    data, _ = synthetic_blobs(300, 8, 1, n_clusters=2, seed=6)
    _, labels = kmeans(data, 2)
    grouped = group_rows(data, np.zeros(300, np.int64), 1, labels=labels)
    # model allocated with 5 output classes but only 2 valid
    trainer = StackedNodeTrainer(1, 8, 5, "MLP-8", lr=0.01)
    mask = np.zeros((1, 5), bool)
    mask[0, :2] = True
    trainer.set_class_mask(mask)
    preds, _ = trainer.fit(grouped, epochs=30)
    valid = np.asarray(grouped.labels) >= 0
    assert set(np.unique(preds[valid])) <= {0, 1}
    probs = np.asarray(trainer.predict_proba_all(data[:5]))
    assert probs[:, :, 2:].max() < 1e-6  # masked classes get ~0 probability


def test_neural_network_full_batch_train():
    # reference `train` semantics: one Adam step per epoch on the whole
    # dataset — distinct from train_batch (minibatch) and it must learn
    from learnedmetricindex_tpu.models.train import NeuralNetwork

    rng = np.random.default_rng(0)
    X = rng.normal(size=(512, 8)).astype(np.float32)
    y = (X[:, 0] > 0).astype(np.int32)
    nn = NeuralNetwork(8, 2, lr=0.05, model_type="MLP-8", seed=0)
    before = (nn.predict(X) == y).mean()
    nn.train(X, y, epochs=60)
    after = (nn.predict(X) == y).mean()
    assert after > max(before, 0.9)


def test_weighted_ce_matches_torch():
    """_weighted_mean_ce must reproduce torch's
    CrossEntropyLoss(weight=w) reduction exactly (the semantics the
    reference wires class_weight into, model.py:145-161)."""
    import jax.numpy as jnp
    import torch

    from learnedmetricindex_tpu.models.train import _weighted_mean_ce

    rng = np.random.default_rng(0)
    M, B, C = 3, 32, 5
    logits = rng.normal(size=(M, B, C)).astype(np.float32)
    y = rng.integers(0, C, size=(M, B)).astype(np.int32)
    w = rng.uniform(0.2, 3.0, size=(M, C)).astype(np.float32)

    import optax

    ce = optax.softmax_cross_entropy_with_integer_labels(
        jnp.asarray(logits), jnp.asarray(y)
    )
    ours = np.asarray(
        _weighted_mean_ce(ce, jnp.asarray(y), jnp.asarray(w))
    )
    for m in range(M):
        loss = torch.nn.CrossEntropyLoss(weight=torch.tensor(w[m]))
        ref = loss(
            torch.tensor(logits[m]), torch.tensor(y[m], dtype=torch.long)
        ).item()
        np.testing.assert_allclose(ours[m], ref, rtol=1e-5)

    # None reproduces the unweighted mean (existing training dynamics)
    unweighted = np.asarray(_weighted_mean_ce(ce, jnp.asarray(y), None))
    for m in range(M):
        loss = torch.nn.CrossEntropyLoss()
        ref = loss(
            torch.tensor(logits[m]), torch.tensor(y[m], dtype=torch.long)
        ).item()
        np.testing.assert_allclose(unweighted[m], ref, rtol=1e-5)


def test_neural_network_class_weight():
    """The reference API's class_weight parameter (model.py:145-161) is
    functional: upweighting a starved minority class pulls the decision
    boundary toward it.  9:1 imbalanced overlapping blobs — unweighted
    training under-recalls the minority; a strong minority weight must
    raise minority recall."""
    rng = np.random.default_rng(5)
    n_maj, n_min = 1800, 200
    X = np.concatenate(
        [
            rng.normal(0.0, 1.0, size=(n_maj, 8)),
            rng.normal(0.9, 1.0, size=(n_min, 8)),
        ]
    ).astype(np.float32)
    y = np.concatenate(
        [np.zeros(n_maj, np.int32), np.ones(n_min, np.int32)]
    )

    def minority_recall(nn):
        nn.train_batch(X, y, epochs=40)
        preds = nn.predict(X)
        return (preds[y == 1] == 1).mean()

    plain = minority_recall(
        NeuralNetwork(8, 2, lr=0.01, model_type="MLP-8", seed=1)
    )
    weighted = minority_recall(
        NeuralNetwork(
            8, 2, lr=0.01, model_type="MLP-8", seed=1,
            class_weight=[1.0, 9.0],
        )
    )
    assert weighted > plain + 0.1, (plain, weighted)

    with pytest.raises(ValueError, match="shape"):
        NeuralNetwork(8, 2, class_weight=[1.0, 2.0, 3.0])


def test_build_with_balanced_class_weight():
    """class_weights='balanced' flows config → builder → trainer and
    produces a working index (coverage criterion still enforced)."""
    import learnedmetricindex_tpu as lmi
    from learnedmetricindex_tpu.ops.knn import exact_knn, recall

    data, queries = synthetic_blobs(2000, 16, 50, n_clusters=8, seed=6)
    cfg = lmi.BuildConfiguration(
        "kmeans", 30, "MLP-2", 0.01, [3, 3],
        class_weights="balanced", seed=6, chunk_size=64,
    )
    index, pred, n_buckets, *_ = lmi.LearnedIndexBuilder(data, cfg).build()
    assert (pred >= 0).all()
    _, nns, _ = index.search(
        data, queries, data, queries, pred,
        n_buckets=index.n_buckets, k=10,
    )
    _, gt = exact_knn(data, queries, k=10)
    assert recall(nns, gt, 10) == 1.0


def test_reference_dynamics_update_rule():
    """update_rule='reference' reproduces the reference's effective
    update (model.py:191-211): ONE Adam step per epoch, gradient from
    the epoch's LAST (runt) batch only.

    Checked on a toy problem three ways: (a) the runt length matches
    torch's DataLoader(drop_last=False) last-batch length; (b) Adam's
    step counter advances once per epoch (vs steps-per-epoch times in
    minibatch mode); (c) for a segment that fits in one batch the
    single batch IS the whole segment, so one reference epoch equals
    one full-batch Adam step exactly."""
    import jax
    import jax.numpy as jnp
    import torch

    from learnedmetricindex_tpu.models.train import (
        StackedNodeTrainer,
        _full_batch_epochs,
        group_rows,
    )

    # (a) runt length == torch DataLoader's last-batch length
    for n in (5, 256, 300, 512, 513, 1000):
        loader = torch.utils.data.DataLoader(
            torch.arange(n), batch_size=256, drop_last=False
        )
        torch_runt = len(list(loader)[-1])
        ours = ((n - 1) % 256) + 1
        assert ours == torch_runt, (n, ours, torch_runt)

    rng = np.random.default_rng(7)
    X = rng.normal(size=(512, 8)).astype(np.float32)
    y = (X[:, 0] > 0).astype(np.int32)

    def fit_count(update_rule, epochs):
        tr = StackedNodeTrainer(
            1, 8, 2, "MLP-8", lr=0.01, batch_size=256, seed=0,
            update_rule=update_rule,
        )
        grouped = group_rows(X, np.zeros(512, np.int64), 1, labels=y)
        tr.fit(grouped, epochs, max_rounds=50)
        return int(np.asarray(tr.opt_state[0].count))

    # (b) one update per epoch vs ceil(512/256)=2 per epoch; fit may
    # run extra coverage rounds, so count in whole rounds
    e = 5
    ref_count = fit_count("reference", e)
    mb_count = fit_count("minibatch", e)
    assert ref_count % e == 0 and mb_count % (2 * e) == 0
    assert mb_count >= 2 * ref_count / (ref_count // e)

    # (c) segment <= batch: reference epoch == full-batch step
    Xs, ys = X[:6], np.array([0, 1, 0, 1, 1, 0], np.int32)
    tr = StackedNodeTrainer(
        1, 8, 2, "MLP-8", lr=0.01, batch_size=256, seed=3,
        update_rule="reference",
    )
    import optax

    from learnedmetricindex_tpu.models.train import _run_epochs

    grouped = group_rows(Xs, np.zeros(6, np.int64), 1, labels=ys)
    p_ref, _, _ = _run_epochs(
        tr.params,
        tr.opt_state,
        jax.random.PRNGKey(0),
        grouped.x,
        None,
        grouped.slot_rows,
        grouped.labels,
        grouped.seg_starts,
        grouped.seg_lens,
        tr.class_mask,
        jnp.ones((1,), jnp.float32),
        None,
        n_models=1,
        batch_size=256,
        steps=1,
        lr=0.01,
        ref_dynamics=True,
    )
    p_full, _ = _full_batch_epochs(
        tr.params,
        optax.adam(0.01).init(tr.params),
        jnp.asarray(Xs),
        jnp.asarray(ys),
        tr.class_mask,
        epochs=1,
        lr=0.01,
    )
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_full)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )

    with pytest.raises(ValueError, match="update_rule"):
        StackedNodeTrainer(1, 8, 2, update_rule="nope")


def test_reference_dynamics_builds_working_index():
    """A full build under update_rule='reference' converges (the
    retrain-until-covered loop carries it, as in the reference) and
    yields a searchable index."""
    import learnedmetricindex_tpu as lmi
    from learnedmetricindex_tpu.ops.knn import exact_knn, recall

    data, queries = synthetic_blobs(2000, 16, 50, n_clusters=8, seed=8)
    cfg = lmi.BuildConfiguration(
        "kmeans", 50, "MLP-2", 0.01, [4], seed=8, chunk_size=64,
        update_rule="reference",
    )
    index, pred, *_ = lmi.LearnedIndexBuilder(data, cfg).build()
    _, nns, _ = index.search(
        data, queries, data, queries, pred,
        n_buckets=index.n_buckets, k=10,
    )
    _, gt = exact_knn(data, queries, k=10)
    assert recall(nns, gt, 10) == 1.0
