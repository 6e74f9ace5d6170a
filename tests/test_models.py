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
