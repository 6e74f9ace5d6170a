"""Sharding over an 8-device virtual CPU mesh (SURVEY.md §4: the
TPU-world equivalent of testing multi-node without a cluster)."""

import numpy as np
import pytest

import jax

from learnedmetricindex_tpu.data import synthetic_blobs
from learnedmetricindex_tpu.ops.kmeans import kmeans
from learnedmetricindex_tpu.parallel.mesh import create_mesh, data_model_axes


pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def test_data_model_axes_factoring():
    assert data_model_axes(8) == (4, 2)
    assert data_model_axes(4) == (2, 2)
    assert data_model_axes(2) == (2, 1)
    assert data_model_axes(1) == (1, 1)
    assert data_model_axes(8, model_axis=4) == (2, 4)
    assert data_model_axes(6) == (3, 2)


def test_create_mesh():
    mesh = create_mesh(8)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")


def test_sharded_kmeans_matches_quality():
    from learnedmetricindex_tpu.parallel.distributed import sharded_kmeans

    data, _ = synthetic_blobs(4000, 16, 1, n_clusters=8, seed=0)
    mesh = create_mesh(8)
    centroids, labels = sharded_kmeans(data, 8, mesh)
    assert centroids.shape == (8, 16)
    assert labels.shape == (4000,)
    assert len(np.unique(labels)) == 8
    # quality on par with the single-device path (same objective)
    _, labels_single = kmeans(data, 8, max_points_per_centroid=0)

    def inertia(lbl):
        c = np.stack([data[lbl == i].mean(0) for i in range(8)])
        return np.sum((data - c[lbl]) ** 2)

    assert inertia(labels) <= inertia(labels_single) * 1.2


def test_stacked_trainer_mesh_expert_parallel():
    """The public expert-parallel build path: StackedNodeTrainer(mesh=)
    trains sibling node models with the model axis sharded over
    "model" and corpus rows over the mesh, matching the no-mesh
    trainer's coverage semantics (the legacy make_sharded_build_step
    single-step helper was folded into this engine)."""
    from jax.sharding import NamedSharding
    from learnedmetricindex_tpu.models.train import (
        StackedNodeTrainer,
        group_rows,
    )

    mesh = create_mesh(8)
    rng = np.random.default_rng(0)
    n_models, C, d, n = 4, 3, 12, 4096
    group_ids = rng.integers(0, n_models, size=n)
    # well-separated per-(model, class) blobs so coverage converges
    centers = rng.normal(size=(n_models, C, d)).astype(np.float32) * 4
    labels = rng.integers(0, C, size=n)
    data = (
        centers[group_ids, labels]
        + 0.1 * rng.normal(size=(n, d)).astype(np.float32)
    )

    grouped = group_rows(data, group_ids, n_models, labels=labels, tile=512)
    trainer = StackedNodeTrainer(
        n_models, d, C, model_type="MLP-8", lr=0.05, batch_size=128,
        seed=0, mesh=mesh,
    )
    # params placed with the model axis sharded over "model"
    w = trainer.params[0]["w"]
    assert isinstance(w.sharding, NamedSharding)
    assert w.sharding.spec[0] == "model"

    preds_slots, rounds = trainer.fit(grouped, epochs=3)
    assert rounds >= 1
    preds = grouped.scatter_to_rows(preds_slots.astype(np.int64), n, fill=-1)
    # coverage criterion held per model: every class predicted somewhere
    for m in range(n_models):
        assert set(preds[group_ids == m]) == set(range(C))
    # trained models actually separate the blobs
    acc = (preds == labels).mean()
    assert acc > 0.9, acc


def test_graft_entry_points():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    g.dryrun_multichip(8)
