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


def test_sharded_build_step_runs_and_matches_shapes():
    import optax

    from learnedmetricindex_tpu.models.mlp import init_stacked_mlp
    from learnedmetricindex_tpu.parallel.distributed import make_sharded_build_step

    mesh = create_mesh(8)
    n_models, batch, d, C = 4, 16, 12, 5
    params = init_stacked_mlp(jax.random.PRNGKey(0), n_models, "MLP-8", d, C)
    opt_state = optax.adam(0.01).init(params)
    rng = np.random.default_rng(0)
    xb = rng.normal(size=(n_models, batch, d)).astype(np.float32)
    yb = rng.integers(0, C, size=(n_models, batch)).astype(np.int32)
    mask = np.ones((n_models, C), bool)
    active = np.ones(n_models, np.float32)

    step_fn, shard_fn = make_sharded_build_step(mesh, 0.01)
    args = shard_fn(params, opt_state, xb, yb, mask, active)
    p2, s2, losses = step_fn(*args)
    assert losses.shape == (n_models,)
    assert np.isfinite(np.asarray(losses)).all()
    # params actually changed
    w_before = np.asarray(params[0]["w"])
    w_after = np.asarray(p2[0]["w"])
    assert not np.allclose(w_before, w_after)

    # frozen model: active=0 keeps its params
    active0 = active.copy()
    active0[2] = 0.0
    args = shard_fn(params, opt_state, xb, yb, mask, active0)
    p3, _, _ = step_fn(*args)
    np.testing.assert_array_equal(
        np.asarray(p3[0]["w"])[2], np.asarray(params[0]["w"])[2]
    )
    assert not np.allclose(np.asarray(p3[0]["w"])[1], np.asarray(params[0]["w"])[1])


def test_sharded_scan_matches_single_device():
    from learnedmetricindex_tpu.index.bucket_store import (
        BucketStore,
        build_scan_plan,
        scan_buckets,
    )
    from learnedmetricindex_tpu.parallel.distributed import make_sharded_scan

    mesh = create_mesh(8)
    data, queries = synthetic_blobs(800, 16, 40, seed=4)
    rng = np.random.default_rng(0)
    bucket_ids = rng.integers(0, 6, size=800)
    store = BucketStore.build(data, bucket_ids, 6, chunk=64)
    order = np.tile(np.arange(6, dtype=np.int64), (40, 1))

    ref_d, ref_i = scan_buckets(store, queries, order, k=7)

    qtile, k = 8, 7
    plan = build_scan_plan(store, order, qtile=qtile)
    W = len(plan.item_chunk)
    Wp = -(-W // 8) * 8
    iq = np.zeros(Wp, np.int32); iq[:W] = plan.item_q_start
    ic = np.zeros(Wp, np.int32); ic[:W] = plan.item_chunk
    iv = np.zeros(Wp, bool); iv[:W] = True

    scan_fn, place = make_sharded_scan(mesh, k=k, qtile=qtile)
    placed = place(queries.astype(np.float32), plan.qidx, iq, ic, iv)
    out_d, out_i = scan_fn(*placed, store.chunk_data, store.chunk_ids,
                           n_queries=plan.n_queries)
    np.testing.assert_allclose(np.asarray(out_d), ref_d, rtol=1e-4, atol=1e-5)
    # id sets agree (ties may permute within equal distances)
    assert (np.asarray(out_i) == ref_i.astype(np.int32)).mean() > 0.99


def test_graft_entry_points():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    g.dryrun_multichip(8)
