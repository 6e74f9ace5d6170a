"""Save/load round-trip, CLI driver, result HDF5 + evaluation."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import learnedmetricindex_tpu as lmi
from learnedmetricindex_tpu import eval as lmi_eval
from learnedmetricindex_tpu.data import synthetic_blobs
from learnedmetricindex_tpu.index.serialization import load_index, save_index
from learnedmetricindex_tpu.ops.knn import exact_knn, recall


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    data, queries = synthetic_blobs(2000, 16, 100, n_clusters=10, seed=1)
    cfg = lmi.BuildConfiguration("kmeans", 30, "MLP-8", 0.01, [4, 3], seed=1,
                                 chunk_size=128)
    index, pred, n_buckets, build_t, _ = lmi.LearnedIndexBuilder(data, cfg).build()
    _, gt = exact_knn(data, queries, k=10)
    return data, queries, gt, cfg, index, pred, n_buckets


def test_save_load_roundtrip(built, tmp_path):
    data, queries, gt, cfg, index, pred, n_buckets = built
    path = str(tmp_path / "index.npz")
    index.save(path, pred)
    index2, pred2 = lmi.LearnedIndex.load(path)

    np.testing.assert_array_equal(pred, pred2)
    assert index2.config.to_dict() == cfg.to_dict()
    assert index2.n_buckets == index.n_buckets
    assert index2.bucket_paths == index.bucket_paths

    d1, a1, _ = index.search(data, queries, data, queries, pred,
                             cfg.n_categories, n_buckets=4, k=5)
    d2, a2, _ = index2.search(data, queries, data, queries, pred2,
                              cfg.n_categories, n_buckets=4, k=5)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)


def test_store_and_evaluate_results(built, tmp_path):
    data, queries, gt, cfg, index, pred, n_buckets = built
    dists, anns, t = index.search(data, queries, data, queries, pred,
                                  cfg.n_categories, n_buckets=n_buckets, k=10)
    dst = str(tmp_path / "res" / "out.h5")
    lmi_eval.store_results(dst, "Learned-index", "testkind", dists, anns,
                           1.23, t["search"], "params-str", "2000")

    knns, dd, attrs = lmi_eval.load_results(dst)
    np.testing.assert_array_equal(knns, anns)
    assert attrs["algo"] == "Learned-index"
    assert attrs["buildtime"] == 1.23

    row = lmi_eval.evaluate_result_file(dst, gt, k=10)
    assert row["recall"] == recall(anns, gt, 10) == 1.0  # full visit

    rows = lmi_eval.evaluate_to_csv([dst], gt, str(tmp_path / "res.csv"))
    assert (tmp_path / "res.csv").exists()
    assert rows[0]["recall"] == 1.0


def test_cli_synthetic_end_to_end(tmp_path):
    env = dict(os.environ)
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import sys; sys.path.insert(0, %r);"
        "from learnedmetricindex_tpu.cli import main;"
        "out = main(['--synthetic', '1500', '--synthetic-dim', '12',"
        "            '--n-categories', '4', '--epochs', '20',"
        "            '--model-type', 'MLP-8', '--buckets-perc', '50',"
        "            '--chunk-size', '128', '--no-save',"
        "            '--out-dir', %r]);"
        "print('RESULTS:', out)"
    ) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
         str(tmp_path / "result"))
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "RESULTS:" in proc.stdout
    # a result file was produced in SISAP schema
    result_files = list((tmp_path / "result").rglob("*.h5"))
    assert len(result_files) == 1
    knns, dists, attrs = lmi_eval.load_results(str(result_files[0]))
    assert knns.shape[1] == 10
    assert attrs["data"] == "synthetic12"


def test_cli_parser_parity():
    from learnedmetricindex_tpu.cli import build_parser

    p = build_parser()
    args = p.parse_args([])
    # reference defaults (search/search.py:306-327)
    assert args.dataset == "pca96v2"
    assert args.emb == "pca96"
    assert args.size == "100K"
    assert args.k == 10
    assert args.n_categories == [10, 10]
    assert args.epochs == [100]
    assert args.model_type == ["MLP"]
    assert args.lr == [0.01]
    assert args.buckets_perc == [10]
    assert args.preprocess is True and args.save is True

    # fixed quirks: bool flags are real flags
    args = p.parse_args(["--no-preprocess", "--no-save"])
    assert args.preprocess is False and args.save is False
    # -b is functional
    args = p.parse_args(["-b", "2", "3"])
    assert args.n_buckets == [2, 3]


def test_cli_per_level_validation():
    from learnedmetricindex_tpu.cli import build_parser, expand_per_level

    args = vars(build_parser().parse_args(["--n-categories", "5", "6",
                                           "--epochs", "10"]))
    expand_per_level(args)
    assert args["epochs"] == [10, 10]
    bad = vars(build_parser().parse_args(["--n-categories", "5", "6", "7",
                                          "--epochs", "10", "20"]))
    with pytest.raises(AssertionError):
        expand_per_level(bad)


def test_oracle_navigation_recall():
    """The partition-ceiling diagnostic: recall when an oracle visits
    the v buckets holding the most true neighbors."""
    from learnedmetricindex_tpu.eval import oracle_navigation_recall

    # query 0: neighbors in buckets [5,5,5,2,2,9] -> counts (3,2,1)
    # query 1: all in one bucket -> ceiling 1.0 from v=1
    b = np.array([[5, 5, 5, 2, 2, 9], [7, 7, 7, 7, 7, 7]])
    out = oracle_navigation_recall(b, [1, 2, 3, 10])
    np.testing.assert_allclose(out[1], (3 / 6 + 1.0) / 2)
    np.testing.assert_allclose(out[2], (5 / 6 + 1.0) / 2)
    np.testing.assert_allclose(out[3], 1.0)
    np.testing.assert_allclose(out[10], 1.0)  # v > k groups: clamped

    # random case against a brute-force per-query reference
    rng = np.random.default_rng(0)
    b = rng.integers(0, 7, size=(40, 10))
    out = oracle_navigation_recall(b, [2])
    ref = np.mean(
        [
            np.sort(np.unique(row, return_counts=True)[1])[::-1][:2].sum()
            / 10
            for row in b
        ]
    )
    np.testing.assert_allclose(out[2], ref)
