"""BuildConfiguration broadcast/validation parity
(cf. reference ``search/li/BuildConfiguration.py:9-141``)."""

import pytest

from learnedmetricindex_tpu.config import BuildConfiguration, ModelParameters


def test_scalar_expansion():
    cfg = BuildConfiguration("kmeans", 40, "MLP-3", 0.001, [5, 10])
    assert cfg.n_levels == 2
    assert cfg.epochs == [40, 40]
    assert cfg.model_types == ["MLP-3", "MLP-3"]
    assert cfg.lrs == [0.001, 0.001]
    assert cfg.clustering_algorithms == ["kmeans", "kmeans"]
    assert cfg.n_categories == [5, 10]
    assert len(cfg.level_configurations) == 2
    assert cfg.level_configurations[1] == ModelParameters(
        "kmeans", "MLP-3", 40, 0.001, 10
    )


def test_singleton_list_expansion():
    cfg = BuildConfiguration(["kmeans"], [40], ["MLP-3"], [0.001], [5, 10])
    assert cfg.epochs == [40, 40]


def test_full_lists_pass_through():
    cfg = BuildConfiguration(
        ["kmeans", "faiss_kmeans"], [10, 20], ["MLP", "MLP-4"], [0.1, 0.01], [3, 7]
    )
    assert cfg.epochs == [10, 20]
    assert cfg.model_types == ["MLP", "MLP-4"]


def test_mismatched_lengths_rejected():
    with pytest.raises(AssertionError):
        BuildConfiguration(["kmeans"], [10, 20, 30], ["MLP"], [0.1], [3, 7])


def test_empty_levels_rejected():
    with pytest.raises(AssertionError):
        BuildConfiguration("kmeans", 10, "MLP", 0.1, [])


def test_unknown_clustering_rejected():
    with pytest.raises(AssertionError):
        BuildConfiguration("dbscan", 10, "MLP", 0.1, [3])


def test_roundtrip_dict():
    cfg = BuildConfiguration("kmeans", 40, "MLP", 0.01, [10, 10], seed=7)
    cfg2 = BuildConfiguration.from_dict(cfg.to_dict())
    assert cfg2.to_dict() == cfg.to_dict()
