"""Build configuration.

Same configuration surface as the reference ``BuildConfiguration``
dataclass (``search/li/BuildConfiguration.py:9-141``): per-level
hyperparameters (clustering algorithm, epochs, model type, learning
rate, number of categories), with scalar→list broadcast and validation,
materializing ``level_configurations`` and ``n_levels``.

TPU-specific additions (no reference counterpart):

* ``seed`` — a single integer seeding every stochastic stage through
  ``jax.random`` key folding (the reference scatters ``2023`` across
  numpy/torch/faiss/sklearn seeds: ``search/search.py:20``,
  ``search/li/model.py:13-14``, ``clustering/faiss_kmeans.py:14``).
* ``batch_size`` — training minibatch size (reference hard-codes 256 at
  ``LearnedIndexBuilder.py:172``).
* ``chunk_size`` — bucket-store chunk length (see
  :mod:`learnedmetricindex_tpu.index.bucket_store`).
* ``dtype`` — on-device storage dtype for bucket slabs.
* ``update_rule`` — ``"minibatch"`` (default: true minibatch Adam) or
  ``"reference"`` (the reference's effective update: ONE Adam step per
  epoch from the epoch's runt batch, ``search/li/model.py:191-211``) —
  for A/B-bounding the training-dynamics recall delta.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, List, Optional, Sequence, Union

SUPPORTED_CLUSTERINGS = ("kmeans", "faiss_kmeans", "scikit_kmeans")
# "faiss_kmeans"/"scikit_kmeans" are accepted for CLI compatibility with the
# reference (search/search.py:322-327); both map to the jitted Lloyd's
# implementation in ops/kmeans.py.


@dataclass(frozen=True)
class ModelParameters:
    """Per-level model hyperparameters (cf. ``search/li/model.py:17-26``)."""

    clustering_algorithm: str
    model_type: str
    epochs: int
    lr: float
    n_categories: int
    # None = unweighted CE; "balanced" = sklearn-style inverse-frequency
    # per-class weights computed per node at build time (the TPU wiring
    # of the reference's CrossEntropyLoss(weight=) knob, model.py:145-161)
    class_weight: Optional[str] = None

    def __iter__(self):
        return iter(dataclasses.astuple(self))


def _expand(arg: Union[List[Any], Any], n_levels: int) -> List[Any]:
    """Broadcast a scalar or singleton list to ``n_levels`` entries
    (cf. ``BuildConfiguration._expand``, ``search/li/BuildConfiguration.py:128-141``)."""
    if isinstance(arg, (list, tuple)):
        if len(arg) == 1:
            return [arg[0]] * n_levels
        return list(arg)
    return [arg] * n_levels


class BuildConfiguration:
    """Per-level build hyperparameters with broadcast and validation."""

    def __init__(
        self,
        clustering_algorithms: Union[Sequence[str], str],
        epochs: Union[Sequence[int], int],
        model_types: Union[Sequence[str], str],
        lrs: Union[Sequence[float], float],
        n_categories: Sequence[int],
        *,
        class_weights: Union[Sequence[Optional[str]], Optional[str]] = None,
        seed: int = 2023,
        batch_size: int = 256,
        chunk_size: int = 1024,
        dtype: str = "float32",
        update_rule: str = "minibatch",
    ):
        assert update_rule in ("minibatch", "reference"), (
            f"Unknown update_rule: {update_rule!r}"
        )
        n_categories = list(n_categories)
        self._validate(clustering_algorithms, epochs, model_types, lrs, n_categories)

        n_levels = len(n_categories)
        self.clustering_algorithms: List[str] = _expand(clustering_algorithms, n_levels)
        self.epochs: List[int] = _expand(epochs, n_levels)
        self.model_types: List[str] = _expand(model_types, n_levels)
        self.lrs: List[float] = _expand(lrs, n_levels)
        self.class_weights: List[Optional[str]] = _expand(class_weights, n_levels)
        for w in self.class_weights:
            assert w in (None, "balanced"), (
                f"Unknown class_weight mode: {w!r} (None or 'balanced')"
            )
        self.n_categories: List[int] = n_categories

        self.seed = int(seed)
        self.batch_size = int(batch_size)
        self.chunk_size = int(chunk_size)
        self.dtype = dtype
        self.update_rule = update_rule

        self.level_configurations: List[ModelParameters] = [
            ModelParameters(
                clustering_algorithm=self.clustering_algorithms[i],
                model_type=self.model_types[i],
                epochs=self.epochs[i],
                lr=self.lrs[i],
                n_categories=self.n_categories[i],
                class_weight=self.class_weights[i],
            )
            for i in range(n_levels)
        ]
        self.n_levels = n_levels

    @staticmethod
    def _validate(clustering_algorithms, epochs, model_types, lrs, n_categories):
        """Cf. ``BuildConfiguration._validate`` (``search/li/BuildConfiguration.py:92-126``)."""
        assert len(n_categories) > 0, "n_categories must specify at least one level"
        assert all(
            isinstance(c, int) and c > 0 for c in n_categories
        ), "n_categories must be positive integers"

        per_level = [clustering_algorithms, epochs, model_types, lrs]
        are_lists = all(isinstance(a, (list, tuple)) for a in per_level)
        are_scalars = all(
            [
                isinstance(clustering_algorithms, str),
                isinstance(epochs, int),
                isinstance(model_types, str),
                isinstance(lrs, float),
            ]
        )
        assert are_lists or are_scalars, (
            "clustering_algorithms, epochs, model_types, and lrs must all be "
            "lists or all be single values"
        )
        for arg in per_level:
            if isinstance(arg, (list, tuple)):
                assert len(arg) in (1, len(n_categories)), (
                    "per-level arguments must be lists of size 1 or the same "
                    "size as n_categories"
                )
        algos = (
            clustering_algorithms
            if isinstance(clustering_algorithms, (list, tuple))
            else [clustering_algorithms]
        )
        for algo in algos:
            assert algo in SUPPORTED_CLUSTERINGS, f"Unknown clustering algorithm: {algo}"
        from learnedmetricindex_tpu.models.mlp import MLP_REGISTRY

        models = (
            model_types
            if isinstance(model_types, (list, tuple))
            else [model_types]
        )
        for m in models:
            # fail at config time, not mid-build (the reference defers to
            # a torch KeyError inside Model.__init__, ``model.py:89-99``)
            assert m in MLP_REGISTRY, (
                f"Unknown model type: {m} (supported: "
                f"{sorted(MLP_REGISTRY)})"
            )

    def to_dict(self) -> dict:
        return {
            "clustering_algorithms": self.clustering_algorithms,
            "epochs": self.epochs,
            "model_types": self.model_types,
            "lrs": self.lrs,
            "n_categories": self.n_categories,
            "class_weights": self.class_weights,
            "seed": self.seed,
            "batch_size": self.batch_size,
            "chunk_size": self.chunk_size,
            "dtype": self.dtype,
            "update_rule": self.update_rule,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "BuildConfiguration":
        return cls(
            d["clustering_algorithms"],
            d["epochs"],
            d["model_types"],
            d["lrs"],
            d["n_categories"],
            class_weights=d.get("class_weights"),
            seed=d.get("seed", 2023),
            batch_size=d.get("batch_size", 256),
            chunk_size=d.get("chunk_size", 1024),
            dtype=d.get("dtype", "float32"),
            update_rule=d.get("update_rule", "minibatch"),
        )

    def __repr__(self) -> str:  # pragma: no cover
        return f"BuildConfiguration({self.to_dict()})"
