from learnedmetricindex_tpu.models.mlp import (
    MLP_REGISTRY,
    init_mlp,
    init_stacked_mlp,
    mlp_apply,
    stacked_mlp_apply,
)
from learnedmetricindex_tpu.models.train import (
    NeuralNetwork,
    train_until_covered,
)

__all__ = [
    "MLP_REGISTRY",
    "init_mlp",
    "init_stacked_mlp",
    "mlp_apply",
    "stacked_mlp_apply",
    "NeuralNetwork",
    "train_until_covered",
]
