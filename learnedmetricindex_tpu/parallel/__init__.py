from learnedmetricindex_tpu.parallel.mesh import create_mesh, data_model_axes
from learnedmetricindex_tpu.parallel.distributed import (
    make_sharded_build_step,
    sharded_kmeans,
)

__all__ = [
    "create_mesh",
    "data_model_axes",
    "make_sharded_build_step",
    "sharded_kmeans",
]
