from learnedmetricindex_tpu.parallel.mesh import create_mesh, data_model_axes
from learnedmetricindex_tpu.parallel.distributed import sharded_kmeans

__all__ = [
    "create_mesh",
    "data_model_axes",
    "sharded_kmeans",
]
