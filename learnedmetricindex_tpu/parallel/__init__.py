from learnedmetricindex_tpu.parallel.mesh import create_mesh, data_model_axes
from learnedmetricindex_tpu.parallel.distributed import sharded_kmeans


def __getattr__(name):
    # lazy: sharded_mutation pulls in the full index/serving stack
    if name == "ShardedDynamicIndex":
        from learnedmetricindex_tpu.parallel.sharded_mutation import (
            ShardedDynamicIndex,
        )

        return ShardedDynamicIndex
    raise AttributeError(name)


__all__ = [
    "create_mesh",
    "data_model_axes",
    "sharded_kmeans",
    "ShardedDynamicIndex",
]
