from learnedmetricindex_tpu.ops.knn import exact_knn, recall
from learnedmetricindex_tpu.ops.kmeans import kmeans, kmeans_nodes

__all__ = ["exact_knn", "recall", "kmeans", "kmeans_nodes"]
