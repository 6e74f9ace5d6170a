from learnedmetricindex_tpu.index.bucket_store import BucketStore
from learnedmetricindex_tpu.index.builder import LearnedIndexBuilder
from learnedmetricindex_tpu.index.index import LearnedIndex
from learnedmetricindex_tpu.index.mutation import DynamicIndex

__all__ = [
    "BucketStore",
    "LearnedIndexBuilder",
    "LearnedIndex",
    "DynamicIndex",
]
