from learnedmetricindex_tpu.index.bucket_store import BucketStore
from learnedmetricindex_tpu.index.builder import LearnedIndexBuilder
from learnedmetricindex_tpu.index.index import LearnedIndex

__all__ = ["BucketStore", "LearnedIndexBuilder", "LearnedIndex"]
