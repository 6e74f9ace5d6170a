from learnedmetricindex_tpu.utils.logging import Logger, log_runtime
from learnedmetricindex_tpu.utils.timing import Timer

__all__ = ["Logger", "log_runtime", "Timer"]
