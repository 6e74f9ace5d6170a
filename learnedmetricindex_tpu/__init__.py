"""Learned Metric Index, TPU-native.

A from-scratch JAX/XLA/Pallas re-design of the Learned Metric Index
(reference: Coda-Research-Group/LearnedMetricIndex) — an index for
approximate nearest-neighbor search over dense embeddings:

* build  = recursively partition the dataset with k-means, then train a
  small MLP per internal node to imitate that partitioning
  (reference: ``search/li/LearnedIndexBuilder.py:43-107``),
* query  = run queries through the MLP tree to rank leaf buckets by
  probability, scan the ``n_buckets`` best buckets with exact
  inner-product kNN, and merge (reference: ``search/li/LearnedIndex.py:41-161``).

The TPU design differs structurally from the reference:

* buckets live in a chunked, padded, device-resident store
  (:mod:`learnedmetricindex_tpu.index.bucket_store`) instead of pandas
  groupby scans;
* all per-node MLPs of a level are trained *concurrently* as one stacked
  (vmapped) parameter pytree instead of a sequential Python loop;
* navigation precomputes every node's probabilities in batched matmuls
  and replays the reference's best-first traversal as a vectorized
  array state machine;
* the bucket scan is a flat (query, chunk) work list executed by an MXU
  matmul + fused top-k kernel, sharded across a ``jax.sharding.Mesh``.
"""

from learnedmetricindex_tpu.config import BuildConfiguration, ModelParameters

__version__ = "0.1.0"

_LAZY = {
    "Baseline": ("learnedmetricindex_tpu.baseline", "Baseline"),
    "LearnedIndexBuilder": (
        "learnedmetricindex_tpu.index.builder",
        "LearnedIndexBuilder",
    ),
    "LearnedIndex": ("learnedmetricindex_tpu.index.index", "LearnedIndex"),
    # reference-API model wrapper (``search/li/model.py:130-241``)
    "NeuralNetwork": (
        "learnedmetricindex_tpu.models.train",
        "NeuralNetwork",
    ),
    # serving-facing mutable index (insert/delete without rebuild — no
    # reference analog: its index is build-once)
    "DynamicIndex": (
        "learnedmetricindex_tpu.index.mutation",
        "DynamicIndex",
    ),
}


def __getattr__(name):
    # Lazy so that importing the package does not pull jax-heavy modules
    # (keeps CLI --help fast and avoids import cycles).
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(name)


def _machine_cache_key() -> str:
    """Fingerprint of this host's CPU feature set.  XLA:CPU AOT
    artifacts encode target machine features (avx512, amx, ...);
    loading one compiled on a different machine SIGILLs/segfaults
    ("Target machine feature +X is not supported on this host").  A
    shared /tmp cache dir must therefore be keyed per machine type."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:10]


def enable_compilation_cache(path: str = "/tmp/lmi-jax-cache") -> bool:
    """Enable JAX's persistent compilation cache — **TPU backend
    only** (opt-in; the CLI, bench, and examples call this).
    Fresh-process XLA compiles otherwise dominate wall-clock on
    remote-compile TPU runtimes — the scan's sort-merge alone
    compiles for minutes.  Returns False (a no-op) on non-TPU
    backends or when the running jax build lacks support.

    Why the backend gate: persisted **XLA:CPU** executables are AOT
    machine code for the *compiling* host's exact CPU features;
    loading one on a different host is at best a
    ``cpu_aot_loader.cc`` feature-mismatch warning and at worst
    SIGILL/SIGSEGV *inside deserialization* — observed as a
    deterministic full-test-suite crash when an in-process CLI run
    had globally enabled the cache and a later test's server
    dispatcher thread re-read a stale entry.  TPU executables
    carry topology/version metadata and fail loudly instead.  The
    directory is still suffixed with a CPU fingerprint as a second
    fence."""
    try:
        import jax

        if jax.default_backend() != "tpu":
            return False
        jax.config.update(
            "jax_compilation_cache_dir", f"{path}-{_machine_cache_key()}"
        )
        # 0: persist even sub-second programs — navigation alone spans
        # ~38 small programs of ~0.4 s each through the remote compile
        # service, all below the 0.5 s default threshold
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        return True
    except Exception:
        return False


__all__ = [
    "BuildConfiguration",
    "ModelParameters",
    "Baseline",
    "LearnedIndexBuilder",
    "LearnedIndex",
    "NeuralNetwork",
    "DynamicIndex",
    "enable_compilation_cache",
    "__version__",
]
