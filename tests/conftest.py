"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the
host platform to expose 8 XLA CPU devices (the TPU-world equivalent of
"test multi-node without a cluster"; the reference never needed this —
it is single-process, SURVEY.md §2.3).
"""

import gc
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (must come after XLA_FLAGS)

# The env var route (JAX_PLATFORMS) is overridden by site configuration in
# some environments; the config API always wins.
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_last_module = [None]


def pytest_runtest_teardown(item):
    # Release JAX's process-global executable/tracing caches at module
    # boundaries.  The suite compiles hundreds of distinct programs
    # (every store layout / mesh / dtype combination is a fresh
    # executable); XLA:CPU never evicts them, and each pins buffers whose
    # mmap'd allocations accumulate as VMAs.  A full run crosses the
    # kernel's vm.max_map_count (65530) around test ~170 and the next
    # mmap — wherever it lands, usually inside a compile — segfaults.
    # Production processes reuse a handful of shapes and never approach
    # the limit; 204 tests × unique shapes in one process do.
    module = item.nodeid.split("::", 1)[0]
    if _last_module[0] is not None and module != _last_module[0]:
        jax.clear_caches()
        gc.collect()
    _last_module[0] = module

    path = os.environ.get("LMI_MAPS_LOG")
    if path:
        n = sum(1 for _ in open(f"/proc/{os.getpid()}/maps"))
        with open(path, "a") as f:
            f.write(f"{n} {item.nodeid}\n")
