"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the
host platform to expose 8 XLA CPU devices (the TPU-world equivalent of
"test multi-node without a cluster"; the reference never needed this —
it is single-process, SURVEY.md §2.3).
"""

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
