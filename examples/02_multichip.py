"""Multi-chip LMI: build over a device mesh, search a sharded store.

Runs anywhere: on a multi-chip TPU host the mesh spans the real chips;
on a CPU-only (or 1-chip) box run it on a virtual CPU mesh:

    LMI_FORCE_CPU=1 python examples/02_multichip.py

(``LMI_FORCE_CPU`` routes through ``jax.config.update("jax_platforms",
"cpu")`` — a bare ``JAX_PLATFORMS=cpu`` env var can be overridden by
site configuration.)

The flow is the README's multi-chip snippet end-to-end (the reference
has no distributed counterpart — SURVEY.md §2.3):

1. build with ``LearnedIndexBuilder(data, cfg, mesh=...)`` — level-0
   k-means runs mesh-sharded (psum centroid reduction) and all sibling
   node MLPs train expert-parallel over the ``"model"`` axis;
2. ``index.get_sharded_store`` balances leaf buckets over the mesh
   devices (per-chip slab bytes = corpus / n_devices);
3. ``index.search(..., store=...)`` runs per-shard local scans with a
   shard-local exact rerank, merged by one cross-chip top-k.

For multi-HOST pods the same calls work with one process per host —
see ``learnedmetricindex_tpu/parallel/multiprocess.py`` (initialize →
global_mesh → from_process_local) and the 2-process end-to-end test in
``tests/test_multiprocess.py``.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

if "xla_force_host_platform_device_count" not in os.environ.get(
    "XLA_FLAGS", ""
):
    # default to an 8-device virtual CPU mesh when run on a 1-chip box
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("LMI_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

if jax.device_count() < 2:
    print("need >= 2 devices (run with LMI_FORCE_CPU=1 for a virtual "
          "CPU mesh — see module docstring)")
    sys.exit(1)

import numpy as np  # noqa: E402

import learnedmetricindex_tpu as lmi  # noqa: E402
from learnedmetricindex_tpu.data import synthetic_blobs  # noqa: E402
from learnedmetricindex_tpu.ops import exact_knn, recall  # noqa: E402
from learnedmetricindex_tpu.parallel.mesh import create_mesh  # noqa: E402

n_devices = min(jax.device_count(), 8)
mesh = create_mesh(n_devices)
print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))} "
      f"over {n_devices} devices")

data, queries = synthetic_blobs(20_000, 96, 500, n_clusters=32, seed=2023)

cfg = lmi.BuildConfiguration(
    clustering_algorithms="kmeans",
    epochs=30, model_types="MLP", lrs=0.01,
    n_categories=[4, 4],               # 2-level tree, 16 leaf buckets
)
index, pred, n_buckets, build_s, cluster_s = lmi.LearnedIndexBuilder(
    data, cfg, mesh=mesh
).build()
print(f"built {n_buckets} buckets in {build_s:.1f}s "
      f"(cluster {cluster_s:.1f}s)")

store = index.get_sharded_store(data, pred, mesh)
per_chip = store.nbytes_device_arrays() // n_devices
print(f"sharded store: {store.chunk_data.nbytes/1e6:.1f} MB slabs, "
      f"~{per_chip/1e6:.1f} MB per device")

dists, nns, times = index.search(
    data, queries, data, queries, pred, cfg.n_categories,
    n_buckets=4, k=10, store=store,
)
_, gt = exact_knn(data, queries, k=10)
print(f"recall@10 visiting 4/{n_buckets} buckets: {recall(nns, gt, 10):.4f} "
      f"(search {times['search']:.3f}s)")

# precision="highest" for an exact full-visit check: the default
# two-stage fast path is exact only over each shard's k+margin
# shortlist, and bf16 bulk-scan noise (~2e-3) can nudge a near-tied
# true neighbor off a shortlist — fine in production, not for a
# recall == 1.0 assertion
_, nns_all, _ = index.search(
    data, queries, data, queries, pred, cfg.n_categories,
    n_buckets=n_buckets, k=10, store=store, precision="highest",
    rerank=False,
)
r = recall(nns_all, gt, 10)
print(f"recall@10 visiting ALL buckets: {r:.4f}")
assert r == 1.0
print("OK")
