"""Multi-process execution: multi-host TPU slices and pods.

The reference is strictly single-process (SURVEY.md §2.3 — no
torch.distributed/NCCL/MPI anywhere); this layer is new, TPU-native
surface.  The design follows the standard JAX multi-controller recipe:

* **One process per host**, each seeing only its local chips;
  :func:`initialize` wires them into one runtime via
  ``jax.distributed.initialize`` (auto-detected on TPU pods — call with
  no arguments; explicit coordinator/process counts for CPU tests or
  exotic launchers).
* **One global mesh over every chip of every process**
  (:func:`global_mesh`).  Within a slice the mesh axes map onto the
  physical ICI torus, so ``psum``/``all_gather`` from the sharded
  k-means, the expert-parallel trainer, and the bucket-scan merge ride
  ICI; across slices XLA routes the same collectives over DCN.  The
  jitted programs are byte-identical to the single-process ones — only
  array *placement* changes.
* **Per-process data feeding** (:func:`from_process_local`): each host
  loads/generates only its local rows; a global array view is assembled
  with ``jax.make_array_from_process_local_data`` — the corpus never
  funnels through one host.

Deployment sketch for the 100M-scale north star (v5e pods): one process
per v5e-8 host, corpus rows split per host on DCN-attached storage,
``global_mesh(model_axis=1)`` → bucket store sharded over all chips via
``shard_store`` (per-chip bytes = corpus/Σchips), queries replicated,
per-chip local scans + a two-stage top-k merge (ICI within host, DCN
across hosts — the all-gather payload is k·D candidates per query,
kilobytes, so DCN latency, not bandwidth, bounds it).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Join the multi-process runtime (idempotent).

    On TPU pods all arguments are auto-detected from the environment —
    call with none.  For CPU emulation / custom launchers, pass the
    coordinator and process layout explicitly (or via the standard
    ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID`` environment variables).
    """
    import jax

    # NB: must not touch the XLA backend before distributed.initialize
    # (jax.process_count()/jax.devices() would initialize it)
    if jax.distributed.is_initialized():
        return
    kwargs = {}
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def global_mesh(model_axis: Optional[int] = None):
    """A ("data", "model") mesh over every device of every process.

    ``jax.devices()`` is global after :func:`initialize`; the standard
    device order keeps each process's chips contiguous, so the "data"
    axis splits first across hosts (DCN) and then across local chips
    (ICI) — collectives prefer ICI hops automatically.
    """
    from learnedmetricindex_tpu.parallel.mesh import create_mesh

    return create_mesh(None, model_axis=model_axis)


def from_process_local(local_rows: np.ndarray, mesh, spec):
    """Assemble a globally-sharded array from per-process row blocks.

    Every process passes ONLY its local rows (equal counts per process);
    the result behaves like one big array sharded by ``spec`` over
    ``mesh`` — feed it to ``sharded_kmeans`` / ``StackedNodeTrainer`` /
    ``shard_store`` exactly like a single-process array.
    """
    import jax
    from jax.sharding import NamedSharding

    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.asarray(local_rows)
    )


def is_multiprocess(mesh) -> bool:
    """True when ``mesh`` spans devices of more than one process."""
    return len({d.process_index for d in mesh.devices.flat}) > 1


def put_global(host_array, mesh, spec):
    """Place a host array that is **identical on every process** as one
    globally-sharded ``jax.Array`` over a (possibly multi-process) mesh.

    Single-process this is plain ``jax.device_put``.  Multi-process,
    each process uploads only the index slices its local devices own
    (``Sharding.addressable_devices_indices_map``) and the global view
    is assembled with ``make_array_from_single_device_arrays`` — no
    process ever needs to address a remote device.  This is how
    replicated metadata (scan plans, slot maps, class masks, query
    batches) reaches a pod: every process computes the same host arrays
    deterministically and contributes its local shards.
    """
    import jax
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    arr = np.asarray(host_array)
    if sharding.is_fully_addressable:
        return jax.device_put(arr, sharding)
    shards = [
        jax.device_put(arr[idx], dev)
        for dev, idx in sharding.addressable_devices_indices_map(
            arr.shape
        ).items()
    ]
    return jax.make_array_from_single_device_arrays(
        arr.shape, sharding, shards
    )


def to_host_replicated(arr) -> np.ndarray:
    """Bring a (possibly non-fully-addressable) ``jax.Array`` to the
    host on EVERY process.  Fully-addressable and fully-replicated
    arrays convert directly; otherwise one ``process_allgather``
    assembles the global value."""
    import jax

    if (
        not isinstance(arr, jax.Array)
        or arr.is_fully_addressable
        or arr.is_fully_replicated
    ):
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


def reshard(arr, mesh, spec):
    """Reshard a global ``jax.Array`` to ``spec`` over ``mesh`` via a
    jitted identity (``jax.jit`` inserts the collectives; works across
    processes, unlike ``device_put`` of non-addressable targets)."""
    import jax
    from jax.sharding import NamedSharding

    target = NamedSharding(mesh, spec)
    if isinstance(arr, jax.Array) and arr.sharding == target:
        return arr
    return jax.jit(lambda a: a, out_shardings=target)(arr)
