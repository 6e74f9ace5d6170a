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
