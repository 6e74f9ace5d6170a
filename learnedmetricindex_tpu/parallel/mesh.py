"""Device mesh utilities.

The reference is single-process/single-device (SURVEY.md §2.3: no
torch.distributed, no NCCL/MPI anywhere); scaling here is first-class
and TPU-native: a 2-D ``jax.sharding.Mesh`` with axes

* ``"data"``  — dataset rows / query batch / bucket chunks (the LMI
  scaling axis: 100K → 100M vectors, ``search/search.py:311``),
* ``"model"`` — the stacked node-model axis (the LMI tree is
  structurally MoE-like — a router over bucket "experts" — so sibling
  node models shard like experts).

Collectives ride ICI: centroid partial sums ``psum`` over ``"data"``,
per-shard top-k merges ``all_gather`` over ``"data"``, per-model Adam
updates stay local to their ``"model"`` shard.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def data_model_axes(n_devices: int, model_axis: Optional[int] = None) -> Tuple[int, int]:
    """Factor ``n_devices`` into (data, model) axis sizes.

    Defaults to the largest model axis ≤ √n that divides n, keeping the
    data axis ≥ model axis (bucket scans and k-means dominate FLOPs).
    """
    if model_axis is not None:
        assert n_devices % model_axis == 0
        return n_devices // model_axis, model_axis
    m = 1
    for cand in range(int(np.sqrt(n_devices)), 0, -1):
        if n_devices % cand == 0:
            m = cand
            break
    return n_devices // m, m


def create_mesh(
    n_devices: Optional[int] = None, model_axis: Optional[int] = None
) -> Mesh:
    """Create a ("data", "model") mesh over the first ``n_devices``."""
    devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, (
            f"need {n_devices} devices, have {len(devices)}"
        )
        devices = devices[:n_devices]
    n = len(devices)
    dp, mp = data_model_axes(n, model_axis)
    return Mesh(np.asarray(devices).reshape(dp, mp), ("data", "model"))


def get_shard_map():
    """``jax.shard_map`` with a fallback to the pre-0.8 experimental
    location — the single import point so call sites don't each carry
    the deprecation dance."""
    try:
        return jax.shard_map
    except AttributeError:  # jax < 0.8
        from jax.experimental.shard_map import shard_map

        return shard_map


def shard_map_nocheck(local, mesh, in_specs, out_specs):
    """``shard_map`` with replication checking off, the disable kwarg
    probed per jax version (``check_vma`` today, ``check_rep`` before)
    — for bodies whose outputs carry no replication info (pallas calls,
    ``psum_scatter`` results)."""
    import inspect

    shard_map = get_shard_map()
    params = inspect.signature(shard_map).parameters
    if "check_vma" in params:
        kwargs = {"check_vma": False}
    elif "check_rep" in params:  # pragma: no cover - older jax
        kwargs = {"check_rep": False}
    else:  # pragma: no cover
        kwargs = {}
    return shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **kwargs
    )
