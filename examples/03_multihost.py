"""Multi-HOST LMI: one process per host, the same public API.

The single-controller mesh flow (``02_multichip.py``) stops at what one
process can address.  TPU pods run one process per host; this example
shows the full multi-process recipe — ``jax.distributed`` init, a
global mesh, per-process data feeding, build → sharded store → search —
and, run without arguments, DEMONSTRATES it by launching two local
CPU processes (4 virtual devices each) wired through a coordinator,
exactly like ``tests/test_multiprocess.py``:

    python examples/03_multihost.py

On a real pod, run the worker body on every host instead (the
commented ``main(...)`` call at the bottom), with ``process_id`` /
``coordinator_address`` from your launcher.  The reference is strictly
single-process (SURVEY.md §2.3) — this layer has no counterpart there.
"""

import os
import subprocess
import sys


def main(process_id: int, num_processes: int, coordinator: str) -> None:
    """The per-host worker body: everything after this line is the SAME
    code a single-controller user writes — only the three setup calls
    (initialize / global_mesh / from_process_local) are pod-specific."""
    import numpy as np

    from jax.sharding import PartitionSpec as P

    from learnedmetricindex_tpu.parallel import multiprocess as mp

    mp.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    mesh = mp.global_mesh()  # ("data", "model") over every chip of the pod

    import learnedmetricindex_tpu as lmi
    from learnedmetricindex_tpu.data import synthetic_blobs
    from learnedmetricindex_tpu.ops import exact_knn, recall

    # every process computes the same dataset deterministically but
    # feeds only ITS OWN slice of rows (stand-in for per-host loaders)
    data, queries = synthetic_blobs(2048, 32, 64, n_clusters=12, seed=13)
    share = len(data) // num_processes
    gdata = mp.from_process_local(
        data[process_id * share : (process_id + 1) * share],
        mesh,
        P(("data", "model"), None),
    )

    cfg = lmi.BuildConfiguration("kmeans", 30, "MLP", 0.02, [8], seed=3)
    index, pred, nb, build_s, _ = lmi.LearnedIndexBuilder(
        gdata, cfg, mesh=mesh
    ).build()
    store = index.get_sharded_store(gdata, pred, mesh)

    local_bytes = sum(
        s.data.nbytes for s in store.chunk_data.addressable_shards
    )
    dd, ii, times = index.search(
        gdata, queries, gdata, queries, pred, None,
        n_buckets=nb, k=10, store=store,
    )
    _, gt = exact_knn(data, queries, k=10)
    r = recall(ii, gt, 10)
    print(
        f"[proc {process_id}] {jax_summary()} | store {local_bytes / 2**20:.2f}"
        f" MiB local of {store.chunk_data.nbytes / 2**20:.2f} MiB | "
        f"build {build_s:.1f}s | full-visit recall@10 {r:.4f}",
        flush=True,
    )
    assert r == 1.0, r
    print(f"[proc {process_id}] OK", flush=True)


def jax_summary() -> str:
    import jax

    return (
        f"{jax.process_count()} procs x "
        f"{len(jax.local_devices())} local devices"
    )


def _demo_two_local_processes() -> None:
    """Self-contained demo: 2 coordinator-wired CPU processes."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(pid), "2", f"localhost:{port}"],
            env=env,
        )
        for pid in range(2)
    ]
    try:
        rcs = [p.wait(timeout=600) for p in procs]
    finally:
        # one worker dying pre-handshake leaves its sibling blocked in
        # jax.distributed.initialize — never orphan it
        for p in procs:
            if p.poll() is None:
                p.kill()
    if any(rcs):
        raise SystemExit(f"worker exit codes: {rcs}")
    print("multi-host demo OK")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        # worker: force the virtual-CPU mesh BEFORE jax initializes
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=4"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
        # the package, when run from a source checkout (sys.path[0] is
        # examples/); harmless if it is installed
        sys.path.insert(
            0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        main(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    else:
        _demo_two_local_processes()
        # On a real pod, instead run on every host:
        # main(process_id=<host index>, num_processes=<n hosts>,
        #      coordinator="<host0>:<port>")
