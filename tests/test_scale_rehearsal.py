"""100M-scale rehearsal: validate the v5e-8 deployment shapes without
the 76 GB corpus.

The north star the docstrings name (100M×768 over a v5e-8,
``parallel/sharded_index.py``; reference scaling table
``/root/reference/README.md:70-75``) cannot be stood up here — but
everything about it EXCEPT the slab bytes can: this test builds the
REAL sharded-store metadata for 100M rows (true bucket-size
distribution, true id grid through the native layout engine, true
per-device CSR) with mock d=8 slabs, runs a real ``sharded_search``
over the 8-virtual-device mesh against a visited-bucket oracle, and
asserts every headroom margin the 768-d deployment relies on:

* padded slot ids fit int32 (the kernel's slot arithmetic and the
  id grid are int32) with the measured margin;
* scan-plan pair indices at the 10k-query flagship load fit the
  packed item-meta bit budget;
* host-side plan build (the per-search serial work) stays
  sub-second at 100M shapes;
* per-chip memory at d=768 is computed from the REAL layout and
  stays within a v5e chip's 16 GB.
"""

import os
import time

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)

N = 100_000_000
N_BUCKETS = 1200  # flagship density (120 buckets / 10M) scaled 10x
CHUNK = 2048
D_MOCK = 8


@pytest.fixture(scope="module")
def layout():
    """True-scale bucket-size distribution + mock tiny-d corpus."""
    if os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_AVPHYS_PAGES") < 2**34:
        pytest.skip("needs ~16 GB free host RAM for the 100M id grid")
    rng = np.random.default_rng(2023)
    # lognormal imbalance matching the measured k-means bucket spread
    w = rng.lognormal(0.0, 0.4, N_BUCKETS)
    counts = np.floor(w / w.sum() * N).astype(np.int64)
    counts[0] += N - counts.sum()
    bucket_of_row = np.repeat(np.arange(N_BUCKETS, dtype=np.int32), counts)
    data = rng.integers(-127, 128, (N, D_MOCK), dtype=np.int8)
    return counts, bucket_of_row, data


def test_100m_shard_layout_and_search(layout):
    counts, bucket_of_row, data = layout
    from learnedmetricindex_tpu.parallel.mesh import create_mesh
    from learnedmetricindex_tpu.parallel.sharded_index import (
        shard_store,
        sharded_search,
    )

    mesh = create_mesh(8)
    t0 = time.perf_counter()
    sharded = shard_store(data, bucket_of_row, N_BUCKETS, mesh, chunk=CHUNK)
    t_shard = time.perf_counter() - t0

    # ---- headroom asserts (the 768-d deployment's real margins) ----
    slots_per_dev = sharded.chunk_data.shape[1]
    assert slots_per_dev * 8 < 2**31, "global padded slots must fit int32"
    pad_waste = slots_per_dev * 8 / N - 1.0
    assert pad_waste < 0.05, f"padding waste {pad_waste:.1%} (budget 5%)"
    # per-chip bytes at the REAL d=768 int8 deployment, from this layout
    per_chip_768 = slots_per_dev * (768 + 4 + 4)  # slabs + id + scale
    assert per_chip_768 < 12 * 2**30, (
        f"{per_chip_768/2**30:.1f} GiB/chip exceeds the 12 GiB budget "
        "(16 GB HBM minus query/working space)"
    )

    # ---- host plan build at the flagship query load ----------------
    from learnedmetricindex_tpu.index.bucket_store import build_scan_plan
    from learnedmetricindex_tpu.ops.scan_kernel import META_PAIR_SHIFT

    rng = np.random.default_rng(7)
    Q_PLAN, V = 10_000, 4
    order_plan = np.stack(
        [rng.choice(N_BUCKETS, V, replace=False) for _ in range(Q_PLAN)]
    ).astype(np.int64)
    # per-device plans exactly as sharded_search builds them
    t0 = time.perf_counter()
    plans, w_max, qp_max = [], 0, 0
    for dev in range(8):
        sub = sharded.sub_stores[dev]
        local = np.where(
            sharded.bucket_device[order_plan] == dev,
            sharded.bucket_local[order_plan],
            -1,
        )
        p = build_scan_plan(sub, local, qtile=128)
        plans.append(p)
        w_max = max(w_max, len(p.item_chunk))
        qp_max = max(qp_max, len(p.qidx))
    t_plan = time.perf_counter() - t0
    assert t_plan < 5.0, f"host plan build took {t_plan:.1f}s at 100M shapes"
    # pair ids fit the packed metadata word
    assert qp_max // 128 < (1 << (31 - META_PAIR_SHIFT))

    # ---- one real search on the mesh vs a visited-bucket oracle ----
    Q = 64
    queries = rng.normal(size=(Q, D_MOCK)).astype(np.float32)
    order = np.stack(
        [rng.choice(N_BUCKETS, V, replace=False) for _ in range(Q)]
    ).astype(np.int64)
    t0 = time.perf_counter()
    dists, ids = sharded_search(sharded, queries, order, k=10)
    t_search = time.perf_counter() - t0
    dists, ids = np.asarray(dists), np.asarray(ids)
    assert ids.shape == (Q, 10) and (ids > 0).all() and (ids <= N).all()

    # oracle: brute force over each query's visited buckets (int8 rows
    # dequantize exactly at d=8, so distances must match to f32 eps)
    starts = np.concatenate([[0], np.cumsum(counts)])
    for qi in range(0, Q, 16):
        rows = np.concatenate(
            [np.arange(starts[b], starts[b + 1]) for b in order[qi]]
        )
        cand = data[rows].astype(np.float32)
        d_or = 1.0 - cand @ queries[qi]
        best = np.argsort(d_or, kind="stable")[:10]
        np.testing.assert_allclose(
            dists[qi], d_or[best], rtol=1e-5, atol=1e-5
        )
        # ids match wherever distances are untied
        untied = np.diff(d_or[best]) > 1e-6
        mask = np.concatenate([[True], untied]) & np.concatenate(
            [untied, [True]]
        )
        np.testing.assert_array_equal(
            ids[qi][mask], rows[best][mask] + 1
        )

    print(
        f"\n100M rehearsal: shard_store {t_shard:.1f}s, "
        f"plan build {t_plan*1e3:.0f}ms (W_max={w_max}), "
        f"search({Q} queries) {t_search:.1f}s, "
        f"{slots_per_dev} slots/dev -> {per_chip_768/2**30:.2f} GiB/chip "
        f"at d=768 int8, padding waste {pad_waste:.2%}"
    )
