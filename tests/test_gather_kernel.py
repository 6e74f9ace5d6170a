"""Pallas row-gather kernels vs the jnp.take oracle (interpret mode on
the CPU mesh; the real-chip A/B lives in tools/probe_gather.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from learnedmetricindex_tpu.ops.gather_kernel import (
    gather_rows,
    gather_rows_ok,
)


@pytest.mark.parametrize("dtype", [np.float32, np.int8, np.int32])
@pytest.mark.parametrize(
    "n,m,d", [(300, 1000, 128), (1000, 77, 256), (64, 64, 128)]
)
def test_gather_rows_vmem_matches_take(dtype, n, m, d):
    rng = np.random.default_rng(0)
    table = rng.integers(-100, 100, (n, d)).astype(dtype)
    idx = rng.integers(0, n, m).astype(np.int32)
    out = gather_rows(
        jnp.asarray(table), jnp.asarray(idx), block_rows=64, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), table[idx])


@pytest.mark.parametrize("dtype,d", [(np.float32, 128), (np.int8, 512)])
def test_gather_rows_hbm_path_matches_take(dtype, d):
    # aligned-block DMA strategy (table rows a multiple of 8 and the
    # int32-view width a lane multiple — the kernel-path gate)
    rng = np.random.default_rng(1)
    table = rng.integers(-90, 90, (512, d)).astype(dtype)
    idx = rng.integers(0, 512, 333).astype(np.int32)
    idx[:4] = [0, 511, 510, 1]
    out = gather_rows(
        jnp.asarray(table), jnp.asarray(idx), block_rows=128,
        interpret=True, strategy="hbm",
    )
    np.testing.assert_array_equal(np.asarray(out), table[idx])


def test_gather_rows_hbm_gate_downgrades():
    # non-conforming shapes silently fall back to the XLA gather
    rng = np.random.default_rng(2)
    for shape, dtype in [((500, 128), np.float32),  # n % 8 != 0
                         ((512, 768), np.int8)]:    # 192 i32 lanes
        table = rng.integers(-9, 9, shape).astype(dtype)
        idx = rng.integers(0, shape[0], 77).astype(np.int32)
        out = gather_rows(jnp.asarray(table), jnp.asarray(idx),
                          strategy="hbm")
        np.testing.assert_array_equal(np.asarray(out), table[idx])


def test_gather_rows_auto_large_table_uses_xla():
    # past the VMEM budget, auto must fall back to table[idx] (the
    # HBM kernel stays opt-in until the on-chip probe proves it)
    import learnedmetricindex_tpu.ops.gather_kernel as gk

    table = np.arange(64 * 128, dtype=np.float32).reshape(64, 128)
    idx = np.array([5, 0, 63], np.int32)
    old = gk.VMEM_TABLE_BYTES
    try:
        gk.VMEM_TABLE_BYTES = 1
        out = gather_rows(jnp.asarray(table), jnp.asarray(idx))
    finally:
        gk.VMEM_TABLE_BYTES = old
    np.testing.assert_array_equal(np.asarray(out), table[idx])


def test_gather_rows_clamps_out_of_range():
    table = np.arange(40 * 128, dtype=np.float32).reshape(40, 128)
    idx = np.array([-5, 0, 39, 1000], np.int32)
    out = gather_rows(
        jnp.asarray(table), jnp.asarray(idx), block_rows=64, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(out), table[np.clip(idx, 0, 39)]
    )


def test_gather_rows_ok_gate():
    assert gather_rows_ok(jnp.zeros((4, 256), jnp.float32))
    assert gather_rows_ok(jnp.zeros((4, 768), jnp.int8))
    # 3-byte rows cannot be viewed as whole int32 lanes
    assert not gather_rows_ok(jnp.zeros((4, 3), jnp.int8))
