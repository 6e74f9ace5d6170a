"""Native layout engine: C++ path vs numpy fallback equivalence."""

import numpy as np
import pytest

from learnedmetricindex_tpu import native


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(0)
    n, G, tile = 50_000, 13, 64
    gids = rng.integers(0, G, size=n).astype(np.int64)
    labels = rng.integers(0, 5, size=n).astype(np.int32)
    counts = np.bincount(gids, minlength=G)
    padded = np.maximum(-(-counts // tile) * tile, tile)
    seg = np.concatenate([[0], np.cumsum(padded)[:-1]]).astype(np.int64)
    total = int(padded.sum())
    return gids, labels, counts, seg, total


def _numpy_fill(gids, labels, seg, total):
    order = np.argsort(gids, kind="stable")
    counts = np.bincount(gids, minlength=len(seg))
    src = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slots = seg[gids[order]] + (np.arange(len(gids)) - src[gids[order]])
    sr = np.full(total, -1, np.int32)
    sr[slots] = order
    lo = np.full(total, -1, np.int32)
    lo[slots] = labels[order]
    return sr, lo


def test_fill_slots_matches_numpy(case):
    gids, labels, counts, seg, total = case
    sr, lo = native.fill_slots(gids, seg, total, labels=labels)
    sr_ref, lo_ref = _numpy_fill(gids, labels, seg, total)
    np.testing.assert_array_equal(sr, sr_ref)
    np.testing.assert_array_equal(lo, lo_ref)


def test_fill_slots_no_labels(case):
    gids, labels, counts, seg, total = case
    sr, lo = native.fill_slots(gids, seg, total)
    assert lo is None
    sr_ref, _ = _numpy_fill(gids, labels, seg, total)
    np.testing.assert_array_equal(sr, sr_ref)


def test_fill_slots_1based(case):
    gids, labels, counts, seg, total = case
    ids = native.fill_slots_1based(gids, seg, total)
    sr_ref, _ = _numpy_fill(gids, labels, seg, total)
    expected = np.where(sr_ref >= 0, sr_ref + 1, 0)
    np.testing.assert_array_equal(ids, expected)


def test_bincount(case):
    gids, labels, counts, seg, total = case
    np.testing.assert_array_equal(native.bincount(gids, len(seg)), counts)


def test_ravel_rows():
    rng = np.random.default_rng(1)
    pred = np.stack(
        [rng.integers(0, 4, 1000), rng.integers(0, 7, 1000),
         rng.integers(0, 3, 1000)], axis=1
    ).astype(np.int64)
    got = native.ravel_rows(pred, (4, 7, 3))
    ref = np.ravel_multi_index((pred[:, 0], pred[:, 1], pred[:, 2]), (4, 7, 3))
    np.testing.assert_array_equal(got, ref)


def test_native_compiled():
    # the toolchain is present in CI and dev images; the fallback is
    # exercised by monkeypatching _load
    assert native.available()


def test_numpy_fallback_path(monkeypatch, case):
    gids, labels, counts, seg, total = case
    monkeypatch.setattr(native, "_load", lambda: None)
    sr, lo = native.fill_slots(gids, seg, total, labels=labels)
    sr_ref, lo_ref = _numpy_fill(gids, labels, seg, total)
    np.testing.assert_array_equal(sr, sr_ref)
    np.testing.assert_array_equal(lo, lo_ref)
    ids = native.fill_slots_1based(gids, seg, total)
    np.testing.assert_array_equal(ids, np.where(sr_ref >= 0, sr_ref + 1, 0))
    np.testing.assert_array_equal(native.bincount(gids, len(seg)), counts)