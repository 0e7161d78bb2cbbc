"""Native runtime (C++ kd-tree + chessboard growth) vs scipy / Python paths."""

import numpy as np
import pytest

from slam_tricks_tpu.native import KDTree, available, grow_chessboards_native

RNG = np.random.default_rng(23)


def test_kdtree_matches_scipy():
    from scipy.spatial import cKDTree

    pts = RNG.normal(size=(2000, 3)).astype(np.float32)
    q = RNG.normal(size=(64, 3)).astype(np.float32)
    idx, d2 = KDTree(pts).query(q, k=4)
    d_ref, i_ref = cKDTree(pts).query(q, k=4)
    np.testing.assert_array_equal(idx, i_ref)
    np.testing.assert_allclose(d2, d_ref.astype(np.float32) ** 2, atol=1e-4)


def test_kdtree_2d():
    pts = RNG.uniform(0, 100, size=(500, 2)).astype(np.float32)
    idx, d2 = KDTree(pts).query(pts[:10], k=1)
    np.testing.assert_array_equal(idx[:, 0], np.arange(10))
    assert (d2 < 1e-6).all()


def test_grow_chessboards_lattice():
    xs, ys = np.meshgrid(np.arange(7), np.arange(5))
    xy = np.stack([xs.ravel() * 18.0 + 40, ys.ravel() * 18.0 + 30], 1)
    xy += RNG.normal(size=xy.shape) * 0.3
    scores = np.ones(len(xy), np.float32)
    boards = grow_chessboards_native(xy, scores)
    assert boards
    assert boards[0].size >= 28, boards[0].shape
    # every index appears at most once
    flat = boards[0].ravel()
    assert len(set(flat.tolist())) == len(flat)


@pytest.mark.skipif(not available(), reason="native toolchain unavailable")
def test_native_lib_loaded():
    assert available()
