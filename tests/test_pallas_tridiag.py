"""Fused Pallas block-tridiagonal solver: parity with the XLA scan
implementation and a dense reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from slam_tricks_tpu.ops.pallas_tridiag import tridiag_solve
from slam_tricks_tpu.solvers.banded_flat import block_tridiag_solve


def _system(G, m, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    Gm = rng.normal(size=(G, m, m + 4))
    D = (Gm @ Gm.transpose(0, 2, 1) + (m / 2) * np.eye(m)[None]).astype(dtype)
    E = (0.3 * rng.normal(size=(G - 1, m, m))).astype(dtype)
    r = rng.normal(size=(G, m)).astype(dtype)
    return D, E, r


def _dense(D, E, r):
    G, m, _ = D.shape
    M = np.zeros((G, m, G, m))
    for g in range(G):
        M[g, :, g, :] = D[g]
    for g in range(G - 1):
        M[g + 1, :, g, :] = E[g]
        M[g, :, g + 1, :] = E[g].T
    return np.linalg.solve(M.reshape(G * m, G * m),
                           np.asarray(r, np.float64).reshape(-1)
                           ).reshape(G, m)


def test_matches_dense_and_xla_f64():
    D, E, r = _system(12, 16)
    ref = _dense(D, E, r)
    x_xla = block_tridiag_solve(jnp.asarray(D), jnp.asarray(E),
                                jnp.asarray(r))
    x_pal = tridiag_solve(jnp.asarray(D), jnp.asarray(E), jnp.asarray(r),
                          interpret=True)
    np.testing.assert_allclose(np.asarray(x_xla), ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(x_pal), ref, atol=1e-9)


def test_f32_bench_shape():
    D, E, r = _system(16, 48, seed=3, dtype=np.float32)
    ref = _dense(D, E, r)
    x_pal = tridiag_solve(jnp.asarray(D), jnp.asarray(E), jnp.asarray(r),
                          interpret=True)
    scale = np.abs(ref).max()
    assert np.max(np.abs(np.asarray(x_pal, np.float64) - ref)) < 1e-4 * scale


def test_single_block():
    D, E, r = _system(1, 8, seed=5)
    E = E.reshape(0, 8, 8)
    x = tridiag_solve(jnp.asarray(D), jnp.asarray(E), jnp.asarray(r),
                      interpret=True)
    ref = np.linalg.solve(D[0], np.asarray(r[0], np.float64))
    np.testing.assert_allclose(np.asarray(x)[0], ref, atol=1e-9)


def test_cyclic_reduction_matches_dense():
    from slam_tricks_tpu.solvers.banded_flat import block_tridiag_solve_cr

    for G, m in ((1, 8), (2, 8), (7, 16), (12, 16), (13, 16)):
        D, E, r = _system(G, m, seed=G)
        if G == 1:
            E = E.reshape(0, m, m)
        ref = _dense(D, E, r)
        x = block_tridiag_solve_cr(jnp.asarray(D), jnp.asarray(E),
                                   jnp.asarray(r))
        np.testing.assert_allclose(np.asarray(x), ref, atol=1e-9,
                                   err_msg=f"G={G}")
