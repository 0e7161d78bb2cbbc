"""Fused Pallas SPD solve (ops/pallas_chol.py) — correctness vs LAPACK in
interpreter mode (on-chip timing lives in profile/bench scripts)."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tricks_tpu.ops.pallas_chol import chol_solve, pad_spd


def _spd(n, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n))
    S = A @ A.T + n * np.eye(n)
    b = rng.normal(size=n)
    return S.astype(dtype), b.astype(dtype)


def test_matches_lapack_all_sizes():
    for n in (64, 128, 200, 576):
        S, b = _spd(n, seed=n)
        x = chol_solve(jnp.asarray(S), jnp.asarray(b), interpret=True)
        ref = np.linalg.solve(S.astype(np.float64), b.astype(np.float64))
        err = np.max(np.abs(np.asarray(x) - ref)) / np.max(np.abs(ref))
        assert err < 5e-6, (n, err)


def test_padding_identity_tail():
    S, b = _spd(200, seed=3)
    Sp, bp, n = pad_spd(jnp.asarray(S), jnp.asarray(b))
    assert Sp.shape[0] % 128 == 0 and n == 200
    # padded tail is identity-diagonal with zero rhs
    tail = np.asarray(Sp)[200:, 200:]
    np.testing.assert_array_equal(tail, np.eye(tail.shape[0], dtype=tail.dtype))
    assert float(np.abs(np.asarray(bp)[200:]).max()) == 0.0


def test_ba_reduced_system_shape():
    """The actual S produced by the flat BA solver solves identically."""
    from slam_tricks_tpu.sim import make_scene, perturb_scene
    from slam_tricks_tpu.solvers import schur_flat

    scene = make_scene(n_per_wall=10, n_cams=6, seed=21, dtype=np.float32)
    poses0, points0, fixed = perturb_scene(scene, seed=22)
    C, L = scene.n_cams, scene.n_points
    work = schur_flat.build_flat_work(scene.obs, C, L, dtype=np.float32)
    Hpp_f, gp, Hll_f, gl, W, _ = schur_flat._iteration_quantities(
        poses0, points0, scene.obs, work, C, L)
    # build the damped gauge-fixed S via the internal path, then compare
    # the Pallas solve against cho_solve on the same matrix
    lam = jnp.asarray(1e-4, np.float32)
    dp_ref, _, _, _ = schur_flat._solve_flat(Hpp_f, gp, Hll_f, gl, W, lam,
                                             fixed, work, C, L)
    # reproduce S/b through the public pieces: easiest is solving with the
    # pallas kernel plugged in (solver_backend="pallas")
    dp_pal, _, _, _ = schur_flat._solve_flat(Hpp_f, gp, Hll_f, gl, W, lam,
                                             fixed, work, C, L,
                                             chol_backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(dp_pal), np.asarray(dp_ref),
                               atol=2e-5)
