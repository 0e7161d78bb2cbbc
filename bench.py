"""Headline benchmark: LM iterations/s of the Schur-complement BA solver on the
production-scale st20 cube-room problem (96 cams, 2400 landmarks, ~83k observations).

Prints ONE JSON line:
  {"metric": "ba_lm_iters_per_s", "value": N, "unit": "iters/s", "vs_baseline": R}

vs_baseline compares against a single-threaded numpy implementation of the
IDENTICAL Schur LM iteration (the honest stand-in for single-core Ceres
SPARSE_SCHUR, reference st20-g2o/src/include/test_ceres.h:143-148 — the repo
publishes no BA timing, BASELINE.md). Baseline target: >= 5x.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def numpy_ba_iteration(poses_R, poses_t, points, cam_idx, lm_idx, uv, weight, lam,
                       fixed_mask):
    """Single-core numpy version of one Schur LM iteration (baseline proxy)."""
    C = poses_R.shape[0]
    L = points.shape[0]
    N = cam_idx.shape[0]
    p = points[lm_idx]
    R = poses_R[cam_idx]
    t = poses_t[cam_idx]
    pc = np.einsum("nij,nj->ni", R, p, optimize=True) + t
    iz = 1.0 / pc[:, 2]
    r = pc[:, :2] * iz[:, None] - uv
    sw = np.sqrt(weight)[:, None]
    r = r * sw
    # Jacobians
    head = np.zeros((N, 2, 3))
    head[:, 0, 0] = iz
    head[:, 1, 1] = iz
    head[:, 0, 2] = -pc[:, 0] * iz * iz
    head[:, 1, 2] = -pc[:, 1] * iz * iz
    hatp = np.zeros((N, 3, 3))
    hatp[:, 0, 1] = -p[:, 2]; hatp[:, 0, 2] = p[:, 1]
    hatp[:, 1, 0] = p[:, 2]; hatp[:, 1, 2] = -p[:, 0]
    hatp[:, 2, 0] = -p[:, 1]; hatp[:, 2, 1] = p[:, 0]
    J_omega = -np.einsum("nij,njk,nkl->nil", head, R, hatp, optimize=True)
    Jp = np.concatenate([J_omega, head], axis=2) * sw[:, :, None]
    Jl = np.einsum("nij,njk->nik", head, R, optimize=True) * sw[:, :, None]
    # assembly
    Hpp = np.zeros((C, 6, 6)); Hll = np.zeros((L, 3, 3))
    gp = np.zeros((C, 6)); gl = np.zeros((L, 3))
    W = np.zeros((C, L, 6, 3))
    JpTJp = np.einsum("nri,nrj->nij", Jp, Jp, optimize=True)
    JlTJl = np.einsum("nri,nrj->nij", Jl, Jl, optimize=True)
    JpTr = np.einsum("nri,nr->ni", Jp, r, optimize=True)
    JlTr = np.einsum("nri,nr->ni", Jl, r, optimize=True)
    Wn = np.einsum("nri,nrj->nij", Jp, Jl, optimize=True)
    np.add.at(Hpp, cam_idx, JpTJp)
    np.add.at(Hll, lm_idx, JlTJl)
    np.add.at(gp, cam_idx, JpTr)
    np.add.at(gl, lm_idx, JlTr)
    np.add.at(W, (cam_idx, lm_idx), Wn)
    # damp + eliminate
    Hpp_d = Hpp.copy()
    for c in range(C):
        Hpp_d[c] += lam * np.diag(np.maximum(np.diag(Hpp[c]), 1e-12))
    Hll_inv = np.zeros_like(Hll)
    for l in range(L):
        Hll_inv[l] = np.linalg.inv(Hll[l] + lam * np.diag(np.maximum(np.diag(Hll[l]), 1e-12)))
    WHinv = np.einsum("clij,ljk->clik", W, Hll_inv, optimize=True)
    S = -np.einsum("clik,elmk->ciem", WHinv, W, optimize=True)
    for c in range(C):
        S[c, :, c, :] += Hpp_d[c]
    b = -(gp - np.einsum("clik,lk->ci", WHinv, gl, optimize=True))
    free = ~fixed_mask
    S *= free[:, None, None, None] * free[None, None, :, None]
    for c in np.nonzero(fixed_mask)[0]:
        S[c, :, c, :] += np.eye(6)
    b *= free[:, None]
    dp = np.linalg.solve(S.reshape(C * 6, C * 6), b.reshape(-1)).reshape(C, 6)
    dl = np.einsum("lij,lj->li", Hll_inv, -gl - np.einsum("clik,ci->lk", W, dp, optimize=True))
    return dp, dl


def bench_undistort(n=8_388_608):
    """st1 path: batched analytic-Newton undistortion, pixels/s."""
    from slam_tricks_tpu.residuals import camera

    rng = np.random.default_rng(3)
    intr = camera.Intrinsics(*[jnp.float32(v) for v in (458.654, 457.296, 367.215, 248.375)])
    dist = camera.DistCoeffs(*[jnp.float32(v) for v in
                               (-0.28340811, 0.07395907, 0.0, 0.00019359, 1.76187114e-05)])
    px = jnp.asarray(rng.uniform([50, 50], [700, 430], (n, 2)).astype(np.float32))
    dist_px = jax.jit(lambda p: camera.distort_pixels(intr, dist, p))(px)
    f = jax.jit(lambda p: camera.undistort_points_fast(intr, dist, p))
    out = f(dist_px); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(dist_px); jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    err = float(jnp.max(jnp.abs(out - px)))
    return n / dt, err


def bench_batched_pnp(batch=8192, n_obs=32, iters=10):
    """st17 path: batched analytic-Jacobian PnP GN (solvers/pnp.py) — the
    direct analog of the reference's hand-rolled SelfGaussNewton
    (0.0192 ms / 7 iters single-problem, BASELINE.md)."""
    from slam_tricks_tpu.manifolds import se3
    from slam_tricks_tpu.solvers.pnp import solve_pnp_batched

    rng = np.random.default_rng(4)
    pts = jnp.asarray(rng.uniform([-2, -2, 4], [2, 2, 8], (batch, n_obs, 3)).astype(np.float32))
    xi_true = jnp.asarray((rng.normal(size=(batch, 6)) * 0.2).astype(np.float32))
    T_true = jax.vmap(se3.exp)(xi_true)
    p_cam = jax.vmap(se3.act)(T_true, pts)
    uv = p_cam[..., :2] / p_cam[..., 2:]
    xi0 = jnp.asarray((rng.normal(size=(batch, 6)) * 0.05).astype(np.float32))
    T0 = jax.vmap(lambda T, d: se3.retract(T, d))(T_true, xi0)

    solve = jax.jit(solve_pnp_batched)
    out = solve(T0, pts, uv); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = solve(T0, pts, uv); jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    max_cost = float(jnp.max(out.cost))
    return batch * iters / dt, batch / dt, max_cost


def main():
    # NLLS normal equations need true-f32 contractions on the MXU (see
    # solvers/common.py) — also covers XLA's internal cholesky blocks.
    jax.config.update("jax_default_matmul_precision", "highest")
    # persistent compile cache: tunnel compile times vary 10s..10min+ for the
    # same graph; a warm cache makes the bench wall time deterministic
    import os
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    from slam_tricks_tpu.sim import make_scene, perturb_scene
    from slam_tricks_tpu.solvers import schur

    dtype = np.float32
    # production-scale cube-room scene (same st20 semantics, denser):
    # 96 cams x 2400 landmarks x ~83k observations
    scene = make_scene(n_per_wall=400, n_cams=96, seed=0, dtype=dtype)
    poses0, points0, fixed = perturb_scene(scene, seed=1)
    obs = scene.obs
    n_obs = int(np.sum(np.asarray(obs.weight) > 0))

    max_iters = 20
    solve = jax.jit(schur.solve_ba, static_argnames=("max_iters",))
    out = solve(poses0, points0, obs, fixed_mask=fixed, max_iters=max_iters)
    jax.block_until_ready(out)
    # steady-state timing
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = solve(poses0, points0, obs, fixed_mask=fixed, max_iters=max_iters)
        jax.block_until_ready(out)
    t1 = time.perf_counter()
    iters = int(out.it)
    iters_per_s = reps * iters / (t1 - t0)

    # single-core numpy baseline: time one identical LM iteration
    pr = np.asarray(poses0.R, np.float64)
    pt = np.asarray(poses0.t, np.float64)
    pts = np.asarray(points0, np.float64)
    ci = np.asarray(obs.cam_idx)
    li = np.asarray(obs.lm_idx)
    uvn = np.asarray(obs.uv, np.float64)
    wn = np.asarray(obs.weight, np.float64)
    fm = np.asarray(fixed)
    t0 = time.perf_counter()
    numpy_ba_iteration(pr, pt, pts, ci, li, uvn, wn, 1e-4, fm)
    t1 = time.perf_counter()
    baseline_iters_per_s = 1.0 / (t1 - t0)

    undist_px_per_s, undist_err = bench_undistort()
    pnp_iters_per_s, pnp_solves_per_s, pnp_max_cost = bench_batched_pnp()

    print(json.dumps({
        "metric": "ba_lm_iters_per_s",
        "value": round(iters_per_s, 2),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_s / baseline_iters_per_s, 2),
        "detail": {
            "n_cams": scene.n_cams, "n_points": scene.n_points, "n_obs": n_obs,
            "final_cost": float(out.cost), "lm_iters": iters,
            "numpy_singlecore_iters_per_s": round(baseline_iters_per_s, 2),
            "undistort_px_per_s": round(undist_px_per_s),
            "undistort_max_err_px": undist_err,
            "pnp_batched_gn_iters_per_s": round(pnp_iters_per_s),
            "pnp_solves_per_s": round(pnp_solves_per_s),
            "pnp_batch_max_cost": pnp_max_cost,
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
