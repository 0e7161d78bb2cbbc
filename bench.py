"""Headline benchmark: LM iterations/s of the Schur-complement BA solver on the
production-scale st20 cube-room problem (96 cams, 2400 landmarks, ~83k
observations), plus optional per-stage breakdown, an honest single-core
baseline, a large-scale (C=1024) PCG entry, and Pallas-kernel A/B timings.

Prints ONE JSON line per completed stage (the driver parses the LAST line):
  {"metric": "ba_lm_iters_per_s", "value": N, "unit": "iters/s",
   "vs_baseline": R, "detail": {...}}

Structure (VERDICT r2 item 1): the headline (xla-flat solve) and the CPU
baseline run FIRST and the result line is printed+flushed immediately; every
later stage is optional, wrapped in try/except, and gated on a wall-clock
budget (env SLAM_BENCH_BUDGET_S, default 1000 s) so one slow stage can never
wipe the benchmark again (round 2's artifact was rc=124 with no output).

vs_baseline compares against bench_baseline.py: a single-core numpy
implementation of the IDENTICAL Schur LM loop (same linearization, same paired
off-diagonal assembly a sparse CPU solver performs, same Nielsen trust-region
law) — the honest stand-in for single-core Ceres SPARSE_SCHUR (reference
st20-g2o/src/include/test_ceres.h:143-148; the repo publishes no BA timing,
BASELINE.md). Baseline target: >= 5x. Both sides report best-of-N timing
(ADVICE r2: same statistic on both sides).
"""

import json
import os
import time

import numpy as np

T0 = time.monotonic()
SMOKE = bool(int(os.environ.get("SLAM_BENCH_SMOKE", "0")))
BUDGET = float(os.environ.get("SLAM_BENCH_BUDGET_S",
                              "100000" if SMOKE else "1000"))


def _left():
    return BUDGET - (time.monotonic() - T0)


def _sync(out):
    """Wait for `out` by pulling one small leaf to the host. Through the axon
    relay, block_until_ready can return before the computation finishes
    (observed: a 20-iter BA solve 'timed' at 0.14 ms); a device->host
    transfer of an output leaf cannot lie — the program's outputs materialize
    together."""
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    if leaves:
        small = min(leaves, key=lambda a: getattr(a, "size", 0))
        # transfer ONE element, not the leaf: the index op waits on the full
        # producer buffer, but the host pull is 4 bytes (pulling a big leaf
        # would time the tunnel transfer, ~30 MB/s, not the computation)
        if getattr(small, "ndim", 0):
            small = small[(0,) * small.ndim]
        np.asarray(small)
    return out


def _timeit(f, *args, reps=3):
    """Best-of-N wall time (same statistic as the CPU baseline)."""
    out = f(*args)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def _emit(result):
    print(json.dumps(result), flush=True)


# --------------------------------------------------------------------------
# required stages
# --------------------------------------------------------------------------

def stage_headline(detail):
    """Flat-layout Schur LM at the 96-cam bench scale, xla path only."""
    import jax

    from slam_tricks_tpu.sim import make_scene, perturb_scene
    from slam_tricks_tpu.solvers import schur_flat

    dtype = np.float32
    # Build the scene and every host-side index table on the CPU backend:
    # each np.asarray of a device array is a device->host round trip through
    # the axon relay (measured ~6 min of pure transfer for the C=1024 tables).
    # One explicit device_put afterwards is the only host->device transfer.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        if SMOKE:
            scene = make_scene(n_per_wall=20, n_cams=8, seed=0, dtype=dtype)
        else:
            scene = make_scene(n_per_wall=400, n_cams=96, seed=0, dtype=dtype)
        poses0_h, points0_h, fixed_h = perturb_scene(scene, seed=1)
        C, L = scene.n_cams, scene.n_points
        # track-grid layout: obs row l*K+k = slot k of landmark l, turning
        # every (L,K,.) track gather into a reshape — measured 4.05 vs
        # 4.66 ms/iter against the gather layout (recorded below)
        obs_h = schur_flat.grid_order_obs(scene.obs, L, dtype=dtype)
        work_h = schur_flat.build_flat_work(obs_h, C, L, dtype=dtype,
                                            grid=True)
        work_gather_h = schur_flat.build_flat_work(scene.obs, C, L,
                                                   dtype=dtype)
    dev = jax.devices()[0]
    poses0, points0, fixed, obs, work, obs_ga, work_ga = jax.device_put(
        (poses0_h, points0_h, fixed_h, obs_h, work_h, scene.obs,
         work_gather_h), dev)
    n_obs = int(np.sum(np.asarray(scene.obs.weight) > 0))
    K = work.mask_lk.shape[1]
    max_iters = 20

    solve = jax.jit(schur_flat.solve_ba_flat, static_argnames=("max_iters",))
    dt, out = _timeit(lambda: solve(poses0, points0, obs, work,
                                    fixed_mask=fixed, max_iters=max_iters))
    iters = int(out.it)
    iters_per_s = iters / dt
    it_ms = dt * 1e3 / max(iters, 1)
    dt_ga, out_ga = _timeit(lambda: solve(poses0, points0, obs_ga, work_ga,
                                          fixed_mask=fixed,
                                          max_iters=max_iters))

    # useful-FLOP estimate and achieved rate
    N = obs.cam_idx.shape[0]
    flops = (
        N * 150                      # linearize columns
        + 2 * N * C * 28             # camera one-hot reduction
        + N * (21 + 6 + 9 + 3 + 18) * 4   # block product columns
        + L * K * 9 * 2              # landmark track reduction
        + 2 * L * K * C * 18         # B build one-hot contraction
        + 2 * (3 * L) * (6 * C) ** 2  # S = -B^T B
        + (6 * C) ** 3 // 3          # dense Cholesky of S
        + N * 36 * 4                 # whiten + rhs + backsub products
    )
    achieved_tflops = flops / (it_ms * 1e-3) / 1e12
    # v5e litepod chip peak: 197 TFLOP/s bf16; HIGHEST-precision f32 matmuls
    # run 6 bf16 passes -> ~32.8 TFLOP/s derived ceiling for this workload.
    # VALIDATE it (VERDICT r2 weak item 6): measure the actual ceiling with
    # a large f32-HIGHEST matmul on this chip, this run.
    peak_tflops = 197.0 / 6.0
    import jax.numpy as jnp

    nmm = 1024 if SMOKE else 4096
    reps_mm = 2 if SMOKE else 16     # amortize the ~30 ms tunnel dispatch
    a = jnp.ones((nmm, nmm), np.float32)

    @jax.jit
    def mmf(a):
        def body(i, x):
            y = jax.lax.dot_general(x, a, (((1,), (0,)), ((), ())),
                                    precision=jax.lax.Precision.HIGHEST)
            return y / jnp.maximum(jnp.abs(y[0, 0]), 1.0)
        return jax.lax.fori_loop(0, reps_mm, body, a)

    dt_mm, _ = _timeit(mmf, a)
    measured_peak = reps_mm * 2 * nmm ** 3 / dt_mm / 1e12
    detail.update({
        "n_cams": C, "n_points": L, "n_obs": n_obs,
        "final_cost": float(out.cost), "lm_iters": iters,
        "ms_per_iter": round(it_ms, 3),
        "headline_path": "xla-flat-grid",
        "gather_layout_iters_per_s": round(int(out_ga.it) / dt_ga, 2),
        "flops_per_iter": flops,
        "achieved_tflops": round(achieved_tflops, 3),
        "mfu_vs_f32_highest_peak": round(achieved_tflops / peak_tflops, 4),
        "measured_f32_highest_peak_tflops": round(measured_peak, 2),
        "mfu_vs_measured_peak": round(achieved_tflops
                                      / max(measured_peak, 1e-9), 4),
    })
    ctx = {"scene": scene, "poses0_h": poses0_h, "points0_h": points0_h,
           "fixed_h": fixed_h, "poses0": poses0, "points0": points0,
           "fixed": fixed, "obs": obs, "work": work, "C": C, "L": L,
           "max_iters": max_iters, "dtype": dtype, "dev": dev,
           "xla_iters_per_s": iters_per_s}
    return iters_per_s, ctx


def stage_baseline(ctx, detail):
    """Single-core numpy LM baseline, >= 5 iterations, best-of-2 runs."""
    from bench_baseline import time_baseline

    obs = ctx["scene"].obs
    poses0, points0, fixed = ctx["poses0_h"], ctx["points0_h"], ctx["fixed_h"]
    args = (np.asarray(poses0.R, np.float64), np.asarray(poses0.t, np.float64),
            np.asarray(points0, np.float64), np.asarray(obs.cam_idx),
            np.asarray(obs.lm_idx), np.asarray(obs.uv, np.float64),
            np.asarray(obs.weight, np.float64), np.asarray(fixed))
    ips, spread, cost = time_baseline(*args, iters=5, repeats=2)
    detail.update({
        "baseline_iters_per_s": round(ips, 3),
        "baseline_run_spread": round(spread, 3),
        "baseline_cost_after_5it": cost,
    })
    return ips


# --------------------------------------------------------------------------
# optional stages (each budget-gated and exception-isolated)
# --------------------------------------------------------------------------

def stage_undistort(ctx, detail):
    """st1 path: batched analytic-Newton undistortion, pixels/s."""
    import jax
    import jax.numpy as jnp

    from slam_tricks_tpu.residuals import camera

    n = 65_536 if SMOKE else 8_388_608
    rng = np.random.default_rng(3)
    intr = camera.Intrinsics(*[jnp.float32(v) for v in
                               (458.654, 457.296, 367.215, 248.375)])
    dist = camera.DistCoeffs(*[jnp.float32(v) for v in
                               (-0.28340811, 0.07395907, 0.0, 0.00019359,
                                1.76187114e-05)])
    px = jnp.asarray(rng.uniform([50, 50], [700, 430], (n, 2)).astype(np.float32))
    dist_px = jax.jit(lambda p: camera.distort_pixels(intr, dist, p))(px)
    f = jax.jit(lambda p: camera.undistort_points_fast(intr, dist, p))
    dt, out = _timeit(f, dist_px, reps=2)
    detail.update({
        "undistort_px_per_s": round(n / dt),
        "undistort_max_err_px": float(jnp.max(jnp.abs(out - px))),
    })


def stage_pnp(ctx, detail):
    """st17 path: batched analytic-Jacobian PnP GN — the analog of the
    reference's hand-rolled SelfGaussNewton (0.0192 ms / 7 iters
    single-problem, BASELINE.md)."""
    import jax
    import jax.numpy as jnp

    from slam_tricks_tpu.manifolds import se3
    from slam_tricks_tpu.solvers.pnp import solve_pnp_batched

    batch = 256 if SMOKE else 8192
    n_obs, iters = 32, 10
    rng = np.random.default_rng(4)
    pts = jnp.asarray(rng.uniform([-2, -2, 4], [2, 2, 8],
                                  (batch, n_obs, 3)).astype(np.float32))
    xi_true = jnp.asarray((rng.normal(size=(batch, 6)) * 0.2).astype(np.float32))
    T_true = jax.vmap(se3.exp)(xi_true)
    p_cam = jax.vmap(se3.act)(T_true, pts)
    uv = p_cam[..., :2] / p_cam[..., 2:]
    xi0 = jnp.asarray((rng.normal(size=(batch, 6)) * 0.05).astype(np.float32))
    T0_ = jax.vmap(lambda T, d: se3.retract(T, d))(T_true, xi0)

    solve = jax.jit(solve_pnp_batched)
    dt, out = _timeit(solve, T0_, pts, uv, reps=2)
    detail.update({
        "pnp_batched_gn_iters_per_s": round(batch * iters / dt),
        "pnp_solves_per_s": round(batch / dt),
        "pnp_batch_max_cost": float(jnp.max(out.cost)),
    })


def stage_configs(ctx, detail):
    """The remaining BASELINE.json configs as timed entries: st6 SE(3) ICP,
    st3 Zhang joint refinement, st22 two-view init+refine (st1/st17/st20
    already have their own stages)."""
    import jax
    import jax.numpy as jnp

    from slam_tricks_tpu.manifolds import se3
    from slam_tricks_tpu.pipelines.calibration import calibrate
    from slam_tricks_tpu.pipelines.two_view import solve_two_view
    from slam_tricks_tpu.residuals.icp import icp_iterate
    from slam_tricks_tpu.sim import make_calib_scene, make_two_view

    rng = np.random.default_rng(6)
    out = {}

    # st6: SE(3) ICP, unknown correspondences, NN association each sweep
    n_icp = 512 if SMOKE else 8192
    src = jnp.asarray(rng.normal(size=(n_icp, 3)).astype(np.float32))
    T_true = se3.exp(jnp.asarray([0.08, -0.05, 0.1, 0.15, -0.1, 0.05],
                                 jnp.float32))
    dst = se3.act(T_true, src)
    icp_j = jax.jit(lambda s, d: icp_iterate(s, d, n_outer=10))
    dt, (R_est, t_est, _, _) = _timeit(icp_j, src, dst, reps=2)
    terr = float(jnp.max(jnp.abs(t_est - T_true.t)))
    out["icp_se3_ms"] = round(dt * 1e3, 2)
    out["icp_n_points"] = n_icp
    out["icp_t_err"] = terr

    # st3: Zhang calibration, closed-form init + joint LM refinement
    cs = make_calib_scene(n_views=9, noise=0.3, seed=7, dtype=np.float32)
    dt, res = _timeit(lambda: calibrate(cs.board_pts, cs.image_pts,
                                        max_iters=30), reps=2)
    out["zhang_ms"] = round(dt * 1e3, 2)
    out["zhang_fx_err"] = float(jnp.abs(res.intrinsics.fx - cs.fx))

    # st22: two-view 8-point init + cheirality + triangulation + refinement
    tv = make_two_view(n_points=100 if SMOKE else 2000, noise=1e-3, seed=8,
                       dtype=np.float32)
    tv_j = jax.jit(lambda a, b: solve_two_view(a, b, refine_iters=15))
    dt, r = _timeit(tv_j, tv.uv1, tv.uv2, reps=2)
    out["two_view_ms"] = round(dt * 1e3, 2)
    out["two_view_final_cost"] = float(r.final_cost)
    detail["configs"] = out


def stage_breakdown(ctx, detail):
    """Per-stage ms of the xla flat iteration (amortized K-loop inside one
    jit: the tunnel adds ~25-70 ms per dispatch)."""
    import jax
    import jax.numpy as jnp

    from slam_tricks_tpu.solvers import schur_flat

    poses0, points0, obs, work = (ctx["poses0"], ctx["points0"], ctx["obs"],
                                  ctx["work"])
    C, L, dtype, fixed = ctx["C"], ctx["L"], ctx["dtype"], ctx["fixed"]
    AMORT = 32

    def loop_jit(stage_fn):
        def run(x):
            def body(i, acc):
                return acc + stage_fn(i)
            return jax.lax.fori_loop(0, AMORT, body, jnp.asarray(0.0, dtype))
        return jax.jit(run)

    def stage_lin(i):
        o = schur_flat._iteration_quantities(poses0, points0 + 0.0 * i, obs,
                                             work, C, L)
        return o[1][0, 0]

    Hf, gpf, Hlf, glf, Wf, _ = schur_flat._iteration_quantities(
        poses0, points0, obs, work, C, L)
    lam = jnp.asarray(1e-4, dtype)

    def stage_solve(i):
        dp, _, _, _ = schur_flat._solve_flat(Hf, gpf + 0.0 * i, Hlf, glf, Wf,
                                             lam, fixed, work, C, L)
        return dp[0, 0]

    def stage_cost(i):
        return schur_flat._cost_flat(poses0.R.reshape(C, 9), poses0.t,
                                     points0 + 0.0 * i, obs.cam_idx,
                                     obs.lm_idx, obs.uv, obs.weight)

    stages = detail.setdefault("stages", {})
    for name, fn in (("linearize_assemble_ms", stage_lin),
                     ("schur_solve_ms", stage_solve),
                     ("cost_eval_ms", stage_cost)):
        dt, _ = _timeit(loop_jit(fn), jnp.zeros((), dtype))
        stages[name] = round(dt * 1e3 / AMORT, 4)
    # stash for the pallas A/B stage
    ctx["flat_blocks"] = (Hf, gpf, Hlf, glf, Wf)


def stage_large_scale(ctx, detail):
    """C=1024 / L=2e5 trajectory problem, slot-major banded-direct solver
    (solvers/banded_flat): exact linear solves, zero large gathers —
    measured 23.9 ms/LM-iter vs 2465 ms for the O(N)-memory dense
    comparator (SURVEY §7 step 5 'larger pose counts')."""
    import jax

    from slam_tricks_tpu.sim import make_trajectory_scene, perturb_scene
    from slam_tricks_tpu.solvers import banded_flat

    dtype = np.float32
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        if SMOKE:
            scene = make_trajectory_scene(n_cams=32, n_points=500, track_len=6,
                                          seed=11, dtype=dtype)
        else:
            scene = make_trajectory_scene(n_cams=1024, n_points=200_000,
                                          track_len=8, seed=11, dtype=dtype)
        poses0, points0, fixed = perturb_scene(
            scene, pose_rot_noise=0.002, pose_trans_noise=0.01,
            point_noise=0.01, seed=12)
        C, L = scene.n_cams, scene.n_points
        bwork = banded_flat.build_banded_work(scene.obs, C, L, dtype=dtype)
    poses0, points0, fixed, bwork = jax.device_put(
        (poses0, points0, fixed, bwork), ctx["dev"])
    # 12 iterations amortize the ~25-70 ms tunnel dispatch (at 5 iters the
    # per-iter number swung 22-41 ms across runs from dispatch jitter alone)
    mi = 12

    solve = jax.jit(banded_flat.solve_ba_banded,
                    static_argnames=("max_iters",))
    dt, out = _timeit(lambda: solve(poses0, points0, bwork, fixed_mask=fixed,
                                    max_iters=mi), reps=2)

    detail["large_scale"] = {
        "n_cams": C, "n_points": L,
        "n_obs": int(np.sum(np.asarray(scene.obs.weight) > 0)),
        "banded_ms_per_iter": round(dt * 1e3 / max(int(out.it), 1), 2),
        "banded_final_cost": float(out.cost),
        "banded_lm_iters": int(out.it),
    }
    obs_d = jax.device_put(scene.obs, ctx["dev"])
    ctx["large"] = {"scene": scene, "C": C, "L": L, "poses0": poses0,
                    "points0": points0, "fixed": fixed, "obs": obs_d}


def stage_large_pcg(ctx, detail):
    """General-structure (non-banded) large-C comparator: scatter-free
    block-tridiagonal-preconditioned PCG on the same problem."""
    import jax

    from slam_tricks_tpu.sim import make_trajectory_scene, perturb_scene
    from slam_tricks_tpu.solvers import schur_flat
    from slam_tricks_tpu.solvers.pcg_flat import build_pcg_work

    lg = ctx.get("large")
    if lg is None:
        return
    scene = lg["scene"]
    dtype = np.float32
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        poses0, points0, fixed = perturb_scene(
            scene, pose_rot_noise=0.002, pose_trans_noise=0.01,
            point_noise=0.01, seed=12)
        C, L = scene.n_cams, scene.n_points
        work = schur_flat.build_flat_work(scene.obs, C, L, dtype=dtype)
        pcgw = build_pcg_work(scene.obs, C, dtype=dtype)
    poses0, points0, fixed, obs, work, pcgw = jax.device_put(
        (poses0, points0, fixed, scene.obs, work, pcgw), ctx["dev"])
    mi = 5
    solve_pcg = jax.jit(lambda p, x, f: schur_flat.solve_ba_flat(
        p, x, obs, work, fixed_mask=f, max_iters=mi,
        linear="pcg", pcg_work=pcgw, cg_iters=50, cg_tol=1e-6))
    dt_pcg, out_pcg = _timeit(lambda: solve_pcg(poses0, points0, fixed),
                              reps=2)
    detail["large_scale"].update({
        "pcg_ms_per_iter": round(dt_pcg * 1e3 / max(int(out_pcg.it), 1), 2),
        "pcg_final_cost": float(out_pcg.cost),
    })


def stage_large_dense_comparator(ctx, detail):
    """Exact paired-scan dense comparator at C=1024 — O((6C)^3) replicated
    factorization; only run when budget allows (it jit-compiles two giant
    programs and solves a (6144,6144) system)."""
    import jax

    from slam_tricks_tpu.solvers import schur

    lg = ctx.get("large")
    if lg is None or "obs" not in lg:
        return
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        pairs = schur.build_track_pairs(lg["scene"].obs.cam_idx,
                                        lg["scene"].obs.lm_idx,
                                        dtype=np.float32)
    pairs = jax.device_put(pairs, ctx["dev"])
    solve_dense = jax.jit(lambda p, x, f: schur.solve_ba(
        p, x, lg["obs"], fixed_mask=f, max_iters=5, linear_solver="paired",
        track_pairs=pairs))
    dt, out = _timeit(
        lambda: solve_dense(lg["poses0"], lg["points0"], lg["fixed"]), reps=1)
    detail["large_scale"].update({
        "paired_dense_ms_per_iter": round(dt * 1e3 / max(int(out.it), 1), 2),
        "paired_dense_final_cost": float(out.cost),
    })


def stage_tridiag_ab(ctx, detail):
    """Three-way A/B of the banded linear solver at the production shape
    (G,m)=(128,48): batched cyclic reduction (XLA, default) vs the fused
    Pallas kernel vs the sequential XLA scan (VERDICT r2 item 3 — the
    recorded kernel-vs-XLA table)."""
    import jax
    import jax.numpy as jnp

    from slam_tricks_tpu.ops.pallas_tridiag import tridiag_solve
    from slam_tricks_tpu.solvers.banded_flat import (
        block_tridiag_solve_cr, block_tridiag_solve_scan)

    dtype = np.float32
    G, m = (16, 24) if SMOKE else (128, 48)
    rng = np.random.default_rng(0)
    Gm = rng.normal(size=(G, m, m + 8))
    D = jnp.asarray((Gm @ Gm.transpose(0, 2, 1)
                     + 8 * np.eye(m)[None]).astype(dtype))
    E = jnp.asarray((0.3 * rng.normal(size=(G - 1, m, m))).astype(dtype))
    r = jnp.asarray(rng.normal(size=(G, m)).astype(dtype))
    AMORT = 16

    def loop(f):
        @jax.jit
        def run(z, D, E, r):
            def body(i, acc):
                return acc + f(D, E + 0.0 * i, r)[1, 0]
            return jax.lax.fori_loop(0, AMORT, body, z)
        return run

    out = {}
    variants = [("cr", block_tridiag_solve_cr),
                ("xla_scan", block_tridiag_solve_scan)]
    if not SMOKE:   # Mosaic compile; interpret mode is covered by tests
        variants.insert(1, ("pallas", lambda D, E, r: tridiag_solve(D, E, r)))
    for name, f in variants:
        g = loop(f)
        dt, _ = _timeit(lambda: g(jnp.zeros((), dtype), D, E, r))
        out[f"{name}_ms"] = round(dt * 1e3 / AMORT, 3)
    detail["tridiag_solver_ab"] = out


def stage_pallas(ctx, detail):
    """Pallas kernel A/B vs the XLA flat path (VERDICT r2 item 3): full-solve
    variant timings + isolated kernel stage timings. Mosaic compiles are slow
    (~56 s at tile=256), hence last and budget-gated."""
    import jax
    import jax.numpy as jnp

    from slam_tricks_tpu.ops import pallas_ba
    from slam_tricks_tpu.solvers import schur_flat

    C, L, dtype, fixed = ctx["C"], ctx["L"], ctx["dtype"], ctx["fixed"]
    max_iters = ctx["max_iters"]
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        # tile=256: Mosaic compile time scales superlinearly with the obs tile
        # (256 -> 56 s, 512 -> 175 s, 1024 -> >10 min); 256 is also the
        # measured fastest at this scale
        obs_h, meta = pallas_ba.build_pallas_ba_args(ctx["scene"].obs, L,
                                                     tile=256)
        work_h = schur_flat.build_flat_work(obs_h, C, L, dtype=dtype)
    obs_s, work_s, bases = jax.device_put(
        (obs_h, work_h, meta["bases"]), ctx["dev"])
    meta["bases"] = bases
    poses0, points0 = ctx["poses0"], ctx["points0"]
    chol_be = "pallas_interpret" if SMOKE else "pallas"

    variants = {
        "pallas-linasm": lambda: schur_flat.solve_ba_flat(
            poses0, points0, obs_s, work_s, fixed_mask=fixed,
            max_iters=max_iters, pallas_meta=meta, pallas_interpret=SMOKE),
        "pallas-chol": lambda: schur_flat.solve_ba_flat(
            poses0, points0, ctx["obs"], ctx["work"], fixed_mask=fixed,
            max_iters=max_iters, chol_backend=chol_be),
    }
    vres = detail.setdefault("variant_iters_per_s",
                             {"xla-flat-grid": round(ctx["xla_iters_per_s"],
                                                     2)})
    for name, fn in variants.items():
        if _left() < (0 if SMOKE else 120):
            detail.setdefault("skipped", []).append(name)
            continue
        try:
            jfn = jax.jit(fn)
            dt, out = _timeit(lambda: jfn())
            vres[name] = round(int(out.it) / dt, 2)
        except Exception as e:  # never lose the run to a kernel bug
            detail[f"{name}_error"] = f"{type(e).__name__}: {str(e)[:200]}"

    # isolated kernel stage timings (amortized loop, as stage_breakdown)
    if _left() < (0 if SMOKE else 120):
        return
    AMORT = 32
    stages = detail.setdefault("stages", {})

    def loop_jit(stage_fn):
        def run(x):
            def body(i, acc):
                return acc + stage_fn(i)
            return jax.lax.fori_loop(0, AMORT, body, jnp.asarray(0.0, dtype))
        return jax.jit(run)

    def stage_lin_pal(i):
        o = pallas_ba.linearize_assemble(
            poses0.R.reshape(C, 9), poses0.t, points0 + 0.0 * i, obs_s,
            meta["bases"], n_cams=C, n_points=L, tile=meta["tile"],
            w_win=meta["w_win"], L_pad=meta["L_pad"], interpret=SMOKE)
        return o[1][0, 0]

    try:
        dt, _ = _timeit(loop_jit(stage_lin_pal), jnp.zeros((), dtype))
        stages["linearize_assemble_pallas_ms"] = round(dt * 1e3 / AMORT, 4)
    except Exception as e:
        stages["linearize_assemble_pallas_ms"] = f"FAILED: {type(e).__name__}"

    blocks = ctx.get("flat_blocks")
    if blocks is not None:
        Hf, gpf, Hlf, glf, Wf = blocks
        lam = jnp.asarray(1e-4, dtype)

        def stage_solve_pal(i):
            dp, _, _, _ = schur_flat._solve_flat(
                Hf, gpf + 0.0 * i, Hlf, glf, Wf, lam, fixed, ctx["work"], C, L,
                chol_backend=chol_be)
            return dp[0, 0]

        try:
            dt, _ = _timeit(loop_jit(stage_solve_pal), jnp.zeros((), dtype))
            stages["schur_solve_pallas_chol_ms"] = round(dt * 1e3 / AMORT, 4)
        except Exception as e:
            stages["schur_solve_pallas_chol_ms"] = (
                f"FAILED: {type(e).__name__}")


# --------------------------------------------------------------------------

def main():
    import jax

    if SMOKE:
        # CI smoke runs on CPU; the axon sitecustomize overrides the
        # JAX_PLATFORMS env var, so force it through the config API
        jax.config.update("jax_platforms", "cpu")
    # NLLS normal equations need true-f32 contractions on the MXU (see
    # solvers/common.py) — also covers XLA's internal cholesky blocks.
    jax.config.update("jax_default_matmul_precision", "highest")
    # machine-local compile cache OUTSIDE the repo (the committed in-repo
    # cache was machine-specific and failed to load elsewhere — VERDICT r2)
    cache_dir = os.environ.get(
        "SLAM_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "slam_tricks_tpu"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    # only persist expensive compiles: tiny XLA:CPU host-build programs AOT-
    # load unreliably across processes (machine-feature mismatch noise)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    detail = {"backend": jax.default_backend()}
    result = {"metric": "ba_lm_iters_per_s", "value": 0.0, "unit": "iters/s",
              "vs_baseline": None, "detail": detail}

    # required: headline + baseline, then flush the first result line
    iters_per_s, ctx = stage_headline(detail)
    result["value"] = round(iters_per_s, 2)
    try:
        baseline_ips = stage_baseline(ctx, detail)
        result["vs_baseline"] = round(iters_per_s / baseline_ips, 2)
    except Exception as e:
        detail["baseline_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    _emit(result)

    # optional stages: (name, fn, min-budget-seconds to even start)
    # ordered by value-per-second: the banded large-scale number and its
    # honest dense comparator land before the slower historical comparators
    optional = [
        ("undistort", lambda: stage_undistort(ctx, detail), 60),
        ("pnp", lambda: stage_pnp(ctx, detail), 60),
        ("configs", lambda: stage_configs(ctx, detail), 90),
        ("large_scale", lambda: stage_large_scale(ctx, detail), 180),
        ("large_dense_comparator",
         lambda: stage_large_dense_comparator(ctx, detail), 180),
        ("tridiag_ab", lambda: stage_tridiag_ab(ctx, detail), 120),
        ("breakdown", lambda: stage_breakdown(ctx, detail), 60),
        ("large_pcg", lambda: stage_large_pcg(ctx, detail), 240),
        ("pallas", lambda: stage_pallas(ctx, detail), 150),
    ]
    for name, fn, min_budget in optional:
        if not SMOKE and _left() < min_budget:
            detail.setdefault("skipped", []).append(name)
            continue
        try:
            fn()
        except Exception as e:
            detail[f"{name}_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        _emit(result)
    detail["bench_wall_s"] = round(time.monotonic() - T0, 1)
    _emit(result)


if __name__ == "__main__":
    main()
