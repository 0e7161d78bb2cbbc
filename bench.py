"""Headline benchmark: LM iterations/s of the Schur-complement BA solver on the
production-scale st20 cube-room problem (96 cams, 2400 landmarks, ~83k
observations), plus per-stage breakdown, an honest single-core baseline, and a
large-scale (C=1024) dense-vs-PCG entry.

Prints ONE JSON line:
  {"metric": "ba_lm_iters_per_s", "value": N, "unit": "iters/s",
   "vs_baseline": R, "detail": {...}}

vs_baseline compares against bench_baseline.py: a single-core numpy
implementation of the IDENTICAL Schur LM loop (same linearization, same paired
off-diagonal assembly a sparse CPU solver performs, same Nielsen trust-region
law) timed over >= 5 iterations with a reported run-to-run spread — the honest
stand-in for single-core Ceres SPARSE_SCHUR (reference
st20-g2o/src/include/test_ceres.h:143-148; the repo publishes no BA timing,
BASELINE.md). Baseline target: >= 5x.
"""

import json
import os
import time

import numpy as np


def _timeit(f, *args, reps=3):
    import jax

    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


SMOKE = bool(int(os.environ.get("SLAM_BENCH_SMOKE", "0")))


def bench_ba(detail):
    """Headline: flat-layout Schur LM at the 96-cam bench scale."""
    import jax
    import jax.numpy as jnp

    from slam_tricks_tpu.ops import pallas_ba
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
        # tile=256: Mosaic compile time scales superlinearly with the obs tile
        # (256 -> 56 s, 512 -> 175 s, 1024 -> >10 min); 256 is also the
        # measured fastest at this scale
        obs_h, meta = pallas_ba.build_pallas_ba_args(scene.obs, L, tile=256)
        work_h = schur_flat.build_flat_work(obs_h, C, L, dtype=dtype)
    dev = jax.devices()[0]
    poses0, points0, fixed, obs_s, work, bases = jax.device_put(
        (poses0_h, points0_h, fixed_h, obs_h, work_h, meta["bases"]), dev)
    meta["bases"] = bases
    n_obs = int(np.sum(np.asarray(obs_s.weight) > 0))
    K = work.table.obs_idx.shape[1]
    max_iters = 20

    solve = jax.jit(schur_flat.solve_ba_flat, static_argnames=("max_iters",))
    dt_xla, out = _timeit(lambda: solve(poses0, points0, obs_s, work,
                                        fixed_mask=fixed, max_iters=max_iters))
    iters = int(out.it)
    chol_be = "pallas_interpret" if SMOKE else "pallas"
    variants = {
        "pallas-linasm": lambda p, x, o, w, f: schur_flat.solve_ba_flat(
            p, x, o, w, fixed_mask=f, max_iters=max_iters, pallas_meta=meta,
            pallas_interpret=SMOKE),
        "pallas-chol": lambda p, x, o, w, f: schur_flat.solve_ba_flat(
            p, x, o, w, fixed_mask=f, max_iters=max_iters,
            chol_backend=chol_be),
        "pallas-full": lambda p, x, o, w, f: schur_flat.solve_ba_flat(
            p, x, o, w, fixed_mask=f, max_iters=max_iters, pallas_meta=meta,
            pallas_interpret=SMOKE, chol_backend=chol_be),
    }
    results = {"xla-flat": (dt_xla, out)}
    for name, fn in variants.items():
        try:
            jfn = jax.jit(fn)
            results[name] = _timeit(
                lambda: jfn(poses0, points0, obs_s, work, fixed))
        except Exception as e:  # record, never lose the headline to a kernel bug
            detail[f"{name}_error"] = f"{type(e).__name__}: {str(e)[:200]}"

    # fastest path is the headline
    which = min(results, key=lambda k: results[k][0])
    best_dt, best = results[which]
    iters_per_s = int(best.it) / best_dt
    detail["variant_iters_per_s"] = {
        k: round(int(v[1].it) / v[0], 2) for k, v in results.items()}

    # ---- per-stage breakdown (amortized K-loop inside one jit: the tunnel
    # adds ~25-70 ms per dispatch) ----
    AMORT = 32

    def loop_jit(stage_fn):
        def run(x):
            def body(i, acc):
                return acc + stage_fn(i)
            return jax.lax.fori_loop(0, AMORT, body, jnp.asarray(0.0, dtype))
        return jax.jit(run)

    def stage_lin(i):
        o = schur_flat._iteration_quantities(poses0, points0 + 0.0 * i, obs_s,
                                             work, C, L)
        return o[1][0, 0]

    def stage_lin_pal(i):
        o = pallas_ba.linearize_assemble(
            poses0.R.reshape(C, 9), poses0.t, points0 + 0.0 * i, obs_s,
            meta["bases"], n_cams=C, n_points=L, tile=meta["tile"],
            w_win=meta["w_win"], L_pad=meta["L_pad"], interpret=SMOKE)
        return o[1][0, 0]

    Hf, gpf, Hlf, glf, Wf, _ = schur_flat._iteration_quantities(
        poses0, points0, obs_s, work, C, L)
    lam = jnp.asarray(1e-4, dtype)

    def stage_solve(i):
        dp, _, _, _ = schur_flat._solve_flat(Hf, gpf + 0.0 * i, Hlf, glf, Wf,
                                             lam, fixed, work, C, L)
        return dp[0, 0]

    def stage_solve_pal(i):
        dp, _, _, _ = schur_flat._solve_flat(Hf, gpf + 0.0 * i, Hlf, glf, Wf,
                                             lam, fixed, work, C, L,
                                             chol_backend=chol_be)
        return dp[0, 0]

    def stage_cost(i):
        return schur_flat._cost_flat(poses0.R.reshape(C, 9), poses0.t,
                                     points0 + 0.0 * i, obs_s.cam_idx,
                                     obs_s.lm_idx, obs_s.uv, obs_s.weight)

    stages = {}
    for name, fn in (("linearize_assemble_ms", stage_lin),
                     ("linearize_assemble_pallas_ms", stage_lin_pal),
                     ("schur_solve_ms", stage_solve),
                     ("schur_solve_pallas_chol_ms", stage_solve_pal),
                     ("cost_eval_ms", stage_cost)):
        try:
            dt, _ = _timeit(loop_jit(fn), jnp.zeros((), dtype))
            stages[name] = round(dt * 1e3 / AMORT, 4)
        except Exception as e:
            stages[name] = f"FAILED: {type(e).__name__}"

    # ---- useful-FLOP estimate and achieved rate ----
    N = obs_s.cam_idx.shape[0]
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
    it_ms = best_dt * 1e3 / max(int(best.it), 1)
    achieved_tflops = flops / (it_ms * 1e-3) / 1e12
    # v5e litepod chip peak: 197 TFLOP/s bf16; HIGHEST-precision f32 matmuls
    # run 6 bf16 passes -> ~32.8 TFLOP/s effective ceiling for this workload
    peak_tflops = 197.0 / 6.0
    detail.update({
        "n_cams": C, "n_points": L, "n_obs": n_obs,
        "final_cost": float(best.cost), "lm_iters": int(best.it),
        "ms_per_iter": round(it_ms, 3),
        "headline_path": which,
        "xla_flat_iters_per_s": round(iters / dt_xla, 2),
        "stages": stages,
        "flops_per_iter": flops,
        "achieved_tflops": round(achieved_tflops, 3),
        "mfu_vs_f32_highest_peak": round(achieved_tflops / peak_tflops, 4),
    })
    return iters_per_s, scene, poses0_h, points0_h, fixed_h


def bench_baseline_cpu(scene, poses0, points0, fixed, detail):
    """Single-core numpy/scipy LM baseline, >= 5 iterations, 2 runs."""
    from bench_baseline import time_baseline

    obs = scene.obs
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


def bench_large_scale(detail):
    """C=1024 / L=2e5 trajectory problem: exact-dense flat vs scatter-free
    block-tridiagonal PCG (SURVEY §7 step 5 'PCG for larger pose counts')."""
    import jax
    import jax.numpy as jnp

    from slam_tricks_tpu.sim import make_trajectory_scene, perturb_scene
    from slam_tricks_tpu.solvers import schur_flat
    from slam_tricks_tpu.solvers.pcg_flat import build_pcg_work

    from slam_tricks_tpu.solvers import schur

    dtype = np.float32
    # host-side builds on the CPU backend, one device_put (see bench_ba)
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
        work = schur_flat.build_flat_work(scene.obs, C, L, dtype=dtype)
        pcgw = build_pcg_work(scene.obs, C, dtype=dtype)
        pairs = schur.build_track_pairs(scene.obs.cam_idx, scene.obs.lm_idx,
                                        dtype=dtype)
    poses0, points0, fixed, obs, work, pcgw, pairs = jax.device_put(
        (poses0, points0, fixed, scene.obs, work, pcgw, pairs),
        jax.devices()[0])
    mi = 5

    solve_pcg = jax.jit(lambda p, x, f: schur_flat.solve_ba_flat(
        p, x, obs, work, fixed_mask=f, max_iters=mi,
        linear="pcg", pcg_work=pcgw, cg_iters=50, cg_tol=1e-6))
    dt_pcg, out_pcg = _timeit(lambda: solve_pcg(poses0, points0, fixed), reps=2)

    # exact dense flat at C=1024: B is (3L, 6C) — infeasible (>10 GB); the
    # honest dense comparator here is the paired-scan path of solvers/schur
    solve_dense = jax.jit(lambda p, x, f: schur.solve_ba(
        p, x, obs, fixed_mask=f, max_iters=mi, linear_solver="paired",
        track_pairs=pairs))
    dt_dense, out_dense = _timeit(lambda: solve_dense(poses0, points0, fixed),
                                  reps=1)

    detail["large_scale"] = {
        "n_cams": C, "n_points": L,
        "n_obs": int(np.sum(np.asarray(scene.obs.weight) > 0)),
        "pcg_ms_per_iter": round(dt_pcg * 1e3 / max(int(out_pcg.it), 1), 2),
        "pcg_final_cost": float(out_pcg.cost),
        "paired_dense_ms_per_iter": round(
            dt_dense * 1e3 / max(int(out_dense.it), 1), 2),
        "paired_dense_final_cost": float(out_dense.cost),
    }


def bench_undistort(n=None):
    if n is None:
        n = 65_536 if SMOKE else 8_388_608
    """st1 path: batched analytic-Newton undistortion, pixels/s."""
    import jax
    import jax.numpy as jnp

    from slam_tricks_tpu.residuals import camera

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
    err = float(jnp.max(jnp.abs(out - px)))
    return n / dt, err


def bench_batched_pnp(batch=None, n_obs=32, iters=10):
    if batch is None:
        batch = 256 if SMOKE else 8192
    """st17 path: batched analytic-Jacobian PnP GN — the analog of the
    reference's hand-rolled SelfGaussNewton (0.0192 ms / 7 iters
    single-problem, BASELINE.md)."""
    import jax
    import jax.numpy as jnp

    from slam_tricks_tpu.manifolds import se3
    from slam_tricks_tpu.solvers.pnp import solve_pnp_batched

    rng = np.random.default_rng(4)
    pts = jnp.asarray(rng.uniform([-2, -2, 4], [2, 2, 8],
                                  (batch, n_obs, 3)).astype(np.float32))
    xi_true = jnp.asarray((rng.normal(size=(batch, 6)) * 0.2).astype(np.float32))
    T_true = jax.vmap(se3.exp)(xi_true)
    p_cam = jax.vmap(se3.act)(T_true, pts)
    uv = p_cam[..., :2] / p_cam[..., 2:]
    xi0 = jnp.asarray((rng.normal(size=(batch, 6)) * 0.05).astype(np.float32))
    T0 = jax.vmap(lambda T, d: se3.retract(T, d))(T_true, xi0)

    solve = jax.jit(solve_pnp_batched)
    dt, out = _timeit(solve, T0, pts, uv, reps=2)
    return batch * iters / dt, batch / dt, float(jnp.max(out.cost))


def main():
    import jax

    if SMOKE:
        # CI smoke runs on CPU; the axon sitecustomize overrides the
        # JAX_PLATFORMS env var, so force it through the config API
        jax.config.update("jax_platforms", "cpu")
    # NLLS normal equations need true-f32 contractions on the MXU (see
    # solvers/common.py) — also covers XLA's internal cholesky blocks.
    jax.config.update("jax_default_matmul_precision", "highest")
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    detail = {"backend": jax.default_backend()}
    iters_per_s, scene, poses0, points0, fixed = bench_ba(detail)
    baseline_ips = bench_baseline_cpu(scene, poses0, points0, fixed, detail)
    bench_large_scale(detail)
    undist_px_per_s, undist_err = bench_undistort()
    pnp_ips, pnp_sps, pnp_cost = bench_batched_pnp()
    detail.update({
        "undistort_px_per_s": round(undist_px_per_s),
        "undistort_max_err_px": undist_err,
        "pnp_batched_gn_iters_per_s": round(pnp_ips),
        "pnp_solves_per_s": round(pnp_sps),
        "pnp_batch_max_cost": pnp_cost,
    })
    print(json.dumps({
        "metric": "ba_lm_iters_per_s",
        "value": round(iters_per_s, 2),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_s / baseline_ips, 2),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
