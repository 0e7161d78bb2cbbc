"""Measure the transposed-table PCG path at C=1024/N=1.6M on the real chip."""

import os
import time

import numpy as np

os.environ.setdefault("SLAM_JAX_CACHE",
                      os.path.expanduser("~/.cache/slam_tricks_tpu"))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", os.environ["SLAM_JAX_CACHE"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from slam_tricks_tpu.sim import make_trajectory_scene, perturb_scene
from slam_tricks_tpu.solvers import schur_flat
from slam_tricks_tpu.solvers.pcg_flat import build_pcg_work, solve_rcs_pcg_flat

dtype = np.float32
C, NPTS, TRACK = 1024, 200_000, 8
cpu = jax.devices("cpu")[0]
t0 = time.time()
with jax.default_device(cpu):
    scene = make_trajectory_scene(n_cams=C, n_points=NPTS, track_len=TRACK,
                                  seed=11, dtype=dtype)
    poses0, points0, fixed = perturb_scene(
        scene, pose_rot_noise=0.002, pose_trans_noise=0.01, point_noise=0.01,
        seed=12)
    work = schur_flat.build_flat_work(scene.obs, C, NPTS, dtype=dtype)
    pcgw = build_pcg_work(scene.obs, C, n_points=NPTS, dtype=dtype)
print(f"host build {time.time()-t0:.1f}s", flush=True)
dev = jax.devices()[0]
poses0, points0, fixed, obs, work, pcgw = jax.device_put(
    (poses0, points0, fixed, scene.obs, work, pcgw), dev)
L = NPTS


def sync(x):
    ls = jax.tree_util.tree_leaves(x)
    s = min(ls, key=lambda a: a.size)
    if s.ndim:
        s = s[(0,) * s.ndim]
    np.asarray(s)


def timeit(f, *args, reps=3):
    out = f(*args)
    sync(out)
    best = float("inf")
    for _ in range(reps):
        t = time.perf_counter()
        out = f(*args)
        sync(out)
        best = min(best, time.perf_counter() - t)
    return best, out


quant = jax.jit(lambda p, x: schur_flat._iteration_quantities(
    p, x, obs, work, C, L))
dt, (Hf, gpf, Hlf, glf, Wf, cost) = timeit(quant, poses0, points0)
print(f"linearize+assemble: {dt*1e3:.1f} ms", flush=True)
lam = jnp.asarray(1e-4, dtype)

for cg in (25, 50, 100):
    sol = jax.jit(lambda Hf, gpf, Hlf, glf, Wf, lam: solve_rcs_pcg_flat(
        Hf, gpf, list(Hlf), glf, Wf, obs.lm_idx, lam, fixed, work, pcgw,
        C, L, cg_iters=cg, cg_tol=1e-6))
    dt, out = timeit(sol, Hf, gpf, list(Hlf), glf, Wf, lam)
    print(f"solve_rcs_pcg_flat ({cg} cg): {dt*1e3:.1f} ms  "
          f"dp[0,0]={float(out[0][0,0]):.3e}", flush=True)

# full 5-iteration LM solve (the bench large_scale entry)
solve = jax.jit(lambda p, x, f: schur_flat.solve_ba_flat(
    p, x, obs, work, fixed_mask=f, max_iters=5, linear="pcg",
    pcg_work=pcgw, cg_iters=50, cg_tol=1e-6))
dt, out = timeit(lambda: solve(poses0, points0, fixed), reps=2)
print(f"full LM x5 (50 cg): {dt*1e3:.1f} ms  it={int(out.it)} "
      f"cost={float(out.cost):.4e}", flush=True)
