"""Measure the slot-major banded-direct solver at C=1024/N=1.6M on the chip."""

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
from slam_tricks_tpu.solvers import banded_flat

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
    bw = banded_flat.build_banded_work(scene.obs, C, NPTS, dtype=dtype)
print(f"host build {time.time()-t0:.1f}s  K={bw.weight.shape[0]} "
      f"Lpad={bw.weight.shape[1]} LB={bw.onehot.shape[0]}", flush=True)
dev = jax.devices()[0]
poses0, points0, fixed, bw = jax.device_put((poses0, points0, fixed, bw), dev)


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


points_s = points0[bw.gather_idx]
quant = jax.jit(lambda p, x: banded_flat._banded_quantities(p, x, bw, C))
dt, (Hb, gpb, Hlb, glb, Wb, cost) = timeit(quant, poses0, points_s)
print(f"banded linearize+assemble: {dt*1e3:.1f} ms  cost={float(cost):.4e}",
      flush=True)

lam = jnp.asarray(1e-4, dtype)
sol = jax.jit(lambda Hb, gpb, Hlb, glb, Wb, lam: banded_flat._solve_banded(
    Hb, gpb, list(Hlb), glb, Wb, lam, fixed, bw, C))
dt, out = timeit(sol, Hb, gpb, list(Hlb), glb, Wb, lam)
print(f"banded exact solve: {dt*1e3:.1f} ms", flush=True)

solve = jax.jit(banded_flat.solve_ba_banded, static_argnames=("max_iters",))
dt, res = timeit(lambda: solve(poses0, points0, bw, fixed_mask=fixed,
                               max_iters=5), reps=2)
print(f"full LM x5: {dt*1e3:.1f} ms  it={int(res.it)} "
      f"cost={float(res.cost):.4e}  ms/iter={dt*1e3/max(int(res.it),1):.1f}",
      flush=True)
