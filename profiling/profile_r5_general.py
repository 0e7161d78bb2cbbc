"""Round-5: general long-span visibility at large C (VERDICT item 2) —
slot-major large-C mode on the cube-room at C=1024, slope-timed."""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
cache_dir = os.environ.get(
    "SLAM_JAX_CACHE", os.path.expanduser("~/.cache/slam_jax_r5"))
jax.config.update("jax_compilation_cache_dir", cache_dir)

from slam_tricks_tpu.sim import make_scene, perturb_scene
from slam_tricks_tpu.solvers import schur_flat_sm

dtype = np.float32
cpu = jax.devices("cpu")[0]
t0 = time.time()
with jax.default_device(cpu):
    scene = make_scene(n_per_wall=1200, n_cams=1024, seed=5, dtype=dtype)
    poses0, points0, fixed = perturb_scene(
        scene, pose_rot_noise=0.002, pose_trans_noise=0.01,
        point_noise=0.01, seed=6)
    C, L = scene.n_cams, scene.n_points
    swork = schur_flat_sm.build_slot_work(scene.obs, C, L, dtype=dtype,
                                         use_onehot=False)
print(f"scene C={C} L={L} K={swork.mask.shape[0]} "
      f"N={int(np.sum(np.asarray(scene.obs.weight) > 0))} "
      f"build {time.time()-t0:.1f}s", flush=True)
dev = jax.devices()[0]
t0 = time.time()
poses0, points0, fixed, swork = jax.device_put(
    (poses0, points0, fixed, swork), dev)
jax.block_until_ready(swork.w)
print(f"transfer {time.time()-t0:.1f}s", flush=True)

solve = jax.jit(schur_flat_sm.solve_ba_flat_sm,
                static_argnames=("max_iters", "s_precision"))


def timeit(f, reps=2):
    out = f()
    jax.block_until_ready(out)
    _ = np.asarray(out.cost)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f()
        jax.block_until_ready(out)
        _ = np.asarray(out.cost)
        best = min(best, time.perf_counter() - t0)
    return best, out


import jax.lax
for mi in (3, 9):
    t0 = time.time()
    dt, out = timeit(lambda mi=mi: solve(poses0, points0, swork,
                                         fixed_mask=fixed, max_iters=mi,
                                         s_precision=jax.lax.Precision.HIGH))
    print(f"mi={mi}: {dt*1e3:.1f} ms, {int(out.it)} iters, "
          f"cost {float(out.cost):.4e} (incl compile {time.time()-t0:.0f}s)",
          flush=True)
    if mi == 3:
        t3, i3 = dt, int(out.it)
    else:
        t9, i9 = dt, int(out.it)
t_it = (t9 - t3) / max(i9 - i3, 1)
print(f"TRUE ms/iter: {t_it*1e3:.2f}", flush=True)
print("DONE", flush=True)
