"""Round-5: slope-timed A/B of the slot-major headline path (schur_flat_sm)
vs the l-major grid path (schur_flat) at bench scale on the real chip."""
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
from slam_tricks_tpu.solvers import schur_flat, schur_flat_sm

dtype = np.float32
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    scene = make_scene(n_per_wall=400, n_cams=96, seed=0, dtype=dtype)
    poses0_h, points0_h, fixed_h = perturb_scene(scene, seed=1)
    C, L = scene.n_cams, scene.n_points
    obs_h = schur_flat.grid_order_obs(scene.obs, L, dtype=dtype)
    work_h = schur_flat.build_flat_work(obs_h, C, L, dtype=dtype, grid=True)
    swork_h = schur_flat_sm.build_slot_work(scene.obs, C, L, dtype=dtype)
dev = jax.devices()[0]
poses0, points0, fixed, obs, work, swork = jax.device_put(
    (poses0_h, points0_h, fixed_h, obs_h, work_h, swork_h), dev)
print(f"scene C={C} L={L} K={swork.mask.shape[0]}", flush=True)


def timeit(f, *args, reps=3):
    out = f(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best, out


def slope_solve(name, solve, *args, **kw):
    ts, its, outs = {}, {}, {}
    for mi in (10, 30):
        dt, out = timeit(lambda mi=mi: solve(*args, max_iters=mi, **kw))
        ts[mi], its[mi], outs[mi] = dt, int(out.it), out
        print(f"  {name} mi={mi}: {dt*1e3:.2f} ms ({int(out.it)} it)",
              flush=True)
    t_it = (ts[30] - ts[10]) / max(its[30] - its[10], 1)
    print(f"{name}: TRUE {t_it*1e3:.3f} ms/iter = {1/t_it:.1f} iters/s, "
          f"const {(ts[10]-its[10]*t_it)*1e3:.1f} ms, "
          f"cost {float(outs[30].cost):.4e}", flush=True)


solve_lm = jax.jit(schur_flat.solve_ba_flat, static_argnames=("max_iters",))
solve_sm = jax.jit(schur_flat_sm.solve_ba_flat_sm,
                   static_argnames=("max_iters",))
slope_solve("l-major grid (current)", solve_lm, poses0, points0, obs, work,
            fixed_mask=fixed)
slope_solve("slot-major (new)", solve_sm, poses0, points0, swork,
            fixed_mask=fixed)
print("DONE", flush=True)
