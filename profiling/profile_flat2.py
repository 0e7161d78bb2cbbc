"""Round-2 TPU experiments, batch 2: pallas kernel standalone + in-loop (with
the optimization_barrier fix), remaining stage timings, XLA chol(576)."""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from slam_tricks_tpu.sim import make_scene, perturb_scene
from slam_tricks_tpu.solvers import schur_flat
from slam_tricks_tpu.ops import pallas_ba

dtype = np.float32
scene = make_scene(n_per_wall=400, n_cams=96, seed=0, dtype=dtype)
poses0, points0, fixed = perturb_scene(scene, seed=1)
C, L = scene.n_cams, scene.n_points
obs_s, meta = pallas_ba.build_pallas_ba_args(scene.obs, L, tile=1024)
work = schur_flat.build_flat_work(obs_s, C, L, dtype=dtype)
print(f"scene C={C} L={L} N={obs_s.cam_idx.shape[0]}", flush=True)


def timeit(f, *args, reps=3):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


K = 32


def loop_jit(stage_fn, init):
    def run(x):
        def body(i, acc):
            return acc + stage_fn(x, i)
        return jax.lax.fori_loop(0, K, body, init)
    return jax.jit(run)


# 1. pallas standalone (amortized loop — also the in-while_loop context test)
def stage_lin_pal(x, i):
    out = pallas_ba.linearize_assemble(
        poses0.R.reshape(C, 9), poses0.t, points0 + 0.0 * i, obs_s,
        meta["bases"], n_cams=C, n_points=L, tile=meta["tile"],
        w_win=meta["w_win"], L_pad=meta["L_pad"])
    return out[1][0, 0] + jnp.sum(out[5][0])


try:
    f = loop_jit(stage_lin_pal, jnp.asarray(0.0, dtype))
    dt, _ = timeit(lambda: f(jnp.zeros((), dtype)))
    print(f"stage lin+asm (pallas): {dt*1e3/K:7.3f} ms", flush=True)
except Exception as e:
    print(f"pallas stage FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

# 2. pallas inside the full solve
try:
    solve_p = jax.jit(lambda p, x, o, w, f: schur_flat.solve_ba_flat(
        p, x, o, w, fixed_mask=f, max_iters=20, pallas_meta=meta))
    dt, out = timeit(lambda: solve_p(poses0, points0, obs_s, work, fixed))
    print(f"flat-pallas solve 20it: {dt*1e3:8.2f} ms ({dt*1e3/20:6.2f} ms/iter) "
          f"cost={float(out.cost):.3e}", flush=True)
except Exception as e:
    print(f"pallas solve FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


# 3. remaining stage timings (xla flat)
def stage_lin_xla(x, i):
    out = schur_flat._iteration_quantities(poses0, points0 + 0.0 * i, obs_s,
                                           work, C, L)
    return out[1][0, 0]


f = loop_jit(stage_lin_xla, jnp.asarray(0.0, dtype))
dt, _ = timeit(lambda: f(jnp.zeros((), dtype)))
print(f"stage lin+asm (xla):    {dt*1e3/K:7.3f} ms", flush=True)

Hf, gpf, Hlf, glf, Wf, _ = schur_flat._iteration_quantities(
    poses0, points0, obs_s, work, C, L)
lam = jnp.asarray(1e-4, dtype)


def stage_solve(x, i):
    dp, _, _, _ = schur_flat._solve_flat(Hf, gpf + 0.0 * i, Hlf, glf, Wf,
                                         lam, fixed, work, C, L)
    return dp[0, 0]


f2 = loop_jit(stage_solve, jnp.asarray(0.0, dtype))
dt, _ = timeit(lambda: f2(jnp.zeros((), dtype)))
print(f"stage schur solve:      {dt*1e3/K:7.3f} ms", flush=True)


def stage_cost(x, i):
    return schur_flat._cost_flat(poses0.R.reshape(C, 9), poses0.t,
                                 points0 + 0.0 * i, obs_s.cam_idx,
                                 obs_s.lm_idx, obs_s.uv, obs_s.weight)


f3 = loop_jit(stage_cost, jnp.asarray(0.0, dtype))
dt, _ = timeit(lambda: f3(jnp.zeros((), dtype)))
print(f"stage cost:             {dt*1e3/K:7.3f} ms", flush=True)

S = jnp.eye(C * 6, dtype=dtype) * 100.0


def stage_chol(x, i):
    cf = jax.scipy.linalg.cho_factor(S + 0.0 * i, lower=True)
    return cf[0][0, 0]


f4 = loop_jit(stage_chol, jnp.asarray(0.0, dtype))
dt, _ = timeit(lambda: f4(jnp.zeros((), dtype)))
print(f"stage chol 576 (xla):   {dt*1e3/K:7.3f} ms", flush=True)
print("DONE", flush=True)
