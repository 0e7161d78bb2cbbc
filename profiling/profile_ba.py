"""Round-2 item 1: attribute every ms of the BA iteration on real TPU.

Measures, at the bench scale (96 cams / 2400 pts / 83k obs):
  - per-call overhead vs per-iteration cost (max_iters sweep)
  - each linear_solver path (dense / tracks / paired)
  - per-stage cost (linearize, assemble, schur_reduce, cost eval) jitted
    standalone
Writes a human-readable report to stdout.
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from slam_tricks_tpu.sim import make_scene, perturb_scene
from slam_tricks_tpu.solvers import schur

dtype = np.float32
scene = make_scene(n_per_wall=400, n_cams=96, seed=0, dtype=dtype)
poses0, points0, fixed = perturb_scene(scene, seed=1)
obs = scene.obs
C, L = scene.n_cams, scene.n_points
N = obs.cam_idx.shape[0]
print(f"scene: C={C} L={L} N={N}", flush=True)


def timeit(f, *args, reps=3):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


# ---- 1. max_iters sweep on the dense path: separate per-call overhead ----
for mi in (5, 20):
    solve = jax.jit(schur.solve_ba, static_argnames=("max_iters",))
    dt, out = timeit(lambda: solve(poses0, points0, obs, fixed_mask=fixed,
                                   max_iters=mi))
    print(f"dense   max_iters={mi:3d}: total {dt*1e3:8.2f} ms  "
          f"({dt*1e3/mi:6.2f} ms/iter)  it={int(out.it)} cost={float(out.cost):.3e}",
          flush=True)

# ---- 2. tracks and paired paths ----
table = schur.build_track_table(obs.cam_idx, obs.lm_idx, obs.weight,
                                n_points=L, dtype=dtype)
pairs = schur.build_track_pairs(obs.cam_idx, obs.lm_idx, dtype=dtype)
print(f"track table K={table.obs_idx.shape[1]}, pairs chunks={pairs.pair_a.shape}",
      flush=True)

for name, kw in (("tracks", dict(linear_solver="tracks", track_table=table)),
                 ("paired", dict(linear_solver="paired", track_pairs=pairs))):
    for mi in (5, 20):
        solve = jax.jit(lambda p, x, o, f, mi=mi, kw=kw: schur.solve_ba(
            p, x, o, fixed_mask=f, max_iters=mi, **kw))
        dt, out = timeit(lambda: solve(poses0, points0, obs, fixed))
        print(f"{name:7s} max_iters={mi:3d}: total {dt*1e3:8.2f} ms  "
              f"({dt*1e3/mi:6.2f} ms/iter)  it={int(out.it)} "
              f"cost={float(out.cost):.3e}", flush=True)

# ---- 3. per-stage standalone ----
cam_idx, lm_idx, uv, w = obs.cam_idx, obs.lm_idx, obs.uv, obs.weight
lam = jnp.asarray(1e-4, dtype)

lin = jax.jit(lambda P, X: schur._linearize_obs(P, X, cam_idx, lm_idx, uv, w))
dt, (r, Jp, Jl) = timeit(lambda: lin(poses0, points0))
print(f"stage linearize:        {dt*1e3:7.3f} ms", flush=True)

asm = jax.jit(lambda r, Jp, Jl: schur._assemble(r, Jp, Jl, cam_idx, lm_idx, C, L))
dt, blocks = timeit(lambda: asm(r, Jp, Jl))
print(f"stage assemble(seg):    {dt*1e3:7.3f} ms", flush=True)

asm_t = jax.jit(lambda r, Jp, Jl: schur._assemble_tracks(r, Jp, Jl, cam_idx,
                                                         table, C, L))
dt, blocks_t = timeit(lambda: asm_t(r, Jp, Jl))
print(f"stage assemble(tracks): {dt*1e3:7.3f} ms", flush=True)

Hpp, Hll, gp, gl, W_obs = blocks
red = jax.jit(lambda *b: schur._schur_reduce(*b, cam_idx, lm_idx, lam, C, L, fixed))
dt, _ = timeit(lambda: red(Hpp, Hll, gp, gl, W_obs))
print(f"stage schur_reduce(dense):  {dt*1e3:7.3f} ms", flush=True)

red_t = jax.jit(lambda *b: schur._schur_reduce_tracks(*b, cam_idx, lm_idx, lam,
                                                      C, L, fixed, table))
dt, _ = timeit(lambda: red_t(Hpp, Hll, gp, gl, W_obs))
print(f"stage schur_reduce(tracks): {dt*1e3:7.3f} ms", flush=True)

red_p = jax.jit(lambda *b: schur._schur_reduce_paired(*b, cam_idx, lm_idx, lam,
                                                      C, L, fixed, pairs))
dt, _ = timeit(lambda: red_p(Hpp, Hll, gp, gl, W_obs))
print(f"stage schur_reduce(paired): {dt*1e3:7.3f} ms", flush=True)

cost = jax.jit(lambda P, X: schur._cost(P, X, cam_idx, lm_idx, uv, w))
dt, _ = timeit(lambda: cost(poses0, points0))
print(f"stage cost:             {dt*1e3:7.3f} ms", flush=True)

# ---- 4. null jit round-trip (tunnel dispatch floor) ----
f0 = jax.jit(lambda x: x + 1.0)
x = jnp.zeros((8,), dtype)
dt, _ = timeit(lambda: f0(x), reps=10)
print(f"null dispatch:          {dt*1e3:7.3f} ms", flush=True)

# ---- 5. flat-layout path (round 2) ----
from slam_tricks_tpu.solvers import schur_flat

work = schur_flat.build_flat_work(obs, C, L, dtype=dtype)
for mi in (5, 20):
    solve_f = jax.jit(schur_flat.solve_ba_flat, static_argnames=("max_iters",))
    dt, out = timeit(lambda: solve_f(poses0, points0, obs, work,
                                     fixed_mask=fixed, max_iters=mi))
    print(f"flat    max_iters={mi:3d}: total {dt*1e3:8.2f} ms  "
          f"({dt*1e3/mi:6.2f} ms/iter)  it={int(out.it)} "
          f"cost={float(out.cost):.3e}", flush=True)

# amortized per-stage timing: run the stage K times inside one jit (the
# tunnel adds ~25-70 ms per dispatch; K=32 amortizes it to ~1 ms)
K = 32

def loop_jit(stage_fn, init):
    def run(x):
        def body(i, acc):
            return acc + stage_fn(x, i)
        return jax.lax.fori_loop(0, K, body, init)
    return jax.jit(run)

def stage_lin(x, i):
    pts = points0 + 0.0 * i
    out = schur_flat._iteration_quantities(poses0, pts, obs, work, C, L)
    return out[1][0, 0]  # gp scalar

f = loop_jit(stage_lin, jnp.asarray(0.0, dtype))
dt, _ = timeit(lambda: f(points0))
print(f"flat linearize+assemble: {dt*1e3/K:7.3f} ms/iter (K={K} amortized)", flush=True)

Hf, gpf, Hlf, glf, Wf, _ = schur_flat._iteration_quantities(poses0, points0, obs, work, C, L)

def stage_solve(x, i):
    dp, dl, _, _ = schur_flat._solve_flat(Hf, gpf + 0.0 * i, Hlf, glf, Wf,
                                          lam, fixed, work, C, L)
    return dp[0, 0]

f2 = loop_jit(stage_solve, jnp.asarray(0.0, dtype))
dt, _ = timeit(lambda: f2(jnp.zeros((), dtype)))
print(f"flat schur solve:        {dt*1e3/K:7.3f} ms/iter (K={K} amortized)", flush=True)

def stage_cost(x, i):
    return schur_flat._cost_flat(poses0.R.reshape(C, 9), poses0.t,
                                 points0 + 0.0 * i, cam_idx, lm_idx, uv, w)

f3 = loop_jit(stage_cost, jnp.asarray(0.0, dtype))
dt, _ = timeit(lambda: f3(jnp.zeros((), dtype)))
print(f"flat cost:               {dt*1e3/K:7.3f} ms/iter (K={K} amortized)", flush=True)
