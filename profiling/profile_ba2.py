"""Attribute per-iteration cost: max_iters sweep with individual rep times,
while_loop overhead floor, and jax.profiler trace."""
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


def reps_of(f, n=4):
    out = f(); jax.block_until_ready(out)   # warmup/compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(); jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    return ts, out


# 1. while_loop overhead floor: trivial body, K iterations
def trivial_loop(x, k):
    def body(s):
        i, v = s
        return i + 1, v @ v * 0.99 + 0.01
    def cond(s):
        return s[0] < k
    return jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32), x))

x0 = jnp.eye(64, dtype=dtype)
for k in (5, 20, 100):
    f = jax.jit(lambda x, k=k: trivial_loop(x, k))
    ts, _ = reps_of(lambda: f(x0))
    print(f"trivial while k={k:4d}: reps(ms)={['%.2f' % t for t in ts]}", flush=True)

# 2. max_iters sweep, tracks path, individual reps
table = schur.build_track_table(obs.cam_idx, obs.lm_idx, obs.weight,
                                n_points=L, dtype=dtype)
for mi in (5, 10, 20, 40):
    solve = jax.jit(lambda p, x, o, f, mi=mi: schur.solve_ba(
        p, x, o, fixed_mask=f, max_iters=mi, linear_solver="tracks",
        track_table=table))
    ts, out = reps_of(lambda: solve(poses0, points0, obs, fixed))
    print(f"tracks mi={mi:3d}: reps(ms)={['%.1f' % t for t in ts]} it={int(out.it)}",
          flush=True)

# 3. dense path sweep with individual reps (re-check the 0.38ms artifact)
for mi in (5, 20):
    solve = jax.jit(lambda p, x, o, f, mi=mi: schur.solve_ba(
        p, x, o, fixed_mask=f, max_iters=mi))
    ts, out = reps_of(lambda: solve(poses0, points0, obs, fixed))
    print(f"dense  mi={mi:3d}: reps(ms)={['%.1f' % t for t in ts]} it={int(out.it)}",
          flush=True)

# 4. profiler trace of one 20-iter tracks solve
trace_dir = "/tmp/jax_trace"
solve20 = jax.jit(lambda p, x, o, f: schur.solve_ba(
    p, x, o, fixed_mask=f, max_iters=20, linear_solver="tracks",
    track_table=table))
out = solve20(poses0, points0, obs, fixed); jax.block_until_ready(out)
try:
    with jax.profiler.trace(trace_dir):
        out = solve20(poses0, points0, obs, fixed)
        jax.block_until_ready(out)
    print("trace written to", trace_dir, flush=True)
except Exception as e:
    print("profiler failed:", e, flush=True)
