"""Round-5: relative pose-graph solver at N=10k on the real TPU chip, f32,
slope-timed (VERDICT item 3: target <= 100 ms/iter)."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
cache_dir = os.environ.get(
    "SLAM_JAX_CACHE", os.path.expanduser("~/.cache/slam_jax_r5"))
jax.config.update("jax_compilation_cache_dir", cache_dir)

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tests"))
from test_posegraph_chain import make_graph   # noqa: E402

from slam_tricks_tpu.solvers.posegraph import (build_chain_work,   # noqa
                                               solve_pose_graph_relative)

N = 10_000
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    pt, p0, ii, jj, Z, info = make_graph(N, 64, seed=17, odo_noise=0.002,
                                         loop_noise=0.0005)
    f32 = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
    work = build_chain_work(ii, jj, Z, info, N, dtype=np.float32)
    p032 = f32(p0)
dev = jax.devices()[0]
p032, work = jax.device_put((p032, work), dev)
print(f"N={N} E=64 dev={dev}", flush=True)

solve = jax.jit(solve_pose_graph_relative, static_argnames=("max_iters",))


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


ts, its = {}, {}
for mi in (5, 15):
    t0 = time.time()
    dt, out = timeit(lambda mi=mi: solve(p032, work, max_iters=mi))
    ts[mi], its[mi] = dt, int(out.it)
    print(f"mi={mi}: {dt*1e3:.1f} ms, {int(out.it)} iters, "
          f"cost {float(out.cost):.4e} (incl compile {time.time()-t0:.0f}s)",
          flush=True)
t_it = (ts[15] - ts[5]) / max(its[15] - its[5], 1)
with jax.default_device(cpu):
    ate0 = float(jnp.sqrt(jnp.mean(
        (np.asarray(p0.t) - np.asarray(pt.t)) ** 2)))
    ate = float(np.sqrt(np.mean(
        (np.asarray(out.poses.t, np.float64) - np.asarray(pt.t)) ** 2)))
print(f"TRUE ms/iter on TPU: {t_it*1e3:.2f}; ate {ate0:.4f} -> {ate:.4f}",
      flush=True)
print("DONE", flush=True)
