"""Split the banded solve: band assembly vs block-tridiag factor+solve."""

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
with jax.default_device(cpu):
    scene = make_trajectory_scene(n_cams=C, n_points=NPTS, track_len=TRACK,
                                  seed=11, dtype=dtype)
    poses0, points0, fixed = perturb_scene(
        scene, pose_rot_noise=0.002, pose_trans_noise=0.01, point_noise=0.01,
        seed=12)
    bw = banded_flat.build_banded_work(scene.obs, C, NPTS, dtype=dtype)
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
_, (Hb, gpb, Hlb, glb, Wb, cost) = timeit(quant, poses0, points_s)

AMORT = 16


def loop(stage):
    @jax.jit
    def run(z, *args):
        def body(i, acc):
            return acc + stage(i, *args)
        return jax.lax.fori_loop(0, AMORT, body, jnp.asarray(0.0, dtype))
    return run


# amortized: full solve
lam = jnp.asarray(1e-4, dtype)


def st_solve(i, Hb, gpb, glb, Wb):
    dp, _, _, _ = banded_flat._solve_banded(Hb, gpb + 0.0 * i, list(Hlb),
                                            glb, Wb, lam, fixed, bw, C)
    return dp[1, 0]


dt, _ = timeit(loop(st_solve), jnp.zeros((), dtype), Hb, gpb, glb, Wb)
print(f"solve amortized: {dt*1e3/AMORT:.2f} ms", flush=True)

# amortized: block-tridiag solve alone at (G, m) = (128, 48)
G, m = 128, 48
rng = np.random.default_rng(0)
Gm = rng.normal(size=(G, m, m + 8))
Dm = jnp.asarray((Gm @ Gm.transpose(0, 2, 1)
                  + 8 * np.eye(m)[None]).astype(dtype))
Em = jnp.asarray((0.3 * rng.normal(size=(G - 1, m, m))).astype(dtype))
rm = jnp.asarray(rng.normal(size=(G, m)).astype(dtype))


def st_tri(i, Dm, Em, rm):
    return banded_flat.block_tridiag_solve(Dm, Em + 0.0 * i, rm)[1, 0]


dt, _ = timeit(loop(st_tri), jnp.zeros((), dtype), Dm, Em, rm)
print(f"block_tridiag_solve (128,48) amortized: {dt*1e3/AMORT:.2f} ms",
      flush=True)


# amortized: quantities
def st_quant(i, points_s):
    o = banded_flat._banded_quantities(poses0, points_s + 0.0 * i, bw, C)
    return o[1][1, 0]


dt, _ = timeit(loop(st_quant), jnp.zeros((), dtype), points_s)
print(f"quantities amortized: {dt*1e3/AMORT:.2f} ms", flush=True)
