"""Stage-level profile of the large-C flat PCG path on the real chip:
where do 4.58 s/LM-iter go at C=1024/N=1.6M? (bench large_scale entry)."""

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
from slam_tricks_tpu.solvers.pcg_flat import (_block_mul_sym3, _pair_product,
                                              build_pcg_work)
from slam_tricks_tpu.solvers import pcg as pcgmod

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
    pcgw = build_pcg_work(scene.obs, C, dtype=dtype)
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
    return best


# ---- once-per-LM-iteration pieces ----
quant = jax.jit(lambda p, x: schur_flat._iteration_quantities(
    p, x, obs, work, C, L))
dt = timeit(quant, poses0, points0)
print(f"linearize+assemble: {dt*1e3:.1f} ms", flush=True)
Hf, gpf, Hlf, glf, Wf, cost = quant(poses0, points0)

lam = jnp.asarray(1e-4, dtype)

full = jax.jit(lambda: __import__(
    'slam_tricks_tpu.solvers.pcg_flat', fromlist=['solve_rcs_pcg_flat']
).solve_rcs_pcg_flat(Hf, gpf, list(Hlf), glf, Wf, obs.lm_idx, lam, fixed,
                     work, pcgw, C, L, cg_iters=50, cg_tol=1e-6))
dt = timeit(full)
print(f"solve_rcs_pcg_flat (50 cg): {dt*1e3:.1f} ms", flush=True)

# ---- pieces of the solve ----
from slam_tricks_tpu.solvers.schur_flat import (_IJ3, _IJ6, _inv3x3_flat,
                                                _mat3vec_flat, _sym6_expand)


def setup():
    dpp = [jnp.maximum(Hf[:, k], 1e-12) for k, (i, j) in enumerate(_IJ6)
           if i == j]
    dll = [jnp.maximum(Hlf[k], 1e-12) for k, (i, j) in enumerate(_IJ3)
           if i == j]
    Hpp_d = _sym6_expand(Hf)
    di = jnp.arange(6)
    Hpp_d = Hpp_d.at[:, di, di].add(lam * jnp.stack(dpp, axis=1))
    empty = (Hlf[0] + Hlf[3] + Hlf[5]) <= 0.0
    Hll_d = [jnp.where(empty, 1.0 if k in (0, 3, 5) else 0.0,
                       Hlf[k] + (lam * dll[{0: 0, 3: 1, 5: 2}[k]]
                                 if k in (0, 3, 5) else 0.0))
             for k in range(6)]
    hinv = _inv3x3_flat(Hll_d)
    return Hpp_d, hinv


Hpp_d, hinv = jax.jit(setup)()
free = (~fixed).astype(dtype)
freec = free[:, None]
fixedc = fixed.astype(dtype)[:, None]

W_t = jax.jit(lambda: Wf[work.table.obs_idx]
              * work.table.mask[..., None])()
cam_t = work.cam_of_track
W_c = jax.jit(lambda: Wf[pcgw.cam_table] * pcgw.cam_mask[..., None])()
hinv_c = jax.jit(lambda: [c[pcgw.lm_of_cam] for c in hinv])()

AMORT = 16


def loop(stage):
    def run(z):
        def body(i, acc):
            return acc + stage(i)
        return jax.lax.fori_loop(0, AMORT, body, jnp.asarray(0.0, dtype))
    return jax.jit(run)


def lm_reduce(x):
    xc = x[cam_t]
    return [sum(W_t[..., i * 3 + j] * xc[..., i] for i in range(6)).sum(axis=1)
            for j in range(3)]


def cam_reduce(ucols):
    ug = [c[pcgw.lm_of_cam] for c in ucols]
    return jnp.stack(
        [sum(W_c[..., i * 3 + j] * ug[j] for j in range(3)).sum(axis=1)
         for i in range(6)], axis=1)


x0 = jnp.ones((C, 6), dtype)


def stage_lmred(i):
    return lm_reduce(x0 + 0.0 * i)[0][0]


def stage_camred(i):
    u = [jnp.ones((L,), dtype) + 0.0 * i] * 3
    return cam_reduce(u)[0, 0]


def stage_matvec(i):
    xf = (x0 + 0.0 * i) * freec
    t = lm_reduce(xf)
    u = _mat3vec_flat(hinv, t)
    y = cam_reduce(u)
    Sx = jnp.einsum("cij,cj->ci", Hpp_d, xf) - y
    return (Sx * freec + x0 * fixedc)[0, 0]


# preconditioner build + apply
def build_precond():
    Y_c = _block_mul_sym3(W_c, hinv_c)
    D = Hpp_d - _pair_product(Y_c, W_c)
    hinv_obs = [c[obs.lm_idx] for c in hinv]
    Y_obs = _block_mul_sym3(Wf, hinv_obs)
    Ya = Y_obs[pcgw.adj_a] * pcgw.adj_mask[..., None]
    Wb = Wf[pcgw.adj_b]
    E = -_pair_product(Ya, Wb)
    eye6 = jnp.eye(6, dtype=dtype)
    D = D * free[:, None, None] + eye6[None] * (1 - free)[:, None, None]
    E = E * free[1:, None, None] * free[:-1, None, None]
    jit = 100.0 * jnp.asarray(jnp.finfo(dtype).eps, dtype)
    D = D + eye6[None] * (jit * jnp.mean(jnp.abs(
        jnp.diagonal(D, axis1=-2, axis2=-1))))
    return D, E


DE = jax.jit(build_precond)
dt = timeit(DE)
print(f"tridiag D,E assembly: {dt*1e3:.1f} ms", flush=True)
D, E = DE()

fac = jax.jit(lambda: pcgmod.make_tridiag_precond(D, E)(x0))
dt = timeit(fac)
print(f"precond factor+1 apply: {dt*1e3:.1f} ms", flush=True)

for name, st in (("lm_reduce", stage_lmred), ("cam_reduce", stage_camred),
                 ("matvec", stage_matvec)):
    dt = timeit(loop(st), jnp.zeros((), dtype))
    print(f"{name}: {dt*1e3/AMORT:.2f} ms", flush=True)

# apply-only amortized: factor once outside, apply in loop is hard to split
# since make_tridiag_precond closes over factorization; time factor+N applies
precond = None


def fac_many(n):
    def run(z):
        p = pcgmod.make_tridiag_precond(D, E)

        def body(i, acc):
            return acc + p(x0 + acc)[0, 0] * 0.0
        return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, dtype))
    return jax.jit(run)


d1 = timeit(fac_many(1), jnp.zeros((), dtype))
d17 = timeit(fac_many(17), jnp.zeros((), dtype))
print(f"precond factor: {(2*d1-d17+ (d17-d1))*0+d1*1e3:.1f} ms; "
      f"apply (amortized): {(d17-d1)/16*1e3:.2f} ms", flush=True)
