"""Piece-level profile of the large-C PCG matvec/preconditioner (big arrays
passed as jit ARGUMENTS — closure constants get embedded in the program and
blow the remote-compile request limit)."""

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
from slam_tricks_tpu.solvers.schur_flat import (_inv3x3_flat, _mat3vec_flat)

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
print(f"host build {time.time()-t0:.1f}s  Kc={pcgw.cam_table.shape[1]} "
      f"K={work.table.obs_idx.shape[1]} Ka={pcgw.adj_a.shape[1]}", flush=True)
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


quant = jax.jit(lambda p, x: schur_flat._iteration_quantities(
    p, x, obs, work, C, L))
Hf, gpf, Hlf, glf, Wf, cost = quant(poses0, points0)
lam = jnp.asarray(1e-4, dtype)


@jax.jit
def setup(Hf, Hlf):
    from slam_tricks_tpu.solvers.schur_flat import (_IJ3, _IJ6, _sym6_expand)
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


Hpp_d, hinv = setup(Hf, list(Hlf))
free = (~fixed).astype(dtype)
freec = free[:, None]
fixedc = fixed.astype(dtype)[:, None]

gather = jax.jit(lambda Wf, hinv: (
    Wf[work.table.obs_idx] * work.table.mask[..., None],
    Wf[pcgw.cam_table] * pcgw.cam_mask[..., None],
    [c[pcgw.lm_of_cam] for c in hinv]))
dt = timeit(gather, Wf, hinv)
print(f"W_t+W_c+hinv_c gathers (once/LM-iter): {dt*1e3:.1f} ms", flush=True)
W_t, W_c, hinv_c = gather(Wf, hinv)

AMORT = 16
x0 = jnp.ones((C, 6), dtype)


def make_loop(stage):
    @jax.jit
    def run(z, *args):
        def body(i, acc):
            return acc + stage(i, *args)
        return jax.lax.fori_loop(0, AMORT, body, jnp.asarray(0.0, dtype))
    return run


def lm_reduce(x, W_t):
    xc = x[work.cam_of_track]
    return [sum(W_t[..., i * 3 + j] * xc[..., i] for i in range(6)).sum(axis=1)
            for j in range(3)]


def cam_reduce(ucols, W_c):
    ug = [c[pcgw.lm_of_cam] for c in ucols]
    return jnp.stack(
        [sum(W_c[..., i * 3 + j] * ug[j] for j in range(3)).sum(axis=1)
         for i in range(6)], axis=1)


def st_lmred(i, W_t):
    return lm_reduce(x0 + 0.0 * i, W_t)[0][0]


def st_camred(i, W_c, u0):
    return cam_reduce([u0 + 0.0 * i] * 3, W_c)[0, 0]


def st_matvec(i, W_t, W_c, hinv, Hpp_d):
    xf = (x0 + 0.0 * i) * freec
    t = lm_reduce(xf, W_t)
    u = _mat3vec_flat(hinv, t)
    y = cam_reduce(u, W_c)
    Sx = jnp.einsum("cij,cj->ci", Hpp_d, xf) - y
    return (Sx * freec + x0 * fixedc)[0, 0]


u0 = jnp.ones((L,), dtype)
for name, st, args in (("lm_reduce", st_lmred, (W_t,)),
                       ("cam_reduce", st_camred, (W_c, u0)),
                       ("matvec", st_matvec, (W_t, W_c, hinv, Hpp_d))):
    dt = timeit(make_loop(st), jnp.zeros((), dtype), *args)
    print(f"{name}: {dt*1e3/AMORT:.2f} ms", flush=True)


@jax.jit
def build_DE(W_c, hinv_c, Wf, hinv, Hpp_d):
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


dt = timeit(build_DE, W_c, hinv_c, Wf, hinv, Hpp_d)
print(f"tridiag D,E assembly (once/LM-iter): {dt*1e3:.1f} ms", flush=True)
D, E = build_DE(W_c, hinv_c, Wf, hinv, Hpp_d)


def st_precond(i, D, E):
    p = pcgmod.make_tridiag_precond(D, E + 0.0 * i)
    return p(x0)[0, 0]


@jax.jit
def factor_apply_n(z, D, E, n):
    p = pcgmod.make_tridiag_precond(D, E)

    def body(i, acc):
        return acc + p(x0)[0, 0] * 1e-20
    return jax.lax.fori_loop(0, n, body, z)


d_f1 = timeit(jax.jit(lambda z, D, E: factor_apply_n(z, D, E, 1)),
              jnp.zeros((), dtype), D, E)
d_f17 = timeit(jax.jit(lambda z, D, E: factor_apply_n(z, D, E, 17)),
               jnp.zeros((), dtype), D, E)
print(f"precond factor+1apply: {d_f1*1e3:.1f} ms; "
      f"apply alone (amortized): {(d_f17-d_f1)/16*1e3:.2f} ms", flush=True)
