"""Round-5: component breakdown of the large-C general iteration
(C=1024, L=7200, N=2.66M) by the slope method."""
import os
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
cache_dir = os.environ.get(
    "SLAM_JAX_CACHE", os.path.expanduser("~/.cache/slam_jax_r5"))
jax.config.update("jax_compilation_cache_dir", cache_dir)

from slam_tricks_tpu.sim import make_scene, perturb_scene
from slam_tricks_tpu.solvers import schur_flat_sm
from slam_tricks_tpu.solvers.schur_flat_sm import (
    _quantities_sm, _solve_sm, _chol3_flat)
from slam_tricks_tpu.solvers.common import HIGHEST

dtype = np.float32
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    scene = make_scene(n_per_wall=1200, n_cams=1024, seed=5, dtype=dtype)
    poses0, points0, fixed = perturb_scene(
        scene, pose_rot_noise=0.002, pose_trans_noise=0.01,
        point_noise=0.01, seed=6)
    C, L = scene.n_cams, scene.n_points
    swork = schur_flat_sm.build_slot_work(scene.obs, C, L, dtype=dtype,
                                         use_onehot=False)
dev = jax.devices()[0]
poses0, points0, fixed, work = jax.device_put(
    (poses0, points0, fixed, swork), dev)
K = work.mask.shape[0]
print(f"C={C} L={L} K={K}", flush=True)


def timeit(f, *args, reps=2):
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


A1, A2 = 1, 4


def slope_bench(name, make_out, *bigs):
    # big arrays must be ARGS, not closure constants: constants are inlined
    # into the HLO and overflow the remote-compile request (HTTP 413)
    try:
        times = {}
        for A in (A1, A2):
            def run(x, *bs, A=A):
                def body(i, acc):
                    return acc + jnp.sum(
                        make_out(x + i, *bs)[:1].astype(jnp.float32))
                return jax.lax.fori_loop(0, A, body,
                                         jnp.asarray(0.0, jnp.float32))
            dt, _ = timeit(jax.jit(run), jnp.zeros((), dtype), *bigs)
            times[A] = dt
        t_iter = (times[A2] - times[A1]) / (A2 - A1)
        print(f"{name:40s}: {t_iter*1e3:8.2f} ms true", flush=True)
        return t_iter
    except Exception:
        with open(f"/tmp/err_{name.strip().replace(' ', '_').replace('/','_')}.txt",
                  "w") as fh:
            fh.write(traceback.format_exc())
        print(f"{name:40s}: FAILED", flush=True)
        return None


# quantities
def st_quant(i):
    out = _quantities_sm(poses0, points0 + 0.0 * i, work)
    return out[1][0]


slope_bench("quantities (lin+reduce+W)", st_quant)


def st_lin_only(i):
    from slam_tricks_tpu.solvers.schur_flat_sm import _linearize_sm
    (r0, r1), (jp0, jp1), (jl0, jl1), cc = _linearize_sm(
        poses0.R.reshape(C, 9), poses0.t, points0 + 0.0 * i, work)
    return (r0 + jp0[0] + jl1[2] + cc)[0]


slope_bench("linearize only (incl fetch)", st_lin_only)

Hpp_flat, gp, Hll_flat, gl, W, cost = jax.jit(
    lambda p, x: _quantities_sm(p, x, work))(poses0, points0)
jax.block_until_ready(W)
lam0 = jnp.asarray(1e-4, dtype)


def st_solve(i, Wb):
    dp, dl, _, _ = _solve_sm(Hpp_flat, gp + 0.0 * i, list(Hll_flat),
                             list(gl), Wb, lam0, fixed, work)
    return dp[0]


slope_bench("solve (whiten+B+S+chol+backsub)", st_solve, W)

# pieces of solve
m = work.mask
Hll_d = [jnp.abs(Hll_flat[k]) + (1.0 if k in (0, 3, 5) else 0.0)
         for k in range(6)]


def whiten_X(Wp):
    lc = _chol3_flat(Hll_d)
    l00, l10, l11, l20, l21, l22 = [c[None] for c in lc]
    i00, i11, i22 = 1.0 / l00, 1.0 / l11, 1.0 / l22
    w_of = lambda a, b: Wp[a * 3 + b] * m
    x0 = [w_of(j, 0) * i00 for j in range(6)]
    x1 = [(w_of(j, 1) - l10 * x0[j]) * i11 for j in range(6)]
    x2 = [(w_of(j, 2) - l20 * x0[j] - l21 * x1[j]) * i22 for j in range(6)]
    return jnp.stack(x0 + x1 + x2, axis=0)


slope_bench("whiten", lambda i, Wb: whiten_X(Wb + i)[0, 0], W)
X = jax.block_until_ready(jax.jit(whiten_X)(W))


def build_B(Xp):
    ohr = (jax.nn.one_hot(work.cam_of_slot.T, C, dtype=jnp.bfloat16)
           * work.mask.T[..., None].astype(jnp.bfloat16))
    Bl = jax.lax.dot_general(
        Xp.transpose(2, 0, 1), ohr, (((2,), (1,)), ((0,), (0,))),
        precision=(jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT),
        preferred_element_type=dtype)
    return Bl.reshape(L, 3, 6, C).transpose(0, 1, 3, 2).reshape(L * 3, C * 6)


slope_bench("build B (onehot on the fly)", lambda i, Xb: build_B(Xb + i)[:1, 0], X)
B = jax.block_until_ready(jax.jit(build_B)(X))

for prec, nm in ((HIGHEST, "HIGHEST"), (jax.lax.Precision.HIGH, "HIGH"),
                 (jax.lax.Precision.DEFAULT, "DEFAULT")):
    slope_bench(f"S=-B^T B {nm}", lambda i, Bb, p=prec: -jax.lax.dot_general(
        Bb + i, Bb + i, (((0,), (0,)), ((), ())), precision=p)[:1, 0], B)

rng = np.random.default_rng(0)
A0 = (rng.normal(size=(6144, 256)).astype(np.float32))
S0 = jax.device_put(jnp.asarray(
    A0 @ A0.T + 6144 * np.eye(6144, dtype=np.float32)), dev)
b0 = jax.device_put(jnp.asarray(
    rng.normal(size=(6144,)).astype(np.float32)), dev)
slope_bench("cho_factor+solve 6144", lambda i, Sb: jax.scipy.linalg.cho_solve(
    jax.scipy.linalg.cho_factor(
        Sb + i * jnp.eye(6144, dtype=dtype), lower=True), b0)[:1], S0)

# camera reductions / fetch at this scale
slope_bench("cam reduce 28 cols (gather table)",
            lambda i, Wb: schur_flat_sm._cam_reduce(
                [Wb[j % 18] + i for j in range(28)], work, dtype)[:1, 0], W)
camcols = jnp.concatenate([poses0.R.reshape(C, 9), poses0.t], axis=1)
slope_bench("fetch cam vals (take)",
            lambda i: schur_flat_sm._fetch_cam_vals(
                camcols + i, work, K, L)[0][0])
print("DONE", flush=True)
