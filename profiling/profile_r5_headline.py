"""Round-5 headline dissection (VERDICT r4 item 1).

Times every sub-stage of the flat LM iteration separately on the real chip
(amortized fori_loop, as stage_breakdown), counts the fusion kernels in the
compiled while-loop body, and prints a per-op latency budget so "latency
bound" becomes a number instead of an assertion.
"""
import os
import sys
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
from slam_tricks_tpu.solvers import schur_flat
from slam_tricks_tpu.solvers.schur_flat import (
    _linearize_flat, _iteration_quantities, _solve_flat, _sym6_expand,
    _inv3x3_flat, _chol3_flat, _mat3vec_flat, _IJ6, _IJ3, _dot2)
from slam_tricks_tpu.solvers.common import HIGHEST

dtype = np.float32
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    scene = make_scene(n_per_wall=400, n_cams=96, seed=0, dtype=dtype)
    poses0_h, points0_h, fixed_h = perturb_scene(scene, seed=1)
    C, L = scene.n_cams, scene.n_points
    obs_h = schur_flat.grid_order_obs(scene.obs, L, dtype=dtype)
    work_h = schur_flat.build_flat_work(obs_h, C, L, dtype=dtype, grid=True)
dev = jax.devices()[0]
poses0, points0, fixed, obs, work = jax.device_put(
    (poses0_h, points0_h, fixed_h, obs_h, work_h), dev)
N = obs.cam_idx.shape[0]
K = work.mask_lk.shape[1]
print(f"scene C={C} L={L} N={N} K={K} dev={dev}", flush=True)


def timeit(f, *args, reps=3):
    out = f(*args)
    jax.block_until_ready(out)
    # pull one element to the host: through the axon relay block_until_ready
    # can return early for pure-XLA programs (round-3 finding)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
        jax.block_until_ready(out)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / reps, out


AMORT = 32


def loop_jit(stage_fn):
    def run(x):
        def body(i, acc):
            return acc + stage_fn(i)
        return jax.lax.fori_loop(0, AMORT, body, jnp.asarray(0.0, dtype))
    return jax.jit(run)


def try_stage(name, fn):
    try:
        dt, _ = timeit(loop_jit(fn), jnp.zeros((), dtype))
        print(f"{name:28s}: {dt*1e3/AMORT:7.3f} ms", flush=True)
        return dt * 1e3 / AMORT
    except Exception:
        with open(f"/tmp/err_{name.strip().replace(' ', '_')}.txt", "w") as fh:
            fh.write(traceback.format_exc())
        print(f"{name:28s}: FAILED -> /tmp/err", flush=True)
        return None


lam0 = jnp.asarray(1e-4, dtype)

# precompute blocks once for sub-stage timing
blocks = _iteration_quantities(poses0, points0, obs, work, C, L)
Hpp_flat, gp, Hll_flat, gl, W, cost = jax.jit(
    lambda p, x: _iteration_quantities(p, x, obs, work, C, L))(poses0, points0)
jax.block_until_ready(W)

R_flat0 = poses0.R.reshape(C, 9)


# --- stage: linearize only (no reductions) ---
def st_linearize(i):
    (r0, r1), (jp0, jp1), (jl0, jl1), cc = _linearize_flat(
        R_flat0, poses0.t, points0 + 0.0 * i, obs.cam_idx, obs.lm_idx,
        obs.uv, obs.weight)
    return r0[0] + jp0[0][0] + jl1[2][0] + cc[0]


# --- stage: full quantities (linearize + cam + lm reductions + W) ---
def st_quant(i):
    out = _iteration_quantities(poses0, points0 + 0.0 * i, obs, work, C, L)
    return out[0][0, 0] + out[3][0, 0] + jnp.sum(out[4][0]) + out[5]


# --- solve sub-stages; operate on fixed blocks, perturb by i*0 ---
tmask = work.mask_lk
dpp = [jnp.maximum(Hpp_flat[:, k], 1e-12) for k, (i, j) in enumerate(_IJ6)
       if i == j]
empty = (Hll_flat[0] + Hll_flat[3] + Hll_flat[5]) <= 0.0
dll = [jnp.maximum(Hll_flat[k], 1e-12) for k, (i, j) in enumerate(_IJ3)
       if i == j]
Hll_d = [jnp.where(empty, 1.0 if k in (0, 3, 5) else 0.0,
                   Hll_flat[k] + (float(lam0) * dll[{0: 0, 3: 1, 5: 2}[k]]
                                  if k in (0, 3, 5) else 0.0))
         for k in range(6)]
Hll_d = jax.block_until_ready(Hll_d)


def whiten(Wp):
    lc = _chol3_flat(Hll_d)
    lcn = [c[:, None] for c in lc]
    W_t = Wp.reshape(L, K, 18) * tmask[..., None]
    l00, l10, l11, l20, l21, l22 = lcn
    i00, i11, i22 = 1.0 / l00, 1.0 / l11, 1.0 / l22
    w_of = lambda i, j: W_t[..., i * 3 + j]
    x0 = [w_of(j, 0) * i00 for j in range(6)]
    x1 = [(w_of(j, 1) - l10 * x0[j]) * i11 for j in range(6)]
    x2 = [(w_of(j, 2) - l20 * x0[j] - l21 * x1[j]) * i22 for j in range(6)]
    X_t = jnp.stack([jnp.stack(x0, axis=-1), jnp.stack(x1, axis=-1),
                     jnp.stack(x2, axis=-1)], axis=2)
    return X_t


def st_whiten(i):
    X_t = whiten(W + 0.0 * i)
    return jnp.sum(X_t[0])


oh_ct = (jax.nn.one_hot(work.cam_of_track, C, dtype=dtype)
         * tmask[..., None])
X_t_fixed = jax.block_until_ready(jax.jit(whiten)(W))


def build_B(X_t):
    B = jax.lax.dot_general(oh_ct, X_t.reshape(L, K, 18),
                            (((1,), (1,)), ((0,), (0,))), precision=HIGHEST)
    return B.reshape(L, C, 3, 6).transpose(0, 2, 1, 3).reshape(L * 3, C * 6)


def st_buildB(i):
    return jnp.sum(build_B(X_t_fixed + 0.0 * i)[0])


B_fixed = jax.block_until_ready(jax.jit(build_B)(X_t_fixed))


def st_S_matmul(i):
    Bp = B_fixed + 0.0 * i
    S_off = -jax.lax.dot_general(Bp, Bp, (((0,), (0,)), ((), ())),
                                 precision=HIGHEST)
    return S_off[0, 0]


Hpp_d = _sym6_expand(Hpp_flat)
diag_idx = jnp.arange(6)
Hpp_d = Hpp_d.at[:, diag_idx, diag_idx].add(
    float(lam0) * jnp.stack(dpp, axis=1))
S_off_f = jax.block_until_ready(jax.jit(
    lambda B: -jax.lax.dot_general(B, B, (((0,), (0,)), ((), ())),
                                   precision=HIGHEST))(B_fixed))
S_full = S_off_f.reshape(C, 6, C, 6)
eye_c = jnp.eye(C, dtype=dtype)[:, None, :, None]
S_full = S_full + eye_c * Hpp_d[:, :, None, :]
free = (~fixed).astype(dtype)
S_full = S_full * free[:, None, None, None] * free[None, None, :, None]
S_full = S_full + eye_c * (fixed.astype(dtype)[:, None, None, None]
                           * jnp.eye(6, dtype=dtype)[None, :, None, :])
S_mat = jax.block_until_ready(S_full.reshape(C * 6, C * 6))
b_vec = jnp.ones((C * 6,), dtype)


def st_cholesky(i):
    cf = jax.scipy.linalg.cho_factor(S_mat + 0.0 * i, lower=True)
    return cf[0][0, 0]


def st_cho_solve(i):
    cf = jax.scipy.linalg.cho_factor(S_mat + 0.0 * i, lower=True)
    return jax.scipy.linalg.cho_solve(cf, b_vec)[0]


def st_lu_solve(i):
    return jnp.linalg.solve(S_mat + 0.0 * i, b_vec)[0]


def st_full_solve(i):
    dp, dl, a, bdiag = _solve_flat(Hpp_flat, gp, list(Hll_flat), gl,
                                   W + 0.0 * i, lam0, fixed, work, C, L)
    return dp[0, 0] + dl[0, 0]


print("\n--- sub-stage latencies (amortized x%d) ---" % AMORT, flush=True)
t_lin = try_stage("linearize only", st_linearize)
t_quant = try_stage("quantities (lin+red+W)", st_quant)
t_whiten = try_stage("whiten X_t", st_whiten)
t_B = try_stage("build B (one-hot dot)", st_buildB)
t_S = try_stage("S = -B^T B", st_S_matmul)
t_chol = try_stage("cho_factor 576", st_cholesky)
t_chos = try_stage("cho_factor+solve 576", st_cho_solve)
t_lu = try_stage("lu solve 576", st_lu_solve)
t_solve = try_stage("_solve_flat full", st_full_solve)

# --- kernel count of the full compiled solve ---
try:
    solve = jax.jit(schur_flat.solve_ba_flat,
                    static_argnames=("max_iters",))
    lowered = solve.lower(poses0, points0, obs, work, fixed_mask=fixed,
                          max_iters=20)
    comp = lowered.compile()
    txt = comp.as_text()
    with open("/tmp/headline_hlo.txt", "w") as fh:
        fh.write(txt)
    import re
    fusions = len(re.findall(r"^\s*(?:ROOT )?%?fusion", txt, re.M))
    allk = len(re.findall(r"^\s*(?:ROOT )?\S+ = ", txt, re.M))
    print(f"\ncompiled: {fusions} fusion ops, {allk} HLO ops total "
          f"-> /tmp/headline_hlo.txt ({len(txt)} bytes)", flush=True)
    ca = comp.cost_analysis()
    if ca:
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        print({k: v for k, v in ca.items()
               if k in ("flops", "bytes accessed", "optimal_seconds")},
              flush=True)
except Exception:
    traceback.print_exc()

# --- full solve wall ---
solve = jax.jit(schur_flat.solve_ba_flat, static_argnames=("max_iters",))
dt, out = timeit(lambda: solve(poses0, points0, obs, work, fixed_mask=fixed,
                               max_iters=20))
print(f"\nfull solve: {dt*1e3:.2f} ms total, {int(out.it)} iters, "
      f"{dt*1e3/int(out.it):.3f} ms/iter, cost={float(out.cost):.4e}",
      flush=True)
print("DONE", flush=True)
