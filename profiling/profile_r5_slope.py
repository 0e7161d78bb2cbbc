"""Round-5: separate the axon-relay dispatch constant from true on-chip
per-iteration time by timing each program at TWO amortization counts and
taking the slope. If t(A) = c_relay + A * t_iter, then
t_iter = (t(A2) - t(A1)) / (A2 - A1) and c_relay = t(A1) - A1 * t_iter.
"""
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
from slam_tricks_tpu.solvers import schur_flat
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
print(f"scene C={C} L={L} N={N} K={K}", flush=True)


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


A1, A2 = 16, 112


def slope_bench(name, make_out):
    try:
        times = {}
        for A in (A1, A2):
            def run(x, A=A):
                def body(i, acc):
                    return acc + jnp.sum(
                        make_out(x + i)[:1].astype(jnp.float32))
                return jax.lax.fori_loop(
                    0, A, body, jnp.asarray(0.0, jnp.float32))
            dt, _ = timeit(jax.jit(run), jnp.zeros((), dtype))
            times[A] = dt
        t_iter = (times[A2] - times[A1]) / (A2 - A1)
        c0 = times[A1] - A1 * t_iter
        print(f"{name:40s}: {t_iter*1e3:7.3f} ms/iter true, "
              f"dispatch-const {c0*1e3:6.1f} ms", flush=True)
        return t_iter
    except Exception:
        with open(f"/tmp/err_{name.strip().replace(' ', '_').replace('/','_')}.txt",
                  "w") as fh:
            fh.write(traceback.format_exc())
        print(f"{name:40s}: FAILED", flush=True)
        return None


# empty body — pure loop/relay floor
slope_bench("empty body", lambda i: (i + 1.0)[None])

cols28 = jax.device_put(jnp.asarray(np.random.default_rng(0).normal(
    size=(28, N)).astype(np.float32)), dev)
cam_np = np.asarray(obs_h.cam_idx)
oh_np = (cam_np[:, None] == np.arange(C)[None, :])
oh_f32 = jax.device_put(jnp.asarray(oh_np.astype(np.float32)), dev)
oh_bf16 = jax.device_put(jnp.asarray(oh_np.astype(jnp.bfloat16)), dev)
camcols = jnp.concatenate([poses0.R.reshape(C, 9), poses0.t], axis=1)

slope_bench("gather R/t rows (l-major)",
            lambda i: (camcols + i)[obs.cam_idx].T)
slope_bench("cam reduction f32oh dot (current)",
            lambda i: jax.lax.dot_general(
                oh_f32, (cols28 + i).T, (((0,), (0,)), ((), ())),
                precision=HIGHEST).T)
slope_bench("cam reduction (28,N)x(N,C)bf16oh",
            lambda i: jax.lax.dot_general(
                cols28 + i, oh_bf16, (((1,), (0,)), ((), ())),
                precision=(jax.lax.Precision.HIGHEST,
                           jax.lax.Precision.DEFAULT),
                preferred_element_type=jnp.float32))

mask_lk = work.mask_lk
cols9 = jax.device_put(jnp.asarray(np.random.default_rng(1).normal(
    size=(9, N)).astype(np.float32)), dev)
slope_bench("lm reduction (L,K,9) masked sum",
            lambda i: jnp.sum((cols9 + i).T.reshape(L, K, 9)
                              * mask_lk[..., None], axis=1).T)

X18 = jax.device_put(jnp.asarray(np.random.default_rng(2).normal(
    size=(L, K, 18)).astype(np.float32)
    * np.asarray(work_h.mask_lk)[..., None]), dev)
oh_ct = jax.device_put(jax.block_until_ready(
    jax.nn.one_hot(work.cam_of_track, C, dtype=dtype)
    * mask_lk[..., None]), dev)
oh_ct_bf16 = jax.device_put(
    jax.block_until_ready(oh_ct.astype(jnp.bfloat16)), dev)


def B_current(i):
    B = jax.lax.dot_general(oh_ct, X18 + i, (((1,), (1,)), ((0,), (0,))),
                            precision=HIGHEST)
    return B.reshape(L, C, 3, 6).transpose(0, 2, 1, 3).reshape(L * 3, C * 6)


def B_bf16(i):
    B = jax.lax.dot_general(
        oh_ct_bf16, X18 + i, (((1,), (1,)), ((0,), (0,))),
        precision=(jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST),
        preferred_element_type=jnp.float32)
    return B.reshape(L, C, 3, 6).transpose(0, 2, 1, 3).reshape(L * 3, C * 6)


slope_bench("B build f32 (current)", B_current)
slope_bench("B build bf16 oh", B_bf16)

B_fixed = jax.device_put(jax.block_until_ready(jax.jit(B_current)(
    jnp.zeros((), dtype))), dev)
slope_bench("S = -B^T B HIGHEST", lambda i: -jax.lax.dot_general(
    B_fixed + i, B_fixed + i, (((0,), (0,)), ((), ())), precision=HIGHEST))

rng = np.random.default_rng(0)
A0 = rng.normal(size=(576, 576)).astype(np.float32)
S0 = jax.device_put(jnp.asarray(
    A0 @ A0.T + 576 * np.eye(576, dtype=np.float32)), dev)
b0 = jax.device_put(jnp.asarray(rng.normal(size=(576,)).astype(np.float32)),
                    dev)
slope_bench("xla cho_factor+solve 576", lambda i: jax.scipy.linalg.cho_solve(
    jax.scipy.linalg.cho_factor(S0 + i * jnp.eye(576, dtype=dtype),
                                lower=True), b0))
try:
    from slam_tricks_tpu.ops.pallas_chol import chol_solve
    slope_bench("pallas fused chol_solve 576",
                lambda i: chol_solve(S0 + i * jnp.eye(576, dtype=dtype), b0))
except Exception:
    traceback.print_exc()

# whiten stage from the real solver shapes
Hll_flat6 = [jnp.abs(jax.device_put(jnp.asarray(
    np.random.default_rng(3 + k).normal(size=(L,)).astype(np.float32)), dev))
    + (3.0 if k in (0, 3, 5) else 0.0) for k in range(6)]
W18 = jax.device_put(jnp.asarray(np.random.default_rng(9).normal(
    size=(N, 18)).astype(np.float32)), dev)
from slam_tricks_tpu.solvers.schur_flat import _chol3_flat


def whiten(i):
    lc = _chol3_flat(Hll_flat6)
    lcn = [c[:, None] for c in lc]
    W_t = (W18 + i).reshape(L, K, 18) * mask_lk[..., None]
    l00, l10, l11, l20, l21, l22 = lcn
    i00, i11, i22 = 1.0 / l00, 1.0 / l11, 1.0 / l22
    w_of = lambda a, b: W_t[..., a * 3 + b]
    x0 = [w_of(j, 0) * i00 for j in range(6)]
    x1 = [(w_of(j, 1) - l10 * x0[j]) * i11 for j in range(6)]
    x2 = [(w_of(j, 2) - l20 * x0[j] - l21 * x1[j]) * i22 for j in range(6)]
    X_t = jnp.stack([jnp.stack(x0, axis=-1), jnp.stack(x1, axis=-1),
                     jnp.stack(x2, axis=-1)], axis=2)
    return X_t.reshape(L, K * 18)


slope_bench("whiten X_t (current)", whiten)

# FULL solver iteration slope: 10 vs 30 LM iterations
solve = jax.jit(schur_flat.solve_ba_flat, static_argnames=("max_iters",))
ts = {}
for mi in (10, 30):
    dt, out = timeit(lambda mi=mi: solve(poses0, points0, obs, work,
                                         fixed_mask=fixed, max_iters=mi))
    ts[mi] = dt
    print(f"full solve max_iters={mi}: {dt*1e3:.2f} ms "
          f"({int(out.it)} iters)", flush=True)
t_it = (ts[30] - ts[10]) / 20
print(f"TRUE headline ms/iter (slope): {t_it*1e3:.3f} "
      f"-> {1.0/t_it:.1f} iters/s; dispatch-const "
      f"{(ts[10] - 10*t_it)*1e3:.1f} ms", flush=True)
print("DONE", flush=True)
