"""TPU batch 3: (a) pallas lin+asm kernel with FULL error text, (b) sub-stage
timing inside the flat Schur solve (whiten/B-build/S-matmul/chol/backsub),
(c) the restructured (cost-pass-free) full solve."""
import os
import time
import traceback

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
from slam_tricks_tpu.ops.smallchol import cholesky_small, solve_lower_small

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


def loop_jit(stage_fn):
    def run(x):
        def body(i, acc):
            return acc + stage_fn(i)
        return jax.lax.fori_loop(0, K, body, jnp.asarray(0.0, dtype))
    return jax.jit(run)


# ---- (a) pallas kernel standalone, full error ----
def stage_lin_pal(i):
    out = pallas_ba.linearize_assemble(
        poses0.R.reshape(C, 9), poses0.t, points0 + 0.0 * i, obs_s,
        meta["bases"], n_cams=C, n_points=L, tile=meta["tile"],
        w_win=meta["w_win"], L_pad=meta["L_pad"])
    return out[1][0, 0] + jnp.sum(out[5][0])


try:
    f = loop_jit(stage_lin_pal)
    dt, _ = timeit(lambda: f(jnp.zeros((), dtype)))
    print(f"stage lin+asm (pallas): {dt*1e3/K:7.3f} ms", flush=True)
    PALLAS_OK = True
except Exception:
    with open("/tmp/pallas_err.txt", "w") as fh:
        fh.write(traceback.format_exc())
    print("pallas stage FAILED -> /tmp/pallas_err.txt", flush=True)
    PALLAS_OK = False

if PALLAS_OK:
    solve_p = jax.jit(lambda p, x, o, w, f: schur_flat.solve_ba_flat(
        p, x, o, w, fixed_mask=f, max_iters=20, pallas_meta=meta))
    try:
        dt, out = timeit(lambda: solve_p(poses0, points0, obs_s, work, fixed))
        print(f"flat-pallas solve 20it: {dt*1e3:8.2f} ms "
              f"({dt*1e3/20:6.2f} ms/iter) cost={float(out.cost):.3e}",
              flush=True)
    except Exception:
        with open("/tmp/pallas_err2.txt", "w") as fh:
            fh.write(traceback.format_exc())
        print("pallas solve FAILED -> /tmp/pallas_err2.txt", flush=True)

# ---- (c) restructured xla-flat full solve ----
solve = jax.jit(schur_flat.solve_ba_flat, static_argnames=("max_iters",))
for mi in (5, 20):
    dt, out = timeit(lambda mi=mi: solve(poses0, points0, obs_s, work,
                                         fixed_mask=fixed, max_iters=mi))
    print(f"flat-xla v2 max_iters={mi:3d}: {dt*1e3:8.2f} ms "
          f"({dt*1e3/mi:6.2f} ms/iter) it={int(out.it)} "
          f"cost={float(out.cost):.3e}", flush=True)

# ---- (b) solve sub-stages ----
(Hf, gpf, Hlf, glf, Wf, _) = schur_flat._iteration_quantities(
    poses0, points0, obs_s, work, C, L)
lam = jnp.asarray(1e-4, dtype)
_IJ3 = schur_flat._IJ3
dll = [jnp.maximum(Hlf[k], 1e-12) for k, (i, j) in enumerate(_IJ3) if i == j]
Hll_d = [Hlf[k] + (lam * dll[{0: 0, 3: 1, 5: 2}[k]] if k in (0, 3, 5) else 0.0)
         for k in range(6)]
lc = schur_flat._chol3_flat(Hll_d)
lcn = [c[:, None] for c in lc]
m_t = work.table.mask
Kt = work.table.obs_idx.shape[1]


def sub_whiten(i):
    W_t = (Wf + 0.0 * i)[work.table.obs_idx] * m_t[..., None]
    l00, l10, l11, l20, l21, l22 = lcn
    i00 = 1.0 / l00
    i11 = 1.0 / l11
    i22 = 1.0 / l22
    w_of = lambda a, b: W_t[..., a * 3 + b]
    x0 = [w_of(j, 0) * i00 for j in range(6)]
    x1 = [(w_of(j, 1) - l10 * x0[j]) * i11 for j in range(6)]
    x2 = [(w_of(j, 2) - l20 * x0[j] - l21 * x1[j]) * i22 for j in range(6)]
    return sum(jnp.sum(x[0]) for x in (x0, x1, x2))


def make_Xt(i):
    W_t = (Wf + 0.0 * i)[work.table.obs_idx] * m_t[..., None]
    l00, l10, l11, l20, l21, l22 = lcn
    i00 = 1.0 / l00
    i11 = 1.0 / l11
    i22 = 1.0 / l22
    w_of = lambda a, b: W_t[..., a * 3 + b]
    x0 = [w_of(j, 0) * i00 for j in range(6)]
    x1 = [(w_of(j, 1) - l10 * x0[j]) * i11 for j in range(6)]
    x2 = [(w_of(j, 2) - l20 * x0[j] - l21 * x1[j]) * i22 for j in range(6)]
    return jnp.stack([jnp.stack(x0, -1), jnp.stack(x1, -1),
                      jnp.stack(x2, -1)], axis=2)   # (L,K,3,6)


X_t0 = jax.jit(make_Xt)(jnp.zeros((), dtype))
oh_ct = (jax.nn.one_hot(work.cam_of_track, C, dtype=dtype) * m_t[..., None])


def sub_bbuild(i):
    B = jax.lax.dot_general(oh_ct, (X_t0 + 0.0 * i).reshape(L, Kt, 18),
                            (((1,), (1,)), ((0,), (0,))),
                            precision=jax.lax.Precision.HIGHEST)
    B = B.reshape(L, C, 3, 6).transpose(0, 2, 1, 3).reshape(L * 3, C * 6)
    return B[0, 0]


B0 = jax.jit(lambda: jax.lax.dot_general(
    oh_ct, X_t0.reshape(L, Kt, 18), (((1,), (1,)), ((0,), (0,))),
    precision=jax.lax.Precision.HIGHEST).reshape(L, C, 3, 6)
    .transpose(0, 2, 1, 3).reshape(L * 3, C * 6))()


def sub_smm(i):
    S = -jax.lax.dot_general(B0 + 0.0 * i, B0, (((0,), (0,)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST)
    return S[0, 0]


S0 = jnp.eye(C * 6, dtype=dtype) * 100.0


def sub_chol(i):
    cf = jax.scipy.linalg.cho_factor(S0 + 0.0 * i, lower=True)
    return cf[0][0, 0]


def sub_chosolve(i):
    cf = jax.scipy.linalg.cho_factor(S0 + 0.0 * i, lower=True)
    dp = jax.scipy.linalg.cho_solve(cf, jnp.ones((C * 6,), dtype))
    return dp[0]


for name, fn in (("whiten", sub_whiten), ("bbuild", sub_bbuild),
                 ("smm", sub_smm), ("chol", sub_chol),
                 ("chol+solve", sub_chosolve)):
    dt, _ = timeit(loop_jit(fn), jnp.zeros((), dtype))
    print(f"sub {name:10s}: {dt*1e3/K:7.3f} ms", flush=True)

print("DONE", flush=True)
