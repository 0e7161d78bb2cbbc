"""TPU batch 4: transposed-W pallas kernel (stage + full solve), pallas
fused Cholesky timing vs XLA, and the best-combination solve."""
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
from slam_tricks_tpu.ops.pallas_chol import chol_solve

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


def try_stage(name, fn):
    try:
        dt, _ = timeit(loop_jit(fn), jnp.zeros((), dtype))
        print(f"{name}: {dt*1e3/K:7.3f} ms", flush=True)
        return True
    except Exception:
        with open(f"/tmp/err_{name.strip().replace(' ', '_')}.txt", "w") as fh:
            fh.write(traceback.format_exc())
        print(f"{name}: FAILED -> /tmp/err_*.txt", flush=True)
        return False


def stage_lin_pal(i):
    out = pallas_ba.linearize_assemble(
        poses0.R.reshape(C, 9), poses0.t, points0 + 0.0 * i, obs_s,
        meta["bases"], n_cams=C, n_points=L, tile=meta["tile"],
        w_win=meta["w_win"], L_pad=meta["L_pad"])
    return out[1][0, 0] + jnp.sum(out[5][0])


pal_ok = try_stage("lin+asm pallas(T) ", stage_lin_pal)

S0 = None
rng = np.random.default_rng(0)
A0 = rng.normal(size=(576, 576)).astype(np.float32)
S0 = jnp.asarray(A0 @ A0.T + 576 * np.eye(576, dtype=np.float32))
b0 = jnp.asarray(rng.normal(size=576).astype(np.float32))


def stage_pallas_chol(i):
    x = chol_solve(S0 + 0.0 * i, b0)
    return x[0]


try_stage("chol+solve pallas ", stage_pallas_chol)


def stage_xla_chol(i):
    cf = jax.scipy.linalg.cho_factor(S0 + 0.0 * i, lower=True)
    return jax.scipy.linalg.cho_solve(cf, b0)[0]


try_stage("chol+solve xla    ", stage_xla_chol)

# full solves
variants = [("xla/xla   ", dict())]
variants.append(("xla/pchol ", dict(chol_backend="pallas")))
if pal_ok:
    variants.append(("pallas/xla", dict(pallas_meta=meta)))
    variants.append(("pallas/pch", dict(pallas_meta=meta,
                                        chol_backend="pallas")))
for name, kw in variants:
    try:
        solve = jax.jit(lambda p, x, o, w, f, kw=kw: schur_flat.solve_ba_flat(
            p, x, o, w, fixed_mask=f, max_iters=20, **kw))
        dt, out = timeit(lambda: solve(poses0, points0, obs_s, work, fixed))
        print(f"solve {name}: {dt*1e3:8.2f} ms ({dt*1e3/20:6.2f} ms/iter) "
              f"cost={float(out.cost):.3e}", flush=True)
    except Exception:
        with open(f"/tmp/err_solve_{name.strip().replace('/', '_')}.txt",
                  "w") as fh:
            fh.write(traceback.format_exc())
        print(f"solve {name}: FAILED", flush=True)
print("DONE", flush=True)
