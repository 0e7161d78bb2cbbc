"""Round-5 experiment batch: layout + precision variants for each hot
component of the headline iteration (VERDICT r5 item 1).

Hypotheses from profile_r5_headline:
  H1 the (N,k)-stacked intermediates (k=9,18,28) pad their last dim to 128
     lanes -> up to 7x real HBM traffic; transposed (k,N) or slot-major
     (k,K,L) layouts remove the padding.
  H2 the (N,C) f32 one-hot reads 59 MB padded; bf16 halves it and is exact.
  H3 the camera-row gathers (R_flat[cam_idx] etc., 115k rows) pay the
     ~10-20 ns/row gather latency -> 1-2+ ms; a one-hot matmul fetch is
     bandwidth-bound instead.
  H4 the B build (batched per-landmark one-hot dot) and S=-B^T B run far
     below peak; measure layout variants.
Each variant is validated numerically against the reference formulation.
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

# host-side index structures for variants
cam_np = np.asarray(obs_h.cam_idx)                     # (N,) l-major grid
oh_np = (cam_np[:, None] == np.arange(C)[None, :])
oh_f32 = jax.device_put(jnp.asarray(oh_np.astype(np.float32)), dev)
oh_bf16 = jax.device_put(jnp.asarray(oh_np.astype(jnp.bfloat16)), dev)
ohT_bf16 = jax.device_put(jnp.asarray(oh_np.T.astype(jnp.bfloat16)), dev)
# slot-major permutation: row k*L+l <- l-major row l*K+k
perm_sm = (np.arange(N).reshape(L, K).T).reshape(-1)
cam_sm = cam_np[perm_sm]
oh_sm_bf16 = jax.device_put(
    jnp.asarray((cam_sm[:, None] == np.arange(C)[None, :])
                .astype(jnp.bfloat16)), dev)
mask_sm = jax.device_put(jnp.asarray(
    np.asarray(work_h.mask_lk).T.copy()), dev)          # (K, L)
cam_idx_sm = jax.device_put(jnp.asarray(cam_sm.astype(np.int32)), dev)
lm_idx_sm = jax.device_put(
    jnp.asarray(np.tile(np.arange(L, dtype=np.int32), K)), dev)

R_flat0 = poses0.R.reshape(C, 9)
camcols = jnp.concatenate([R_flat0, poses0.t], axis=1)  # (C, 12)


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


AMORT = 32


def bench_fn(name, make_out, ref=None, rtol=2e-5):
    """make_out(i) -> array. Times amortized; validates one output vs ref."""
    try:
        f1 = jax.jit(lambda: make_out(jnp.zeros((), dtype)))
        out0 = np.asarray(f1())
        if ref is not None:
            err = np.max(np.abs(out0 - ref)) / max(np.max(np.abs(ref)), 1e-30)
            okmark = "OK " if err < rtol else f"ERR({err:.2e})"
        else:
            okmark = "   "

        def run(x):
            def body(i, acc):
                return acc + jnp.sum(make_out(x + i)[:1].astype(jnp.float32))
            return jax.lax.fori_loop(0, AMORT, body, jnp.asarray(0.0, jnp.float32))
        dt, _ = timeit(jax.jit(run), jnp.zeros((), dtype))
        print(f"{name:44s}: {dt*1e3/AMORT:7.3f} ms {okmark}", flush=True)
        return out0
    except Exception:
        with open(f"/tmp/err_{name.strip().replace(' ', '_').replace('/','_')}.txt",
                  "w") as fh:
            fh.write(traceback.format_exc())
        print(f"{name:44s}: FAILED -> /tmp/err", flush=True)
        return None


# ---------------------------------------------------------------------------
# H3: camera-data fetch
# ---------------------------------------------------------------------------
print("\n--- camera-value fetch (N rows of (C,12)) ---", flush=True)
ref_fetch = bench_fn("gather R/t rows (l-major)",
                     lambda i: (camcols + i)[obs.cam_idx].T)   # (12, N)
bench_fn("one-hot matmul fetch f32oh HIGHEST",
         lambda i: jax.lax.dot_general(
             (camcols + i).T, oh_f32, (((1,), (1,)), ((), ())),
             precision=HIGHEST),
         ref=ref_fetch)
bench_fn("one-hot matmul fetch bf16oh (lhs HIGHEST)",
         lambda i: jax.lax.dot_general(
             (camcols + i).T, ohT_bf16, (((1,), (0,)), ((), ())),
             precision=(jax.lax.Precision.HIGHEST,
                        jax.lax.Precision.DEFAULT),
             preferred_element_type=jnp.float32),
         ref=ref_fetch)

# ---------------------------------------------------------------------------
# H1/H2: camera-side reduction of a 28-column stack
# ---------------------------------------------------------------------------
print("\n--- camera reduction (N,28)->(C,28) ---", flush=True)
cols28 = jnp.asarray(np.random.default_rng(0).normal(
    size=(28, N)).astype(np.float32))
cols28 = jax.device_put(cols28, dev)
ref_red = bench_fn("current: stack(N,28); (C,N)oh f32 dot",
                   lambda i: jax.lax.dot_general(
                       oh_f32, (cols28 + i).T, (((0,), (0,)), ((), ())),
                       precision=HIGHEST).T)              # (28, C)
bench_fn("transposed: (28,N) x (N,C)bf16oh",
         lambda i: jax.lax.dot_general(
             cols28 + i, oh_bf16, (((1,), (0,)), ((), ())),
             precision=(jax.lax.Precision.HIGHEST,
                        jax.lax.Precision.DEFAULT),
             preferred_element_type=jnp.float32),
         ref=ref_red)
bench_fn("transposed: (28,N) x (N,C)oh f32 HIGHEST",
         lambda i: jax.lax.dot_general(
             cols28 + i, oh_f32, (((1,), (0,)), ((), ())),
             precision=HIGHEST),
         ref=ref_red)

# ---------------------------------------------------------------------------
# H1: landmark-side reduction
# ---------------------------------------------------------------------------
print("\n--- landmark reduction (9 cols over K slots) ---", flush=True)
mask_lk = work.mask_lk
cols9 = jax.device_put(jnp.asarray(np.random.default_rng(1).normal(
    size=(9, N)).astype(np.float32)), dev)        # l-major flat
cols9_sm = cols9[:, perm_sm]                       # slot-major flat
cols9_sm = jax.device_put(jax.block_until_ready(cols9_sm), dev)
ref_lred = bench_fn("current: (N,9)->(L,K,9) masked sum",
                    lambda i: jnp.sum(
                        (cols9 + i).T.reshape(L, K, 9)
                        * mask_lk[..., None], axis=1).T)   # (9, L)
bench_fn("slot-major: (9,K,L) masked sum over K",
         lambda i: jnp.sum((cols9_sm + i).reshape(9, K, L)
                           * mask_sm[None], axis=1),
         ref=ref_lred)

# ---------------------------------------------------------------------------
# H4: B build + S
# ---------------------------------------------------------------------------
print("\n--- B build (L,3,C,6) + S=-B^T B ---", flush=True)
X18 = jax.device_put(jnp.asarray(np.random.default_rng(2).normal(
    size=(L, K, 18)).astype(np.float32) *
    np.asarray(work_h.mask_lk)[..., None]), dev)
X18_sm = jax.device_put(
    jax.block_until_ready(jnp.transpose(X18, (2, 1, 0))), dev)  # (18, K, L)
oh_ct = jax.device_put(jax.block_until_ready(
    (jax.nn.one_hot(work.cam_of_track, C, dtype=dtype)
     * mask_lk[..., None])), dev)               # (L, K, C) f32
oh_ct_bf16 = jax.device_put(
    jax.block_until_ready(oh_ct.astype(jnp.bfloat16)), dev)


def B_current(i):
    B = jax.lax.dot_general(oh_ct, X18 + i, (((1,), (1,)), ((0,), (0,))),
                            precision=HIGHEST)             # (L, C, 18)
    return B.reshape(L, C, 3, 6).transpose(0, 2, 1, 3).reshape(L * 3, C * 6)


ref_B = bench_fn("B current: f32 batched dot + transpose", B_current)


def B_bf16(i):
    B = jax.lax.dot_general(
        oh_ct_bf16, X18 + i, (((1,), (1,)), ((0,), (0,))),
        precision=(jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST),
        preferred_element_type=jnp.float32)
    return B.reshape(L, C, 3, 6).transpose(0, 2, 1, 3).reshape(L * 3, C * 6)


bench_fn("B bf16oh batched dot + transpose", B_bf16, ref=ref_B)


def B_slotmajor_ew(i):
    # sum over k of oh_sm (K,L,C) * X_sm (18,K,L): fused elementwise reduce
    # output written (3, 6, C, L) -> resh/transpose to (3L, 6C)
    Xp = (X18_sm + i).reshape(3, 6, K, L)
    ohp = oh_sm_bf16.reshape(K, L, C).astype(jnp.float32)
    out = jnp.einsum("rjkl,klc->rjcl", Xp, ohp)
    return out.transpose(3, 0, 2, 1).reshape(L * 3, C * 6)


bench_fn("B slot-major einsum (k contraction)", B_slotmajor_ew, ref=ref_B)

if ref_B is not None:
    B_fixed = jax.device_put(jnp.asarray(ref_B), dev)
    print("\n--- S = -B^T B (7200,576) ---", flush=True)
    ref_S = bench_fn("S HIGHEST", lambda i: -jax.lax.dot_general(
        B_fixed + i, B_fixed + i, (((0,), (0,)), ((), ())),
        precision=HIGHEST))
    bench_fn("S HIGH (bf16_3x)", lambda i: -jax.lax.dot_general(
        B_fixed + i, B_fixed + i, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGH), ref=ref_S, rtol=1e-3)

# ---------------------------------------------------------------------------
# pallas fused Cholesky, amortized
# ---------------------------------------------------------------------------
print("\n--- 576 SPD solve ---", flush=True)
rng = np.random.default_rng(0)
A0 = rng.normal(size=(576, 576)).astype(np.float32)
S0 = jax.device_put(jnp.asarray(A0 @ A0.T + 576 * np.eye(576, dtype=np.float32)), dev)
b0 = jax.device_put(jnp.asarray(rng.normal(size=(576,)).astype(np.float32)), dev)
ref_x = bench_fn("xla cho_factor+cho_solve",
                 lambda i: jax.scipy.linalg.cho_solve(
                     jax.scipy.linalg.cho_factor(S0 + i * jnp.eye(576, dtype=dtype), lower=True), b0))
try:
    from slam_tricks_tpu.ops.pallas_chol import chol_solve
    bench_fn("pallas fused chol_solve",
             lambda i: chol_solve(S0 + i * jnp.eye(576, dtype=dtype), b0),
             ref=ref_x, rtol=1e-3)
except Exception:
    traceback.print_exc()

print("DONE", flush=True)
