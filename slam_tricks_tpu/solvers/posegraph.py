"""SE(3) pose-graph optimization: LM over relative-pose factors.

The BASELINE "pose-graph optimization" config (no reference implementation
exists — st20's g2o usage is BA-only; this is the standard g2o/Ceres pose-graph
problem built on this framework's primitives, at the g2o-benchmark scale of
st20-g2o/src/include/test_g2o.h:94-135's role).

Two solvers:

- solve_pose_graph: dense (N,N,6,6) normal equations + Cholesky — exact and
  MXU-friendly for graphs up to a few hundred poses (the reference-grade
  comparison path).
- solve_pose_graph_chain: the 10k-100k-pose path. An odometry+loop-closure
  graph's Hessian is EXACTLY block-tridiagonal (chain edges couple i, i+1)
  plus one rank-6 PSD term per loop-closure edge: the edge Hessian
  [Ji Jj]^T[Ji Jj] restricted to rows/cols (i, j) is U_e U_e^T with
  U_e = P_i Ji^T + P_j Jj^T. So

      H + lam D  =  T  +  U U^T,     T block-tridiagonal SPD,
                                     U width 6 x (#loop edges)

  solved exactly by ONE multi-RHS substitution through the STORED
  block-Cholesky tridiagonal factor plus a (q,q) SPD Gram capacitance
  (Woodbury with a PLUS sign — loop edges ADD information, so
  I + Ut^T Ut is unconditionally SPD).
  Same machinery as the loop-closure BA path (solvers/loop_flat.py), applied
  to the pose-graph normal equations.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from slam_tricks_tpu.manifolds import se3
from slam_tricks_tpu.residuals.posegraph import relative_se3_residual
from slam_tricks_tpu.solvers.common import HIGHEST


class PoseGraphState(NamedTuple):
    poses: se3.SE3
    cost: jnp.ndarray
    lam: jnp.ndarray
    nu: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray


def _edge_linearize(poses, i_idx, j_idx, Z, sqrt_info):
    """Per-edge residual + Jacobians wrt tangent perturbations of Ti, Tj.
    Returns (r (E,6), Ji (E,6,6), Jj (E,6,6))."""
    Ti = jax.tree_util.tree_map(lambda a: a[i_idx], poses)
    Tj = jax.tree_util.tree_map(lambda a: a[j_idx], poses)

    def one(Ti_, Tj_, Z_, L_):
        def r_of(di, dj):
            return L_ @ relative_se3_residual(
                se3.retract(Ti_, di), se3.retract(Tj_, dj), Z_)

        z6 = jnp.zeros(6, dtype=Ti_.t.dtype)
        r0 = r_of(z6, z6)
        Ji = jax.jacfwd(r_of, argnums=0)(z6, z6)
        Jj = jax.jacfwd(r_of, argnums=1)(z6, z6)
        return r0, Ji, Jj

    return jax.vmap(one)(Ti, Tj, Z, sqrt_info)


def _pg_cost(poses, i_idx, j_idx, Z, sqrt_info):
    Ti = jax.tree_util.tree_map(lambda a: a[i_idx], poses)
    Tj = jax.tree_util.tree_map(lambda a: a[j_idx], poses)
    r = jax.vmap(lambda a, b, z, L: L @ relative_se3_residual(a, b, z))(
        Ti, Tj, Z, sqrt_info)
    return 0.5 * jnp.sum(r * r)


def solve_pose_graph(poses0, i_idx, j_idx, Z, sqrt_info=None, *, fixed_mask=None,
                     max_iters=50, lambda_init=1e-6, xtol=1e-12):
    """LM pose-graph solve. poses0: stacked SE3 (N,); edges (E,) index arrays
    with measurements Z (stacked SE3 (E,)) and optional (E,6,6) sqrt-information.
    Returns PoseGraphState."""
    N = poses0.t.shape[0]
    E = i_idx.shape[0]
    dtype = poses0.t.dtype
    if sqrt_info is None:
        sqrt_info = jnp.broadcast_to(jnp.eye(6, dtype=dtype), (E, 6, 6))
    if fixed_mask is None:
        fixed_mask = jnp.zeros(N, bool).at[0].set(True)

    cost0 = _pg_cost(poses0, i_idx, j_idx, Z, sqrt_info)
    state = PoseGraphState(poses=poses0, cost=cost0,
                           lam=jnp.asarray(lambda_init, dtype),
                           nu=jnp.asarray(2.0, dtype),
                           it=jnp.zeros((), jnp.int32), done=jnp.zeros((), bool))

    def cond(s):
        return (~s.done) & (s.it < max_iters)

    def body(s):
        r, Ji, Jj = _edge_linearize(s.poses, i_idx, j_idx, Z, sqrt_info)
        ee = lambda a, b: jnp.einsum("eri,erj->eij", a, b, precision=HIGHEST)
        ev = lambda a: jnp.einsum("eri,er->ei", a, r, precision=HIGHEST)
        H = jnp.zeros((N, N, 6, 6), dtype=dtype)
        H = H.at[i_idx, i_idx].add(ee(Ji, Ji))
        H = H.at[j_idx, j_idx].add(ee(Jj, Jj))
        H = H.at[i_idx, j_idx].add(ee(Ji, Jj))
        H = H.at[j_idx, i_idx].add(ee(Jj, Ji))
        g = jnp.zeros((N, 6), dtype=dtype)
        g = g.at[i_idx].add(ev(Ji))
        g = g.at[j_idx].add(ev(Jj))

        # Marquardt damping on diagonal blocks
        diag = jnp.arange(N)
        Hd = H[diag, diag]
        d = jnp.maximum(jnp.diagonal(Hd, axis1=-2, axis2=-1), 1e-12)
        H = H.at[diag, diag].add(s.lam * jax.vmap(jnp.diag)(d))

        # gauge masking
        free = (~fixed_mask).astype(dtype)
        H = H * free[:, None, None, None] * free[None, :, None, None]
        H = H.at[diag, diag].add(
            jnp.eye(6, dtype=dtype)[None] * fixed_mask.astype(dtype)[:, None, None])
        g = g * free[:, None]

        A = H.transpose(0, 2, 1, 3).reshape(N * 6, N * 6)
        delta = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(A, lower=True), -g.reshape(N * 6))
        bad = jnp.any(~jnp.isfinite(delta))
        delta = jnp.where(bad, jnp.zeros_like(delta), delta).reshape(N, 6)

        poses_try = jax.vmap(se3.retract)(s.poses, delta)
        cost_try = _pg_cost(poses_try, i_idx, j_idx, Z, sqrt_info)
        dvec = delta.reshape(-1)
        # model decrease for (H + lam D) delta = -g: 0.5 * delta^T (lam D delta - g)
        pred = 0.5 * jnp.dot(
            dvec, s.lam * jnp.maximum(jnp.diagonal(A), 1e-12) * dvec - g.reshape(-1))
        rho = (s.cost - cost_try) / jnp.maximum(pred, 1e-30)

        accept = (cost_try < s.cost) & jnp.isfinite(cost_try) & (~bad)
        lam_new = jnp.where(
            accept, s.lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3),
            s.lam * s.nu)
        nu_new = jnp.where(accept, 2.0, s.nu * 2.0)
        sel = lambda a, b: jnp.where(accept, a, b)
        return PoseGraphState(
            poses=jax.tree_util.tree_map(sel, poses_try, s.poses),
            cost=sel(cost_try, s.cost),
            lam=jnp.clip(lam_new, 1e-14, 1e10), nu=nu_new, it=s.it + 1,
            done=(accept & (jnp.sum(dvec * dvec) < xtol * xtol)) | bad)

    return jax.lax.while_loop(cond, body, state)


class ChainGraphWork(NamedTuple):
    """Host-split edge structure for the large-scale chain+loop solver."""
    Z_chain: se3.SE3          # (N-1,) measurement i -> i+1 (identity if absent)
    info_chain: jnp.ndarray   # (N-1, 6, 6) sqrt-information (0 if absent)
    loop_i: jnp.ndarray       # (E,) int32
    loop_j: jnp.ndarray       # (E,) int32
    Z_loop: se3.SE3           # (E,)
    info_loop: jnp.ndarray    # (E, 6, 6) sqrt-information (0 for padding)


def build_chain_work(i_idx, j_idx, Z, sqrt_info, n_poses, dtype=np.float32):
    """Split general edges into the odometry chain (j == i+1, slotted by i)
    and loop-closure edges (everything else, padded to a multiple of 8).
    Host-side; index arrays must be concrete."""
    i_np = np.asarray(i_idx)
    j_np = np.asarray(j_idx)
    N = int(n_poses)
    is_chain = j_np == i_np + 1
    Rz = np.asarray(Z.R)
    tz = np.asarray(Z.t)
    info = np.asarray(sqrt_info)

    Rc = np.tile(np.eye(3, dtype=dtype), (N - 1, 1, 1))
    tc = np.zeros((N - 1, 3), dtype)
    Ic = np.zeros((N - 1, 6, 6), dtype)
    ci = i_np[is_chain]
    if np.unique(ci).size != ci.size:
        raise ValueError("duplicate chain edge")
    Rc[ci] = Rz[is_chain]
    tc[ci] = tz[is_chain]
    Ic[ci] = info[is_chain]

    li = i_np[~is_chain]
    lj = j_np[~is_chain]
    E = li.size
    Ep = max(E + (-E) % 8, 8)
    loop_i = np.zeros(Ep, np.int64)
    loop_j = np.zeros(Ep, np.int64)
    Rl = np.tile(np.eye(3, dtype=dtype), (Ep, 1, 1))
    tl = np.zeros((Ep, 3), dtype)
    Il = np.zeros((Ep, 6, 6), dtype)
    loop_i[:E] = li
    loop_j[:E] = lj
    Rl[:E] = Rz[~is_chain]
    tl[:E] = tz[~is_chain]
    Il[:E] = info[~is_chain]
    return ChainGraphWork(
        Z_chain=se3.SE3(jnp.asarray(Rc), jnp.asarray(tc)),
        info_chain=jnp.asarray(Ic),
        loop_i=jnp.asarray(loop_i.astype(np.int32)),
        loop_j=jnp.asarray(loop_j.astype(np.int32)),
        Z_loop=se3.SE3(jnp.asarray(Rl), jnp.asarray(tl)),
        info_loop=jnp.asarray(Il))


def _pg_cost_chain(poses, work: ChainGraphWork):
    N = poses.t.shape[0]
    ic = jnp.arange(N - 1)
    c1 = _pg_cost(poses, ic, ic + 1, work.Z_chain, work.info_chain)
    c2 = _pg_cost(poses, work.loop_i, work.loop_j, work.Z_loop,
                  work.info_loop)
    return c1 + c2


def solve_pose_graph_chain(poses0, work: ChainGraphWork, *, fixed_mask=None,
                           max_iters=50, lambda_init=1e-6, xtol=1e-12):
    """Exact LM pose-graph solve at chain+loop-closure scale (10k-100k
    poses): block-tridiagonal factor over the odometry chain + rank-6-per-
    loop-edge Woodbury. Identical damping/gauge/trust-region semantics to
    solve_pose_graph (parity-tested).

    Precision: an odometry chain's Hessian conditioning grows ~N^3, passing
    1/eps32 near N ~ 500-600 (measured: f32 makes no progress at N >= 600
    while f64 solves N = 10k to the noise floor). Long chains are therefore
    AUTO-UPCAST to f64 internally when x64 is enabled — pose-graph state is
    tiny (6N doubles), so the emulated-f64 cost on TPU is negligible next
    to a BA solve. Pass f64 inputs (or enable x64) for N > 384."""
    N_ = poses0.t.shape[0]
    if (poses0.t.dtype == jnp.float32 and N_ > 384
            and jax.config.jax_enable_x64):
        up = lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
        out = solve_pose_graph_chain(
            up(poses0), up(work), fixed_mask=fixed_mask,
            max_iters=max_iters, lambda_init=lambda_init, xtol=xtol)
        down = lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
        return down(out)
    from slam_tricks_tpu.solvers.banded_flat import (block_tridiag_factor,
                                                     tridiag_backward,
                                                     tridiag_forward)

    N = poses0.t.shape[0]
    E = work.loop_i.shape[0]
    q = 6 * E
    dtype = poses0.t.dtype
    if fixed_mask is None:
        fixed_mask = jnp.zeros(N, bool).at[0].set(True)
    free = (~fixed_mask).astype(dtype)
    eye6 = jnp.eye(6, dtype=dtype)
    ic = jnp.arange(N - 1)
    ee = lambda a, b: jnp.einsum("eri,erj->eij", a, b, precision=HIGHEST)
    ev = lambda a, r: jnp.einsum("eri,er->ei", a, r, precision=HIGHEST)

    cost0 = _pg_cost_chain(poses0, work)
    state = PoseGraphState(poses=poses0, cost=cost0,
                           lam=jnp.asarray(lambda_init, dtype),
                           nu=jnp.asarray(2.0, dtype),
                           it=jnp.zeros((), jnp.int32),
                           done=jnp.zeros((), bool))

    def cond(s):
        return (~s.done) & (s.it < max_iters)

    def body(s):
        # chain linearization: no scatters, shifted adds only
        rc, Jic, Jjc = _edge_linearize(s.poses, ic, ic + 1, work.Z_chain,
                                       work.info_chain)
        z1 = jnp.zeros((1, 6, 6), dtype)
        D = (jnp.concatenate([ee(Jic, Jic), z1], axis=0)
             + jnp.concatenate([z1, ee(Jjc, Jjc)], axis=0))     # (N,6,6)
        Esub = ee(Jjc, Jic)                                     # (N-1,6,6)
        zv = jnp.zeros((1, 6), dtype)
        g = (jnp.concatenate([ev(Jic, rc), zv], axis=0)
             + jnp.concatenate([zv, ev(Jjc, rc)], axis=0))      # (N,6)

        # loop-closure linearization: scatter only E rows
        rl, Jil, Jjl = _edge_linearize(s.poses, work.loop_i, work.loop_j,
                                       work.Z_loop, work.info_loop)
        g = g.at[work.loop_i].add(ev(Jil, rl))
        g = g.at[work.loop_j].add(ev(Jjl, rl))
        HiiL = ee(Jil, Jil)
        HjjL = ee(Jjl, Jjl)

        # Marquardt damping from the TOTAL diagonal (parity with the dense
        # solver); poses with zero information get identity
        diag = jnp.diagonal(D, axis1=-2, axis2=-1)
        diag = diag.at[work.loop_i].add(
            jnp.diagonal(HiiL, axis1=-2, axis2=-1))
        diag = diag.at[work.loop_j].add(
            jnp.diagonal(HjjL, axis1=-2, axis2=-1))
        dscale = jnp.maximum(diag, 1e-12)                       # (N,6)
        untouched = jnp.sum(diag, axis=1) <= 0.0
        T = D + s.lam * jax.vmap(jnp.diag)(dscale)
        T = jnp.where(untouched[:, None, None], eye6[None], T)

        # gauge: mask rows/cols of fixed poses, unit diagonal
        T = (T * (free * free)[:, None, None]
             + eye6[None] * (1.0 - free)[:, None, None])
        Esub_m = Esub * (free[1:] * free[:-1])[:, None, None]
        g = g * free[:, None]

        # loop-edge factor U (N, 6, q), rows gauge-masked
        er = jnp.arange(E)
        U = jnp.zeros((N, 6, E, 6), dtype)
        U = U.at[work.loop_i, :, er, :].add(
            jnp.swapaxes(Jil, -1, -2) * free[work.loop_i][:, None, None])
        U = U.at[work.loop_j, :, er, :].add(
            jnp.swapaxes(Jjl, -1, -2) * free[work.loop_j][:, None, None])
        U = U.reshape(N, 6, q)

        # ONE multi-RHS forward substitution through the stored factor
        # T = Lt Lt^T; with Ut = Lt^-1 U the capacitance is the GRAM matrix
        # I + Ut^T Ut — unconditionally SPD and free of the cancellation
        # that breaks the naive I + U^T T^-1 U form in f32 (a 10k-pose
        # chain's kappa(T) far exceeds 1/eps32):
        #   (T + U U^T)^-1 b = Lt^-T [c - Ut (I + Ut^T Ut)^-1 Ut^T c]
        R = jnp.concatenate([-g[..., None], U], axis=-1)
        fac = block_tridiag_factor(T, Esub_m)
        Y = tridiag_forward(fac, R)
        c, Ut = Y[..., 0], Y[..., 1:]
        cap = (jnp.eye(q, dtype=dtype)
               + jnp.einsum("giq,gir->qr", Ut, Ut, precision=HIGHEST))
        cf = jax.scipy.linalg.cho_factor(cap, lower=True)
        z = jax.scipy.linalg.cho_solve(
            cf, jnp.einsum("giq,gi->q", Ut, c, precision=HIGHEST))
        y = c - jnp.einsum("giq,q->gi", Ut, z, precision=HIGHEST)
        delta = tridiag_backward(fac, y)

        bad = jnp.any(~jnp.isfinite(delta))
        delta = jnp.where(bad, jnp.zeros_like(delta), delta)
        poses_try = jax.vmap(se3.retract)(s.poses, delta)
        cost_try = _pg_cost_chain(poses_try, work)
        pred = 0.5 * jnp.sum(delta * (s.lam * dscale * delta - g))
        rho = (s.cost - cost_try) / jnp.maximum(pred, 1e-30)
        accept = (cost_try < s.cost) & jnp.isfinite(cost_try) & (~bad)
        lam_new = jnp.where(
            accept,
            s.lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3),
            s.lam * s.nu)
        nu_new = jnp.where(accept, 2.0, s.nu * 2.0)
        sel = lambda a, b: jnp.where(accept, a, b)
        return PoseGraphState(
            poses=jax.tree_util.tree_map(sel, poses_try, s.poses),
            cost=sel(cost_try, s.cost),
            lam=jnp.clip(lam_new, 1e-14, 1e10), nu=nu_new, it=s.it + 1,
            done=(accept & (jnp.sum(delta * delta) < xtol * xtol)) | bad)

    return jax.lax.while_loop(cond, body, state)
